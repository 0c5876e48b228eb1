package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot maintenance for a continuously-refreshed corpus: latest-wins
  * upsert (merge a crawl delta into the corpus table) and snapshot diff
  * (classify what changed between two corpus versions). Together with the
  * digest anti-join incremental dedup (`q_dedup_incremental`) these are
  * the ingest-side primitives a training-data pipeline runs daily.
  *
  * Both are single-shuffle equi-operations on the high-cardinality
  * document key:
  *  - [[upsert]] is one hash aggregate — `max_by` keeps the winning row
  *    per key, partial-aggregating map-side, so each key contributes ONE
  *    row to the exchange no matter how many updates it has;
  *  - [[diff]] is one full-outer hash join on the key, with the change
  *    classification computed per joined row.
  */
object Snapshot {

  /** Latest-wins merge of `updates` into `base`: one output row per key —
    * the row with the highest `version`; on version ties the UPDATES side
    * wins (a re-crawl at the same version supersedes the stored row).
    * Deterministic: (version, side) is a total order per key given unique
    * (key, version) per side. Column order and schema follow `base`.
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String,
             version: String): DataFrame = {
    val payload = base.columns.filterNot(_ == key)
    val tagged = base.withColumn("__pri", lit(0))
      .unionByName(updates.withColumn("__pri", lit(1)))
    tagged.groupBy(col(key))
      .agg(max_by(struct(payload.map(col): _*),
        struct(col(version), col("__pri"))).as("__w"))
      .select(col(key) +: payload.map(c => col(s"__w.$c").as(c)): _*)
  }

  /** [[upsert]] plus TOMBSTONES: after the latest-wins merge, keys listed
    * in `deletes` are dropped with ONE left-anti equi-join — the full
    * "apply a CDC batch" primitive (upserts + deletes in one pass).
    * Deletes win over same-batch upserts: a delete is the final word on
    * the key for this batch.
    */
  def applyChanges(base: DataFrame, updates: DataFrame, deletes: DataFrame,
                   key: String, version: String): DataFrame =
    upsert(base, updates, key, version)
      .join(deletes.select(col(key)), Seq(key), "left_anti")

  /** Classify each key across two snapshots: `added` (new only),
    * `removed` (old only), `changed` (both, any compared column differs),
    * `unchanged`. Comparison spans all non-key columns present in BOTH
    * snapshots (struct equality — null-safe the way training pipelines
    * want: null = null is unchanged).
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, key: String): DataFrame = {
    val compared = oldSnap.columns.filterNot(_ == key)
      .intersect(newSnap.columns.filterNot(_ == key))
    val o = oldSnap.select(col(key), struct(compared.map(col): _*).as("__o"))
    val n = newSnap.select(col(key), struct(compared.map(col): _*).as("__n"))
    o.join(n, Seq(key), "full_outer")
      .select(col(key),
        when(col("__o").isNull, "added")
          .when(col("__n").isNull, "removed")
          .when(col("__o") <=> col("__n"), "unchanged")
          .otherwise("changed").as("change"))
  }
}
