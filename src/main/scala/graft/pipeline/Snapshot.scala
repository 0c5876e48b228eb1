package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Type-2 slowly-changing dimension from a change log: per key, collapse
    * consecutive runs of the same `attr` value and emit one row per run
    * with `[valid_from, valid_to)` validity (`valid_to` null on the open
    * current run, flagged `is_current`). `version` numbers runs 1..n per
    * key in time order.
    *
    * Deterministic: rows are ordered by `(ts, tie)` — `tie` must make the
    * order total (an event id); the run boundary test is null-safe
    * (`IS DISTINCT FROM`), so a null attr value forms runs like any other.
    *
    * Scale shape: two window passes and one hash aggregate, ALL partitioned
    * on the high-cardinality entity key — no global sort, no skew beyond
    * the per-entity history length (an entity's whole history must sort in
    * one task, the same bound any per-user sessionization has).
    */
  def scd2(log: DataFrame, key: String, attr: String, ts: String,
           tie: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tie))
    val runs = log.select(col(key), col(attr), col(ts), col(tie))
      .withColumn("__chg",
        when(lag(col(attr), 1).over(w) <=> col(attr), 0L).otherwise(1L))
      .withColumn("__run", sum(col("__chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(key), col("__run").as("version"))
      .agg(min(col(attr)).as(attr), min(col(ts)).as("valid_from"))
    val wr = Window.partitionBy(col(key)).orderBy(col("version"))
    runs.withColumn("valid_to", lead(col("valid_from"), 1).over(wr))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incremental refresh of a count/sum aggregate materialized view: fold
    * a `delta` batch of RAW rows into the stored per-key `(n, total)`
    * state WITHOUT rescanning the base table — the maintenance shape that
    * keeps a 100 TB rollup fresh at per-batch cost. Works because count
    * and sum are commutative monoids: `agg(base ∪ delta) =
    * merge(agg(base), agg(delta))`, and the merge itself is one more
    * hash aggregate over `|keys| + |delta keys|` rows, never data.
    * (avg/stddev ride the same state as n/total/moment sums — see
    * [[Stats]]; MIN/MAX also merge; DISTINCT does not — that's what the
    * HLL register relation in [[Sketches]] is for.)
    *
    * `view` holds `(key, n, total)`; `delta` holds raw `(key, valueCol)`
    * rows. Output: the refreshed `(key, n, total)` — identical, row for
    * row, to recomputing the aggregate over the full input (spec + the
    * q_mv_refresh oracle assert exactly that equivalence).
    *
    * The `total` monoid must be EXACT for the equivalence to be an
    * identity rather than an approximation: sum longs or decimals, never
    * raw doubles (a double sum's value depends on fold order, so merged
    * vs. recomputed could differ in the last ulp). The catalog row sums
    * `decimal(18,6)`-cast values, the catalog-wide money rule.
    */
  def refreshAgg(view: DataFrame, delta: DataFrame, key: String,
                 valueCol: String): DataFrame = {
    val deltaAgg = delta.groupBy(col(key))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
    view.unionByName(deltaAgg)
      .groupBy(col(key))
      .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))
  }

  /** Incremental refresh of an aggregate-over-JOIN materialized view —
    * the two-table extension of [[refreshAgg]]. For V = γ(A ⨝ B) and
    * insert-only deltas on either side, the new joined rows decompose
    * disjointly as
    *
    *   Δ(A ⨝ B) = ΔA ⨝ (B ∪ ΔB)  ∪  A ⨝ ΔB
    *
    * (the ΔA⨝ΔB quadrant rides the first arm), so the refresh is
    * `merge(V, γ(Δ-arms))` and NEITHER base table is re-joined against
    * the other: per-batch cost is two delta-sided joins + a keys-sized
    * merge, the shape that keeps a 100 TB join rollup fresh. When the
    * deltas are batch-sized Spark broadcasts them into the base scans —
    * the base side never shuffles; with date/bucket layout the base
    * probes additionally partition-prune to the delta's key range.
    * Same monoid contract as [[refreshAgg]]: exact sums (longs/decimals)
    * or the identity with full recompute becomes fold-order-approximate.
    *
    * `aCols`/`bCols` name the join keys: `a(aCol) = b(bCol)`.
    */
  def refreshJoinAgg(view: DataFrame, aBase: DataFrame, aDelta: DataFrame,
                     bBase: DataFrame, bDelta: DataFrame,
                     aCol: String, bCol: String,
                     groupKey: String, valueCol: String): DataFrame = {
    val bFull = bBase.unionByName(bDelta)
    val deltaRows = aDelta.join(bFull, col(aCol) === col(bCol))
      .unionByName(aBase.join(bDelta, col(aCol) === col(bCol)))
    val deltaAgg = deltaRows.groupBy(col(groupKey))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
    view.unionByName(deltaAgg)
      .groupBy(col(groupKey))
      .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))
  }
}
