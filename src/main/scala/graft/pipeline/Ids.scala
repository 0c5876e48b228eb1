package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stable contiguous id assignment — the declarative, scale-safe answer to
  * "zipWithIndex": every row gets a 0-based id, ids are dense, and the
  * assignment is a pure function of the data (stable across retries,
  * repartitioning, and cluster size — unlike `monotonically_increasing_id`,
  * which bakes in partition layout).
  *
  * The naive `row_number() OVER (ORDER BY …)` is a single-task global sort.
  * This is the classic two-phase replacement:
  *
  *  1. hash every row's tie-break key with md5 and take the first byte as
  *     one of 256 range buckets (md5 is uniform, so buckets are balanced
  *     BY CONSTRUCTION — no sampling pass, no skew);
  *  2. count rows per bucket (one tiny aggregate), prefix-sum the 256
  *     counts into bucket offsets (a window over a 256-row relation —
  *     sketch-sized, never data-sized);
  *  3. broadcast-join the offsets back and add a per-bucket `row_number`
  *     (256-way parallel windows, each sorting 1/256 of the data).
  *
  * Because the bucket is the md5 prefix, ordering by (bucket, md5, tie)
  * IS ordering by (md5, tie) — so the ids equal the global-sort answer
  * bit for bit, and a one-line SQL window replays them.
  */
object Ids {

  /** 0-based dense ids ordered by (md5(tie), tie). `tieCol` must be
    * row-unique (a primary key) — it makes the order total and the ids
    * deterministic. Output: the input columns plus `gid`.
    */
  def contiguous(df: DataFrame, tieCol: String): DataFrame = {
    val keyed = df
      .withColumn("__k", md5(col(tieCol).cast("string")))
      .withColumn("__b", conv(substring(col("__k"), 1, 2), 16, 10).cast("int"))
    val offsets = keyed.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum(col("__c")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("__c")
    keyed.join(broadcast(offsets), Seq("__b"))
      .withColumn("gid", col("__off") - 1L +
        row_number().over(Window.partitionBy(col("__b")).orderBy(col("__k"), col(tieCol))))
      .drop("__k", "__b", "__off")
  }
}
