package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (HyperLogLog, via Spark's built-in
  * Apache DataSketches functions) — the INCREMENTAL analytics pattern at
  * 100 TB: sketch each partition/day/shard ONCE, store the few-KB binary
  * sketch column, and answer any later "distinct users over window X"
  * by unioning sketches — no rescan of raw data, ever.
  *
  * HLL register merge is max() — commutative, associative, idempotent —
  * so estimates are DETERMINISTIC under any partitioning, retry, or merge
  * order (asserted in `SketchesSpec`: merging per-shard sketches equals
  * sketching the union, bit-for-bit). Error is the standard HLL ~1-2% at
  * the default lgConfigK; exact distinct stays available via
  * `count(DISTINCT …)` (q_agg_distinct) when the answer must be exact.
  */
object Sketches {

  /** One HLL sketch per group over `valueCol` — the ingest-time step. */
  def distinctSketch(df: DataFrame, groupCols: Seq[String],
                     valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("sketch"))

  /** Merge stored sketches up to a coarser grouping and estimate. */
  def mergeEstimate(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"))

  /** Direct estimate without storing the sketch (one-shot form). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String],
                     valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_sketch_agg(col(valueCol))).as("approx_distinct"))
}
