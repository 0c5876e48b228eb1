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

  // ------------------------------------------------------- Count-Min Sketch

  /** Count-Min Sketch (Cormode & Muthukrishnan 2005) as a RELATION:
    * `(row, bucket, cnt)` with `depth` rows × `width` buckets — the
    * mergeable frequency twin of the HLL distinct sketch. Hashing is
    * md5-derived (`bucket_i(x) = int(md5("i:x")[0,6)) mod width`), so the
    * sketch is deterministic in every engine and the DuckDB oracle
    * replays it exactly.
    *
    * Scale shape: `posexplode` of the depth bucket keys (computed per row,
    * shuffle-free) then ONE hash aggregate onto at most depth×width
    * cells — the sketch is a few KB regardless of input size. Merging
    * shards is `union → groupBy(row, bucket) → sum` ([[cmsMerge]]):
    * addition is commutative/associative, so partial sketches from any
    * partitioning/retry merge to the identical sketch.
    */
  def cmsBucket(value: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$row:"), value.cast("string"))), 1, 6), 16, 10)
      .cast("long") % width

  def cmsSketch(df: DataFrame, valueCol: String, depth: Int, width: Int): DataFrame =
    df.select(posexplode(array((0 until depth).map(i =>
        cmsBucket(col(valueCol), i, width)): _*)).as(Seq("r", "bucket")))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
      .select(col("r").cast("long").as("r"), col("bucket"), col("cnt"))

  /** Union partial sketches built with the same (depth, width). */
  def cmsMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))

  /** Fixed-bin histogram sketch over a KNOWN value range — the mergeable
    * QUANTILE member of the sketch family (HLL = distinct, CMS =
    * frequency). `bins` equal-width buckets over `[lo, hi)`, out-of-range
    * values clamped to the edge bins. Mergeable like CMS: union + sum.
    * Honest trade-off vs t-digest/KLL: needs the range up front and has
    * fixed resolution `(hi-lo)/bins` — in exchange it is DETERMINISTIC
    * (t-digest centroids depend on merge order) and replayable in any
    * engine.
    */
  def histSketch(df: DataFrame, valueCol: String,
                 lo: Double, hi: Double, bins: Int): DataFrame =
    df.select(least(lit(bins - 1), greatest(lit(0),
        floor((col(valueCol) - lo) / (hi - lo) * bins).cast("int"))).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))

  /** Interpolated quantile estimates from a [[histSketch]]: for each q,
    * find the bin where the cumulative count crosses `q·n` and
    * interpolate linearly inside it. The window runs over the BIN-SIZED
    * sketch (not the data), so the single-partition sort is `bins` rows.
    */
  def histQuantile(sketch: DataFrame, qs: Seq[Double],
                   lo: Double, hi: Double, bins: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = sketch.withColumn("cum", sum("cnt").over(w))
      .withColumn("n", max("cum").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val qdf = sketch.sparkSession.createDataFrame(qs.map(Tuple1(_))).toDF("q")
    val width = (hi - lo) / bins
    qdf.crossJoin(cum)
      .filter(col("cum") >= col("q") * col("n") &&
        (col("cum") - col("cnt")) < col("q") * col("n"))
      .select(col("q"),
        (lit(lo) + (col("bin").cast("double") +
          (col("q") * col("n") - (col("cum") - col("cnt")).cast("double")) /
            col("cnt").cast("double")) * lit(width)).as("est"))
  }

  /** Point-estimate the frequency of each item in `items`: `min` over the
    * depth rows of the addressed cell, an empty cell counting 0 (the
    * classic CMS upper-bound estimate — never under-counts, over-counts
    * only on collisions). `items` is expected to be small (heavy-hitter
    * candidates); it left-joins the KB-size sketch.
    */
  def cmsEstimate(sketch: DataFrame, items: DataFrame, itemCol: String,
                  depth: Int, width: Int): DataFrame =
    items.select(col(itemCol), posexplode(array((0 until depth).map(i =>
        cmsBucket(col(itemCol), i, width)): _*)).as(Seq("r", "bucket")))
      .withColumn("r", col("r").cast("long"))
      .join(sketch, Seq("r", "bucket"), "left")
      .groupBy(itemCol).agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
