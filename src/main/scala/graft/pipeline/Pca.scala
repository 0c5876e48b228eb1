package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftStorage.Syntax

/** Embedding-space diagnostics: per-dimension moments and the top
  * principal direction by POWER ITERATION over the (scaled) covariance
  * of int8-quantized vectors — the health check a pipeline runs before
  * committing to an ANN index or a quantization codebook (dead
  * dimensions, anisotropy: one direction swallowing the variance ruins
  * both hyperplane LSH and PQ subspace splits).
  *
  * Determinism (driver hash-compares a DuckDB replay): everything is
  * integer arithmetic over the [[Embeddings.quantize]] contract —
  * n-scaled covariance `n·Σq_iq_j − S_iS_j` (exact longs, no mean
  * division), power steps `y = C·x` as integer sums, and max-abs
  * fixed-point rescales with `div` (truncation toward zero — DuckDB's
  * `//` matches Java/Spark `div` on negatives, unlike floor division).
  * Power iteration is normalization-invariant, so the integer rescale
  * converges to the same dominant direction the float L2 recipe would
  * (the [[graft.graph.Graph.hits]] precedent, with signed values).
  *
  * Scale shape: the gram products stream map-side out of a per-row
  * upper-triangle double unnest (n·d(d+1)/2 product terms — linear in
  * n) into one partial-aggregated shuffle bounded by d² rows; the
  * power iteration itself runs driver-side on the collected d×d matrix
  * (model-sized, see [[topComponent]]). Rescaling C to a fixed 10⁶
  * max before iterating makes the per-step bounds n-INDEPENDENT
  * (d·10⁶·127² < 2⁶³ at any corpus size); the covariance build itself
  * is exact while `n²·127² < 2⁶³`, i.e. n < ~7·10⁸ vectors — past
  * that, aggregate per-shard covariances with the same formula.
  */
object Pca {

  /** Quantized element relation `(vid, dim, v)` — dim 0-based, v ∈
    * [-127, 127] exact longs.
    *
    * Deliberately NOT [[Embeddings.quantize]] + explode: higher-order
    * `transform` lambdas are interpreted (outside whole-stage codegen),
    * and projection collapse inlines the scale expression into the
    * lambda body, making the quantize chain O(d²) interpreted work per
    * row when it feeds a generator (measured 1.8 s vs 0.11 s at sf0.1).
    * Here only `maxabs` is a (per-row, O(d)) lambda; the explode emits
    * raw doubles and the quantization itself is a scalar codegen'd
    * expression per exploded row — same float ops, identical values.
    */
  private[graft] def qRows(df: DataFrame, id: String, emb: String): DataFrame = {
    val e = col(emb).cast("array<double>")
    df.select(col(id).as("vid"),
        array_max(transform(e, x => abs(x))).as("maxabs"), posexplode(e))
      .select(col("vid"), col("pos").cast("long").as("dim"),
        when(col("maxabs") > 0d,
          floor(col("col") * (lit(127.0) / col("maxabs")) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)).as("v"))
  }

  /** Per-dimension integer moments: `(dim, n, s, ss, var_num)` with
    * `var_num = n·ss − s²` (= n² times the variance — exact; compare
    * dimensions directly, divide by n² only for display). Dead
    * dimensions show `var_num = 0`.
    */
  def dimStats(df: DataFrame, id: String = "vec_id",
               emb: String = "embedding"): DataFrame =
    qRows(df, id, emb)
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("ss"))
      .select(col("dim"), col("n"), col("s"), col("ss"),
        (col("n") * col("ss") - col("s") * col("s")).as("var_num"))

  /** The distributed halves of the covariance build — per-dim sums and
    * upper-triangle gram products, both d²-bounded aggregates.
    *
    * The gram products come from a per-row DOUBLE UNNEST over the upper
    * triangle (explode dim i, then the array's tail slice from i) — the
    * whole n·d(d+1)/2 product stream stays map-side until one partial-
    * aggregated d²-bounded shuffle. The element self-JOIN alternative
    * re-shuffles n·d rows twice and was measured ~2× slower at sf0.1;
    * at cluster scale it also hashes the full element relation where
    * this needs nothing but the scan. The quantized ARRAYS are
    * persisted: the (interpreted-lambda) quantize chain runs once at
    * materialization, and both passes explode a plain cached column —
    * without the persist, projection collapse inlines the quantize HOFs
    * into each generator input (the [[qRows]] scaladoc pathology).
    */
  private[graft] def covParts(df: DataFrame, id: String, emb: String): (DataFrame, DataFrame) = {
    val q = Embeddings.quantize(df, id, emb)
      .select(transform(col("q"), x => x.cast("long")).as("q"))
      .persistTracked()
    val sums = q.select(posexplode(col("q")))
      .groupBy(col("pos").cast("long").as("dim"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
    val upper = q
      .select(col("q"), posexplode(col("q")))
      .select(col("pos").cast("long").as("i"), col("col").as("vi"),
        posexplode(slice(col("q"), col("pos") + 1, size(col("q")) - col("pos"))))
      .select(col("i"), (col("i") + col("pos")).as("j"),
        (col("vi") * col("col")).as("vp"))
      .groupBy(col("i"), col("j")).agg(sum(col("vp")).as("p"))
    (sums, upper)
  }

  /** Top principal direction after `iters` fixed-point power steps:
    * `(dim, x)`, d rows, x ∈ [-127, 127] integers (the max-abs
    * component is ±127). Start vector is all-127 — deterministic and,
    * for a covariance (PSD), never orthogonal to the dominant
    * eigenvector in practice; each step rescales by its integer
    * max-abs with truncating division (Java `/` ≡ Spark `div` ≡
    * DuckDB `//` on negatives).
    *
    * The two d²-bounded aggregates ([[covParts]]) are COLLECTED and the
    * covariance assembled + iterated on the driver — the
    * [[Pq]]-codebook / [[KMeansCluster]]-centroid pattern: both
    * collects are bounded by dim² (kilobytes), never by the corpus, and
    * a d×d eigensolve is exactly the kind of model-sized math a real
    * pipeline runs driver-side after the distributed aggregation.
    * Assembly = `c = n·p − s_i·s_j`, then a max-abs rescale of C to 10⁶
    * (power-step bounds become n-independent; truncating division) —
    * the same pure integer arithmetic the oracle replays in SQL. A
    * cluster-side join loop for the assembly + iterations was measured
    * ~3× slower end-to-end at sf0.1 purely on the extra broadcast
    * exchanges' job-scheduling overhead.
    */
  def topComponent(df: DataFrame, id: String = "vec_id",
                   emb: String = "embedding", iters: Int = 3): DataFrame = {
    val spark = df.sparkSession
    val (sumsDf, upperDf) = covParts(df, id, emb)
    val sums = sumsDf.collect()
      .map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2))).toMap
    val d = sums.keysIterator.max + 1
    val m = Array.ofDim[Long](d, d)
    upperDf.collect().foreach { r =>
      val (i, j, p) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2))
      val c = sums(i)._2 * p - sums(i)._1 * sums(j)._1
      m(i)(j) = c
      m(j)(i) = c
    }
    val mc = m.iterator.flatten.map(math.abs).max
    for (i <- 0 until d; j <- 0 until d) m(i)(j) = m(i)(j) * 1000000L / mc
    var x = Array.fill(d)(127L)
    for (_ <- 1 to iters) {
      val y = Array.tabulate(d)(i => (0 until d).iterator.map(j => m(i)(j) * x(j)).sum)
      val mx = y.iterator.map(math.abs).max
      x = y.map(v => v * 127L / mx)
    }
    import spark.implicits._
    x.toSeq.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("dim", "x")
  }
}
