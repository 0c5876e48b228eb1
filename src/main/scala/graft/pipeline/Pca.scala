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
    */
  private[graft] def qRows(df: DataFrame, id: String, emb: String): DataFrame =
    Embeddings.quantize(df, id, emb)
      .select(col(id).as("vid"), posexplode(col("q")))
      .select(col("vid"), col("pos").cast("long").as("dim"),
        col("col").cast("long").as("v"))

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

  /** The n-scaled covariance as a `(i, j, c)` relation (d² rows),
    * `c = n·Σ_v q_i q_j − S_i S_j`, rescaled to max|c| = 10⁶ so the
    * power-step bounds don't grow with n.
    *
    * The gram products come from a per-row DOUBLE UNNEST over the upper
    * triangle (explode dim i, then the array's tail slice from i) — the
    * whole n·d(d+1)/2 product stream stays map-side until one partial-
    * aggregated d²-bounded shuffle. The element self-JOIN alternative
    * re-shuffles n·d rows twice and was measured ~2× slower at sf0.1;
    * at cluster scale it also hashes the full element relation where
    * this needs nothing but the scan.
    */
  private[graft] def scaledCovariance(df: DataFrame, id: String, emb: String): DataFrame = {
    val q = Embeddings.quantize(df, id, emb)
      .select(transform(col("q"), x => x.cast("long")).as("q"))
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
    val prods = upper.unionByName(
      upper.filter(col("i") =!= col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("p")))
    val raw = prods
      .join(sums.select(col("dim").as("i"), col("s").as("si"), col("n")), Seq("i"))
      .join(sums.select(col("dim").as("j"), col("s").as("sj")), Seq("j"))
      .select(col("i"), col("j"),
        (col("n") * col("p") - col("si") * col("sj")).as("c"))
    val cmax = raw.agg(max(abs(col("c"))).as("mc"))
    raw.crossJoin(broadcast(cmax))
      .select(col("i"), col("j"), expr("(c * 1000000L) div mc").as("c"))
  }

  /** Top principal direction after `iters` fixed-point power steps:
    * `(dim, x)`, d rows, x ∈ [-127, 127] integers (the max-abs
    * component is ±127). Start vector is all-127 — deterministic and,
    * for a covariance (PSD), never orthogonal to the dominant
    * eigenvector in practice; each step rescales by its integer
    * max-abs with truncating division (Java `/` ≡ Spark `div` ≡
    * DuckDB `//` on negatives).
    *
    * The d²-row covariance is COLLECTED and iterated on the driver —
    * the [[Pq]]-codebook / [[KMeansCluster]]-centroid pattern: the
    * collect is bounded by dim² (kilobytes), never by the corpus, and
    * a d×d eigensolve is exactly the kind of model-sized math a real
    * pipeline runs driver-side after the distributed aggregation. A
    * cluster-side join loop was measured 2.5× slower end-to-end at
    * sf0.1 purely on per-iteration job-scheduling overhead.
    */
  def topComponent(df: DataFrame, id: String = "vec_id",
                   emb: String = "embedding", iters: Int = 3): DataFrame = {
    val spark = df.sparkSession
    val cov = scaledCovariance(df, id, emb).collect()
    val d = cov.iterator.map(_.getLong(0)).max.toInt + 1
    val m = Array.ofDim[Long](d, d)
    cov.foreach(r => m(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getLong(2))
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
