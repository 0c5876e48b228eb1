package graft.pipeline

import graft.GraftStorage.Syntax
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's k-means over embedding vectors — the clustering step behind
  * semantic dedup (SemDeDup-style), corpus topic bucketing, and IVF
  * coarse-quantizer training. Runs on the INT8-QUANTIZED vectors
  * ([[Embeddings.quantize]]): with integer components every distance is
  * an exact long, every comparison is exact, and the centroid update
  * `floor(Σq_i / n)` is replayable bit-for-bit — so an inherently
  * iterative float algorithm becomes hash-comparable across engines
  * (the same trick that made the CMS and HLL sketches oracle-checkable).
  * Quantization costs ≤ 0.4% per-component error (0.5/127) — irrelevant
  * to cluster assignment quality, decisive for verifiability.
  *
  * Scale shape per iteration: assignment is a map-side argmin against a
  * BROADCAST k×d literal (no shuffle, no join — the centroids ride the
  * closure exactly like IVF's [[SimilarityIvf.assignTo]]); the update is
  * ONE hash aggregate emitting d per-dimension sums + a count per
  * cluster — k·(d+1) numbers on the shuffle regardless of corpus size.
  * The only driver traffic is the k×d centroid matrix between
  * iterations, which is what every distributed k-means (MLlib included)
  * collects. Ties (equidistant centroids) break to the lowest cluster
  * id — deterministic under any partitioning.
  */
object KMeansCluster {

  /** Int-quantized `(id, q: array<long>)` relation. */
  def quantized(df: DataFrame, id: String = "vec_id",
                emb: String = "embedding"): DataFrame =
    Embeddings.quantize(df, id, emb)
      .select(col(id), transform(col("q"), _.cast("long")).as("q"))

  /** Exact integer squared-L2 distance from `q` to a literal centroid —
    * the codegen'd [[graft.functions.IntSqDist]] (registry-free wrap), not
    * an interpreted `aggregate(zip_with(...))` HOF: the assignment argmin
    * evaluates this k times per vector, so it IS the Lloyd hot loop.
    */
  private def sqDist(q: Column, cent: Array[Long]): Column =
    graft.functions.VectorFunctions.sqDistLExpr(q, typedLit(cent))

  /** Nearest-centroid id (ties → lowest id): argmin via `array_min` over
    * `(dist, cluster)` structs — lexicographic struct order IS the
    * deterministic tie-break.
    */
  private def assignExpr(q: Column, cents: Seq[Array[Long]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(sqDist(q, c).as("d"), lit(i).as("cluster"))
    }: _*)).getField("cluster")

  /** `iters` Lloyd rounds from a deterministic seed (the quantized
    * vectors of the k smallest ids, in id order, as clusters 0..k−1).
    * Returns `(cluster, n_vectors, centroid)` — the centroid AFTER the
    * final update, `n_vectors` the assignment that produced it, the
    * centroid serialized positionally (comma-joined ints).
    */
  def kMeans(df: DataFrame, k: Int, iters: Int, dim: Int,
             id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    require(k >= 1 && iters >= 1, "k and iters must be >= 1")
    val q = quantized(df, id, emb).persist()
    try {
      val (cents, counts) = train(q, k, iters, dim, id)
      // k-row result assembled from the final aggregate (sketch-sized,
      // like the CMS/HLL outputs); empty clusters emit no row
      val out = cents.zipWithIndex.collect {
        case (c, i) if counts.contains(i) => (i, counts(i), c.mkString(","))
      }
      df.sparkSession.createDataFrame(out)
        .toDF("cluster", "n_vectors", "centroid")
    } finally q.unpersist()
  }

  /** The Lloyd loop shared by [[kMeans]] and [[assignCells]]: returns the
    * centroids AFTER the final update plus the final-round membership
    * counts. Driver traffic is k×(d+1) numbers per iteration — nothing
    * corpus-sized.
    */
  private def train(q: DataFrame, k: Int, iters: Int, dim: Int,
                    id: String): (Seq[Array[Long]], Map[Int, Long]) = {
    // seed centroids: k smallest ids, cluster = rank in id order.
    // k rows — a driver collect of the same order as MLlib's init.
    var cents: Seq[Array[Long]] = q.orderBy(col(id)).limit(k)
      .select(col("q")).collect()
      .map(_.getSeq[Long](0).toArray).toSeq

    // one job per iteration: the assignment is a map-side projection
    // folded INTO the update aggregate, and the aggregate's count IS the
    // membership audit — no separate counting pass at the end
    var counts: Map[Int, Long] = Map.empty
    for (_ <- 1 to iters) {
      val assigned = q.select(col("q"),
        assignExpr(col("q"), cents).as("cluster"))
      // d per-dim sums + count per cluster; floor(sum/n) via exact
      // double division (sums < 2^53) — the oracle replays it verbatim
      val sums = assigned.groupBy(col("cluster")).agg(
        count(lit(1)).as("n"),
        (0 until dim).map(i =>
          sum(element_at(col("q"), i + 1)).as(s"s$i")): _*)
      val rows = sums.collect()
      counts = rows.map(r =>
        r.getAs[Int]("cluster") -> r.getAs[Long]("n")).toMap
      val updated = rows.map { r =>
        val n = r.getAs[Long]("n").toDouble
        (r.getAs[Int]("cluster"),
          Array.tabulate(dim)(i =>
            math.floor(r.getAs[Long](s"s$i").toDouble / n).toLong))
      }.toMap
      // empty clusters keep their previous centroid
      cents = cents.indices.map(i => updated.getOrElse(i, cents(i)))
    }
    (cents, counts)
  }

  /** Per-vector cell assignment against the TRAINED centroids (one more
    * map-side broadcast argmin after the final Lloyd update) — the
    * coarse-partition step of SemDeDup-style semantic dedup and IVF
    * routing. Returns `(id, q, cell)`; the quantized relation stays
    * persisted because the lazily-returned result reads it (the caller /
    * harness drops leftover blocks, the library cannot unpersist first).
    */
  def assignCells(df: DataFrame, k: Int, iters: Int, dim: Int,
                  id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    require(k >= 1 && iters >= 1, "k and iters must be >= 1")
    val q = quantized(df, id, emb)
      .persistTracked()
    val (cents, _) = train(q, k, iters, dim, id)
    q.select(col(id), col("q"), assignExpr(col("q"), cents).as("cell"))
  }

  /** Clustering-quality audit: per-cell size + EXACT-integer inertia
    * (Σ squared distance of each member to its assigned final centroid)
    * — the elbow/drift diagnostic a pipeline owner reads before trusting
    * k. Quantized coordinates are ≤127 in magnitude, so a dim-64 squared
    * distance is ≤ 64·254² ≈ 4.1M and the per-cell long sum is exact —
    * bit-identical in any engine, unlike float inertia. One argmin
    * projection (centroids are plan literals) + one hash aggregate.
    */
  def cellInertia(df: DataFrame, k: Int, iters: Int, dim: Int,
                  id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    require(k >= 1 && iters >= 1, "k and iters must be >= 1")
    val q = quantized(df, id, emb).persistTracked()
    val (cents, _) = train(q, k, iters, dim, id)
    // one evaluation of the argmin struct yields BOTH the cell and its
    // distance — no second distance pass against the assigned centroid
    val m = array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(sqDist(col("q"), c).as("d"), lit(i).as("cluster"))
    }: _*))
    q.select(m.as("m"))
      .select(col("m").getField("cluster").as("cell"),
        col("m").getField("d").as("d"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("d")).as("inertia"))
  }
}
