package graft

import graft.GraftStorage.Syntax
import graft.pipeline.{SimilarityHier, SimilarityIvf, SimilarityLsh}
import org.apache.spark.sql.functions._

/** Round-13 specs: the two-level hierarchical IVF (r12 verdict task 1 —
  * coarse sign-pattern cells ≈ cluster count, residual sub-split of
  * oversized cells instead of skew-guard drops).
  */
class HierSpec extends SparkTestBase {

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  /** The catalog's deterministic clustered corpus (Queries.clusteredVectors
    * twin): cluster c = vec_id % 16, centroid dim d = (c·37 + d·13) % 17 − 8,
    * vector = centroid + original embedding.
    */
  private def clustered = emb.select(col("vec_id"), array((0 until 64).map { d =>
    (pmod(pmod(col("vec_id"), lit(16)) * lit(37) + lit(d * 13), lit(17)) - lit(8))
      .cast("double") + col("embedding").getItem(d).cast("double")
  }: _*).as("embedding"))

  private def meanRecall(audit: org.apache.spark.sql.DataFrame): Double =
    audit.agg(sum("n_caught").cast("double") / sum("n_truth").cast("double"))
      .head().getDouble(0)

  test("hier graph: well-formed, deterministic, both legs exercised") {
    graft.functions.VectorFunctions.register(spark)
    // persistTracked, NOT bare persist: the shared test session's
    // cache must be empty after clear (GraftStorageSpec asserts it)
    val cl = clustered.persistTracked()
    // capMult=1 forces the sub-split leg at this SF (cap=23 < m≈31);
    // pattern cells ≤ 2^8 keep the exact leg alive for small cells
    val g = SimilarityHier.knnGraphHier(cl, k = 3, capMult = 1, nprobe = 2)
      .persistTracked()
    val rows = g.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("rank") >= 1 && r.getAs[Long]("rank") <= 3))
    assert(rows.forall(r => r.getAs[Long]("q_id") != r.getAs[Long]("n_id")))
    // per-query ranks are dense from 1
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.values.forall(rs =>
      rs.map(_.getAs[Long]("rank")).sorted.sameElements(1L to rs.size)))
    // deterministic under re-evaluation
    val g2 = SimilarityHier.knnGraphHier(cl, k = 3, capMult = 1, nprobe = 2)
    assert(g2.collect().map(_.toString).sorted.sameElements(
      rows.map(_.toString).sorted))
    graft.GraftStorage.clear(spark)
  }

  test("clustered regime: hier recall beats the flat cellsFor graph; pairing stays sub-quadratic") {
    graft.functions.VectorFunctions.register(spark)
    val cl = clustered.persistTracked()
    val n = cl.count()
    val flat = meanRecall(SimilarityIvf.knnGraphRecallAudit(cl, k = 3,
      nAnchors = 50, numCells = SimilarityLsh.cellsFor(n)))
    val hier = meanRecall(SimilarityHier.knnGraphHierRecallAudit(cl, k = 3,
      nAnchors = 50, capMult = 1, nprobe = 2))
    info(f"n=$n flat(cellsFor)=$flat%.4f hier(capMult=1,nprobe=2)=$hier%.4f")
    assert(hier > flat,
      f"hier $hier%.4f does not beat flat $flat%.4f on the clustered corpus")
    // pairing bound: candidates stay sub-quadratic (n²/2 distinct pairs
    // would be exhaustive; the hier legs are O(capMult·n^1.5))
    val pairs = SimilarityHier.hierPairs(cl, 8, 64, 42L, 1, 2, n).count()
    info(s"hier candidate pairs: $pairs (n²/2 = ${n * n / 2})")
    assert(pairs < n * n / 8, s"pairing not sub-quadratic: $pairs")
    graft.GraftStorage.clear(spark)
  }
}
