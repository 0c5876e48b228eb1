package graft

import graft.pipeline.{SimilarityIvf, SimilarityLsh}
import org.apache.spark.sql.functions._

/** Round-11 specs: the mechanical LSH recall-saturation escalation —
  * `recallAt` (the forward S-curve `tablesFor` inverts), `cellsFor`
  * (IVF sizing under the same occupancy target), and the three
  * `SaturationPolicy` behaviors of `topKAutoRecall` (r10 verdict
  * task 1: when the 64-table cap engages, nothing may under-deliver
  * the recall contract silently).
  */
class Features5Spec extends SparkTestBase {

  test("recallAt inverts tablesFor: unclamped sizings meet the target tightly; the 64 cap leaves a quantified gap") {
    for (planes <- Seq(4, 6, 8); r <- Seq(0.8, 0.9); c <- Seq(0.35, 0.5)) {
      val t = SimilarityLsh.tablesFor(planes, r, c)
      if (t < 64) {
        // ceil rounds UP: t tables meet the target...
        assert(SimilarityLsh.recallAt(planes, t, c) >= r,
          s"planes=$planes r=$r c=$c t=$t under-delivers")
        // ...and t is the SMALLEST such count (the inversion is tight)
        if (t > 1)
          assert(SimilarityLsh.recallAt(planes, t - 1, c) < r,
            s"planes=$planes r=$r c=$c: t-1=${t - 1} already suffices — inversion loose")
      }
    }
    // the saturating regime: 0.999-recall at cos 0.05 needs ~94 tables
    // of 4 planes — tablesFor clamps, and recallAt prices the shortfall
    assert(SimilarityLsh.tablesFor(4, 0.999, 0.05) === 64)
    val achievable = SimilarityLsh.recallAt(4, 64, 0.05)
    assert(achievable < 0.999 && achievable > 0.9,
      s"expected a real-but-insufficient capped recall, got $achievable")
    // more planes only saturate harder (per-band collision drops)
    assert(SimilarityLsh.recallAt(8, 64, 0.05) < achievable)
  }

  test("cellsFor holds the bounded-pairing occupancy target with a 16-cell floor") {
    assert(SimilarityLsh.cellsFor(500L) === 16)    // floor regime
    assert(SimilarityLsh.cellsFor(2000L) === 16)   // 2000/125 = 16, boundary
    assert(SimilarityLsh.cellsFor(1000000L) === 8000) // occupancy 125 held
  }

  test("topKAutoRecall saturation policies: EscalateIvf = the IVF graph, FailLoud names the achievable recall, ForceLsh = the capped 64-table LSH graph") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val planes = SimilarityLsh.planesFor(n, SimilarityLsh.PairingMaxBucket)
    assert(SimilarityLsh.tablesFor(planes, 0.999, 0.05) === 64,
      "test premise: these params must saturate the table cap")

    def same(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame): Boolean =
      a.except(b).isEmpty && b.except(a).isEmpty

    val esc = SimilarityLsh.topKAutoRecall(emb, k = 3,
      targetRecall = 0.999, minCosine = 0.05) // default EscalateIvf
    val ivf = SimilarityIvf.knnGraph(emb, 3, SimilarityLsh.cellsFor(n))
    assert(same(esc, ivf), "EscalateIvf result diverges from the IVF kNN graph")

    val ex = intercept[IllegalArgumentException] {
      SimilarityLsh.topKAutoRecall(emb, k = 3, targetRecall = 0.999,
        minCosine = 0.05, onSaturation = SimilarityLsh.FailLoud)
    }
    assert(ex.getMessage.contains("unreachable") &&
      ex.getMessage.contains("achievable"),
      s"FailLoud must name the shortfall, got: ${ex.getMessage}")

    val forced = SimilarityLsh.topKAutoRecall(emb, k = 3, targetRecall = 0.999,
      minCosine = 0.05, onSaturation = SimilarityLsh.ForceLsh)
    val capped = SimilarityLsh.topKAuto(emb, k = 3, numTables = 64)
    assert(same(forced, capped), "ForceLsh result diverges from the capped LSH graph")
    GraftStorage.clear(spark)
  }

  test("topKAutoRecall below the cap keeps the LSH plan (no spurious escalation)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val planes = SimilarityLsh.planesFor(n, SimilarityLsh.PairingMaxBucket)
    val tables = SimilarityLsh.tablesFor(planes, 0.9, 0.35)
    assert(tables < 64, "test premise: this sizing must NOT saturate")
    val auto = SimilarityLsh.topKAutoRecall(emb, k = 3,
      targetRecall = 0.9, minCosine = 0.35)
    val lsh = SimilarityLsh.topKAuto(emb, k = 3, numTables = tables)
    assert(auto.except(lsh).isEmpty && lsh.except(auto).isEmpty)
    GraftStorage.clear(spark)
  }
}
