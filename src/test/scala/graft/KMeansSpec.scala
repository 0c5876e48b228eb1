package graft

import graft.pipeline.KMeansCluster

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  // two tight groups on a 2-d line: ids 0,1 near (100,0); ids 2,3,4 near (0,100)
  private val vecs = Seq(
    (0L, Array(1.00f, 0.02f)),
    (1L, Array(0.98f, 0.00f)),
    (2L, Array(0.02f, 1.00f)),
    (3L, Array(0.00f, 0.98f)),
    (4L, Array(0.04f, 0.96f)))
    .toDF("vec_id", "embedding")

  test("kMeans separates two obvious clusters and counts their members") {
    // k=2 seeds are vec 0 (group A) and vec 1 (also group A) — after two
    // Lloyd rounds the centroids split: one captures A, the other B
    val out = KMeansCluster.kMeans(vecs, k = 2, iters = 2, dim = 2)
      .collect().map(r => r.getAs[Int]("cluster") -> r.getAs[Long]("n_vectors"))
      .toMap
    assert(out.values.toSeq.sorted === Seq(2L, 3L))
  }

  test("centroids are integer vectors of the quantized scale") {
    val cents = KMeansCluster.kMeans(vecs, k = 2, iters = 1, dim = 2)
      .collect().map(_.getAs[String]("centroid"))
    cents.foreach { c =>
      val parts = c.split(",")
      assert(parts.length === 2)
      parts.foreach(p => assert(p.toLong >= -127L && p.toLong <= 127L))
    }
  }

  test("assignment ties break to the lowest cluster id") {
    // all-identical vectors: every centroid is identical after quantization,
    // so every vector must land in cluster 0
    val same = (0L until 6L).map(i => (i, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val out = KMeansCluster.kMeans(same, k = 3, iters = 2, dim = 2)
      .collect().map(r => r.getAs[Int]("cluster") -> r.getAs[Long]("n_vectors")).toMap
    assert(out.getOrElse(0, 0L) === 6L)
    assert(!out.contains(1) && !out.contains(2))
  }

  test("assignCells puts each vector in its nearest trained cell") {
    val asg = KMeansCluster.assignCells(vecs, k = 2, iters = 2, dim = 2)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    // the two tight groups separate; within-group cells agree
    assert(asg(0L) === asg(1L))
    assert(asg(2L) === asg(3L) && asg(3L) === asg(4L))
    assert(asg(0L) !== asg(2L))
  }

  test("semanticNearDups finds planted near-identical pair within a cell only") {
    val corpus = Seq(
      (0L, Array(1.00f, 0.02f)),   // near-dup of 1
      (1L, Array(0.99f, 0.01f)),
      (2L, Array(0.02f, 1.00f)),   // near-dup of 3
      (3L, Array(0.01f, 0.99f)),
      (4L, Array(-0.90f, -0.44f))) // alone in direction — no pair
      .toDF("vec_id", "embedding")
    val pairs = graft.pipeline.Dedup.semanticNearDups(
        corpus, k = 2, iters = 2, dim = 2, minCosine = 0.95)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    // cos_sq is a ratio of exact ints — bounded by 1
    graft.pipeline.Dedup.semanticNearDups(corpus, k = 2, iters = 2, dim = 2,
      minCosine = 0.95).collect().foreach { r =>
      val c = r.getAs[Double]("cos_sq")
      assert(c >= 0.95 * 0.95 && c <= 1.0 + 1e-12)
    }
  }

  test("result is invariant under input repartitioning") {
    val a = KMeansCluster.kMeans(vecs, k = 2, iters = 2, dim = 2)
      .collect().map(r => (r.getAs[Int]("cluster"), r.getAs[Long]("n_vectors"),
        r.getAs[String]("centroid"))).toSet
    val b = KMeansCluster.kMeans(vecs.repartition(7), k = 2, iters = 2, dim = 2)
      .collect().map(r => (r.getAs[Int]("cluster"), r.getAs[Long]("n_vectors"),
        r.getAs[String]("centroid"))).toSet
    assert(a === b)
  }

  test("cellInertia equals a brute-force recompute from assignCells + kMeans centroids") {
    val got = KMeansCluster.cellInertia(vecs, k = 2, iters = 2, dim = 2)
      .collect().map(r => r.getAs[Int]("cell") ->
        ((r.getAs[Long]("n_vectors"), r.getAs[Long]("inertia")))).toMap
    val cents = KMeansCluster.kMeans(vecs, k = 2, iters = 2, dim = 2)
      .collect().map(r => r.getAs[Int]("cluster") ->
        r.getAs[String]("centroid").split(",").map(_.toLong)).toMap
    val members = KMeansCluster.assignCells(vecs, k = 2, iters = 2, dim = 2)
      .collect().map(r => (r.getAs[Int]("cell"),
        r.getSeq[Long](r.fieldIndex("q")).toSeq))
    val want = members.groupBy(_._1).map { case (cell, ms) =>
      cell -> ((ms.size.toLong, ms.map { case (_, q) =>
        q.zip(cents(cell)).map { case (x, c) => (x - c) * (x - c) }.sum
      }.sum))
    }
    assert(got === want)
  }
}
