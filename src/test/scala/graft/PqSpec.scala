package graft

import graft.pipeline.SimilarityPq
import org.apache.spark.sql.functions._

class PqSpec extends SparkTestBase {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Long) = {
    val rng = new scala.util.Random(seed)
    // unit-normalized, like the harness embeddings
    (0 until n).map { i =>
      val v = Array.fill(dim)(rng.nextFloat() * 2 - 1)
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, v.map(_ / nrm).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("encode: codebook vectors are their own nearest entry with zero error") {
    val df = randVecs(60, 16, seed = 7)
    val enc = SimilarityPq.encode(df, m = 4, k = 8).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Int](1).toList, r.getAs[Long]("err"))).sortBy(_._1)
    assert(enc.length === 60)
    enc.filter(_._1 < 8).foreach { case (id, codes, err) =>
      assert(err === 0L, s"codebook vector $id must reconstruct exactly")
      assert(codes === List.fill(4)(id.toInt),
        s"codebook vector $id should code to itself in every subspace")
    }
    // non-codebook vectors: error non-negative, codes in range
    enc.filter(_._1 >= 8).foreach { case (_, codes, err) =>
      assert(err >= 0L)
      assert(codes.forall(c => c >= 0 && c < 8))
    }
  }

  test("ADC distance equals the independently-reconstructed distance") {
    val df = randVecs(40, 16, seed = 11)
    val m = 4; val k = 8; val ds = 4
    val top = SimilarityPq.adcTopK(df, df.filter(col("vec_id") < 3), m, k, topK = 40)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"), r.getAs[Long]("dist")))

    // reference: quantize + encode + reconstruct in plain Scala
    val vecs = df.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getSeq[Float](1).map(x => math.floor(x.toDouble * SimilarityPq.Scale).toLong).toArray).toMap
    val cb = Array.tabulate(m, k)((s, c) => vecs(c.toLong).slice(s * ds, s * ds + ds))
    def sq(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def code(v: Array[Long], s: Int): Int =
      (0 until k).minBy(c => (sq(v.slice(s * ds, s * ds + ds), cb(s)(c)), c))
    top.foreach { case (q, n, dist) =>
      val expected = (0 until m).map(s =>
        sq(vecs(q).slice(s * ds, s * ds + ds), cb(s)(code(vecs(n), s)))).sum
      assert(dist === expected, s"ADC($q,$n)")
    }
  }

  test("ADC top-k ranks by true reconstruction distance and recalls exact neighbors reasonably") {
    val df = randVecs(200, 16, seed = 23)
    val queries = df.filter(col("vec_id") < 5)
    val approx = SimilarityPq.adcTopK(df, queries, m = 4, k = 16, topK = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    // exact integer-L2 top-10 on the same quantized vectors
    val vecs = df.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getSeq[Float](1).map(x => math.floor(x.toDouble * SimilarityPq.Scale).toLong).toArray).toMap
    val exact = (0L until 5L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (vecs(q).zip(vecs(n)).map { case (x, y) => (x - y) * (x - y) }.sum, n))
        .take(10).map(q -> _)
    }.toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"PQ(m=4) recall@10 vs exact = $recall — codebook degenerated?")
  }

  test("trainCodebook: one Lloyd round does not increase total reconstruction error") {
    val df = randVecs(300, 16, seed = 31)
    val m = 4; val k = 8
    val fixed = SimilarityPq.codebook(df, m, k)
    val trained = SimilarityPq.trainCodebook(df, m, k, iters = 1)
    def totalErr(cb: IndexedSeq[IndexedSeq[Array[Long]]]): Long =
      SimilarityPq.encodeWith(SimilarityPq.quantized(df), cb)
        .agg(sum(col("err"))).collect().head.getLong(0)
    val (e0, e1) = (totalErr(fixed), totalErr(trained))
    assert(e1 <= e0, s"trained err $e1 should be <= fixed err $e0")
    assert(e1 < e0, "on random data one round should strictly improve")
    // entries stay valid subvector-sized arrays
    assert(trained.length === m)
    trained.foreach(sb => { assert(sb.length === k); sb.foreach(c => assert(c.length === 4)) })
  }

  test("ivfPqTopK: searches only the query's cell with plain-ADC distances") {
    import graft.pipeline.SimilarityIvf
    val df = randVecs(150, 16, seed = 37)
    val queries = df.filter(col("vec_id") < 4)
    val got = SimilarityPq.ivfPqTopK(df, queries, numCells = 8, m = 4, k = 8, topK = 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"), r.getAs[Long]("dist")))
    assert(got.nonEmpty)
    val cellOf = SimilarityIvf.assign(df, 8).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    // every returned neighbor shares the query's cell
    got.foreach { case (q, n, _) => assert(cellOf(q) === cellOf(n), s"($q,$n)") }
    // distances agree with the unpruned ADC scan (same codebook)
    val full = SimilarityPq.adcTopK(df, queries, m = 4, k = 8, topK = 150)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) -> r.getAs[Long]("dist")).toMap
    got.foreach { case (q, n, dist) => assert(full((q, n)) === dist) }
    // and the ranking is the within-cell restriction of the full ranking
    // (full.toSeq first: collecting (d, n) pairs straight off the Map
    // would rebuild a Map keyed by d and silently drop tied distances)
    got.groupBy(_._1).foreach { case (q, rows) =>
      val expected = full.toSeq
        .collect { case ((`q`, n), d) if cellOf(n) == cellOf(q) => (d, n) }
        .sorted.take(rows.length).map(_._2).toSet
      assert(rows.map(_._2).toSet === expected, s"query $q")
    }
  }

  test("trainCodebook: iters=0 returns the fixed seed codebook") {
    val df = randVecs(50, 16, seed = 41)
    val a = SimilarityPq.codebook(df, 4, 8)
    val b = SimilarityPq.trainCodebook(df, 4, 8, iters = 0)
    assert(a.flatten.map(_.toSeq) === b.flatten.map(_.toSeq))
  }
}
