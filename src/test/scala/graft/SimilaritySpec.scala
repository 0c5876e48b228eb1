package graft

import graft.pipeline.{Similarity, SimilarityLsh}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Long) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rng.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  test("cosine matches a manual computation") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(4.0f, 5.0f, 6.0f))).toDF("vec_id", "embedding")
    val c = df.as("a").join(df.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")))
      .collect().head.getDouble(0)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(c - expected) < 1e-12)
  }

  test("brute-force top-k: k rows per query, descending, deterministic ties") {
    val corpus = randVecs(50, 8, seed = 1)
    val queries = corpus.filter(col("vec_id") < 3)
    val r = Similarity.bruteForceTopK(queries, corpus, k = 5).collect()
    assert(r.length === 15)
    r.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Double]("cos")).sliding(2).forall(s => s(0) >= s(1)))
    }
  }

  test("LSH candidates achieve good recall on high-threshold pairs") {
    val corpus = randVecs(200, 16, seed = 2)
    // ground truth: all pairs with cosine >= 0.6
    val truth = Dedup0.bruteforcePairs(spark, corpus, 0.6)
    val cands = SimilarityLsh.candidatePairs(corpus, numPlanes = 4, numTables = 6, dim = 16)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    val recalled = truth.count(cands.contains)
    assert(truth.isEmpty || recalled.toDouble / truth.size >= 0.5,
      s"recall ${recalled}/${truth.size} too low")
  }

  test("IVF: cell assignment is deterministic and cell-mates are found") {
    import graft.pipeline.SimilarityIvf
    // ids 0,1 are the fixed centroids (orthogonal); others cluster near one
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),   // near centroid 0
      (3L, Seq(0.1f, 0.9f, 0.0f, 0.0f)),   // near centroid 1
      (4L, Seq(0.95f, 0.05f, 0.0f, 0.0f))) // near centroid 0
      .toDF("vec_id", "embedding")
    val cells = SimilarityIvf.assign(vecs, k = 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    assert(cells === Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
    val topk = SimilarityIvf.topKWithinCell(vecs, vecs.filter(col("vec_id") === 2), k = 5, numCells = 2)
      .collect().map(_.getAs[Long]("n_id")).toSet
    assert(topk === Set(0L, 4L))  // cell 0 mates only; 1 and 3 are unreachable
  }

  test("IVF multi-probe recovers the cross-boundary neighbor nprobe=1 misses") {
    import graft.pipeline.SimilarityIvf
    // centroids: ids 0,1. Query (id 5) sits just inside cell 0; its TRUE
    // nearest neighbor (id 6) quantizes into cell 1 — the boundary case
    // multi-probe exists for.
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.8f, 0.6f)),
      (5L, Seq(0.95f, 0.3122f)),  // cos to c0 = .95 > cos to c1 ≈ .947
      (6L, Seq(0.9f, 0.4359f)))   // cos to c1 ≈ .98 > cos to c0 = .90
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 5)
    val single = SimilarityIvf.topKWithinCell(vecs, q, k = 3, numCells = 2)
      .collect().map(_.getAs[Long]("n_id")).toSet
    assert(single === Set(0L)) // id 6 invisible from cell 0
    val multi = SimilarityIvf.topKMultiProbe(vecs, q, k = 3, numCells = 2, nprobe = 2)
      .collect().map(r => r.getAs[Long]("rank") -> r.getAs[Long]("n_id")).toMap
    assert(multi(1L) === 6L) // the cross-boundary true NN now ranks first
    assert(multi.values.toSet === Set(0L, 1L, 6L))
  }

  test("trained IVF: refined centroids are the exact fixed-point cell means") {
    import graft.pipeline.SimilarityIvf
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.8f, 0.2f)),  // cell 0
      (3L, Seq(0.2f, 0.8f)))  // cell 1
      .toDF("vec_id", "embedding")
    val refined = SimilarityIvf.refineCentroids(vecs, k = 2).collect()
      .map(r => r.getAs[Long]("cid") -> r.getAs[Seq[Double]]("ce")).toMap
    // cell 0 = {v0, v2}: mean of floor-scaled elements over 2^20
    def fp(xs: Seq[Float]) = xs.map(x => math.floor(x.toDouble * (1L << 20)))
    def mean2(a: Seq[Float], b: Seq[Float]) =
      fp(a).zip(fp(b)).map { case (x, y) => (x + y) / 2.0 / (1L << 20).toDouble }
    assert(refined(0L) === mean2(Seq(1.0f, 0.0f), Seq(0.8f, 0.2f)))
    assert(refined(1L) === mean2(Seq(0.0f, 1.0f), Seq(0.2f, 0.8f)))
  }

  test("trained IVF: refinement is bit-deterministic under repartitioning") {
    import graft.pipeline.SimilarityIvf
    val corpus = randVecs(120, 8, seed = 7)
    def run(parts: Int) = SimilarityIvf.refineCentroids(corpus.repartition(parts), k = 4)
      .collect().map(r => r.getAs[Long]("cid") -> r.getAs[Seq[Double]]("ce")).toMap
    assert(run(13) === run(3))
  }

  test("trained IVF: recall beats the fixed quantizer on clustered data with bad seeds") {
    import graft.pipeline.SimilarityIvf
    // 3 tight clusters far from the origin-adjacent seed vectors: the
    // fixed quantizer (first k by id) puts ALL clusters behind whichever
    // seed they lean toward; one refinement pass moves centroids onto the
    // clusters and splits them into separate cells
    val rng = new scala.util.Random(11)
    val centers = Seq(
      Array(10.0, 0.0, 0.0, 1.0), Array(0.0, 10.0, 0.0, 1.0), Array(0.0, 0.0, 10.0, 1.0))
    val clustered = (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong + 3, c.map(x => (x + rng.nextGaussian() * 0.3).toFloat).toSeq)
    }
    // seeds 0..2 (the fixed centroids) are nearly collinear junk vectors
    val seeds = Seq(
      (0L, Seq(1.0f, 1.0f, 1.0f, 0.0f)),
      (1L, Seq(1.0f, 1.0f, 0.9f, 0.0f)),
      (2L, Seq(1.0f, 0.9f, 1.0f, 0.0f)))
    val corpus = (seeds ++ clustered).toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") >= 3 && col("vec_id") < 15)

    val truth = Similarity.bruteForceTopK(queries, corpus, k = 5).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    def recall(df: org.apache.spark.sql.DataFrame) = {
      val got = df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
      truth.count(got.contains).toDouble / truth.size
    }
    val fixed = recall(SimilarityIvf.topKWithinCell(corpus, queries, k = 5, numCells = 3))
    val trained = recall(SimilarityIvf.topKTrained(corpus, queries, k = 5, numCells = 3))
    assert(trained > fixed, s"trained recall $trained not above fixed $fixed")
    assert(trained >= 0.9, s"trained recall $trained below 0.9")
  }

  test("random projection: deterministic, k dims, JL distance correlation") {
    val corpus = randVecs(80, 32, seed = 21)
    val proj = corpus.select($"vec_id", Similarity.project($"embedding", k = 12, dim = 32).as("p"))
    val a = proj.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    val b = corpus.repartition(7)
      .select($"vec_id", Similarity.project($"embedding", k = 12, dim = 32).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    assert(a === b) // plan-literal planes → bit-identical anywhere
    assert(a.values.forall(_.length == 12))
    // JL sanity: full-dim and projected euclidean distances correlate
    // strongly over random pairs (not a tight bound at k=12 — direction)
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toList).toMap
    def d2(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).map { case (u, v) => (u - v) * (u - v) }.sum
    val pairs = (0L until 40L).map(i => (i, i + 40L))
    val full = pairs.map { case (i, j) => d2(vecs(i).map(_.toDouble), vecs(j).map(_.toDouble)) }
    val prjd = pairs.map { case (i, j) => d2(a(i), a(j)) }
    def corr(x: Seq[Double], y: Seq[Double]) = {
      val (mx, my) = (x.sum / x.size, y.sum / y.size)
      val cov = x.zip(y).map { case (u, v) => (u - mx) * (v - my) }.sum
      cov / math.sqrt(x.map(u => (u - mx) * (u - mx)).sum * y.map(v => (v - my) * (v - my)).sum)
    }
    assert(corr(full, prjd) > 0.5, s"JL correlation too weak: ${corr(full, prjd)}")
  }

  test("bucket key is a deterministic bit string") {
    val corpus = randVecs(10, 8, seed = 3)
    val planes = SimilarityLsh.hyperplanes(6, 8)
    val k1 = corpus.select(SimilarityLsh.bucketKey(col("embedding"), planes)).collect().map(_.getString(0))
    val k2 = corpus.select(SimilarityLsh.bucketKey(col("embedding"), planes)).collect().map(_.getString(0))
    assert(k1 === k2)
    assert(k1.forall(k => k.length === 6 && k.forall(c => c == '0' || c == '1')))
  }

  test("kNN graph (topK): per-vector rank window over candidates, repartition-invariant") {
    val corpus = randVecs(60, 8, seed = 5)
    val g = SimilarityLsh.topK(corpus, k = 3, numPlanes = 3, numTables = 6, dim = 8)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("n_id"), r.getAs[Double]("cos")))
    // ranks are 1..min(3, candidates) per vector, cos non-increasing in rank
    g.groupBy(_._1).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_._2)
      assert(byRank.map(_._2) === (1L to byRank.length).toSeq, s"q=$q")
      assert(byRank.map(_._4).sliding(2).forall(s => s.length < 2 || s(0) >= s(1)), s"q=$q")
      assert(!byRank.exists(_._3 == q)) // never its own neighbor
    }
    val g2 = SimilarityLsh.topK(corpus.repartition(7), k = 3,
        numPlanes = 3, numTables = 6, dim = 8)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("n_id"), r.getAs[Double]("cos")))
    assert(g2.toSet === g.toSet)
  }

  test("topKAuto: equals topK at the planesFor-derived count under the topK bucket cap") {
    val corpus = randVecs(60, 8, seed = 11)
    val planes = SimilarityLsh.planesFor(60, SimilarityLsh.PairingMaxBucket)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("n_id"), r.getAs[Double]("cos"))).toSet
    val auto = key(SimilarityLsh.topKAuto(corpus, k = 3, numTables = 6, dim = 8))
    val pinned = key(SimilarityLsh.topK(corpus, k = 3, numPlanes = planes,
      numTables = 6, dim = 8))
    assert(auto === pinned)
    assert(auto.nonEmpty)
    GraftStorage.clear(spark)
  }

  test("nnDescentRound: recall vs true kNN never decreases; shape preserved") {
    val n = 80
    val corpus = randVecs(n, 8, seed = 7)
    // local brute-force truth: top-3 by cosine (random floats — no ties)
    val vecs = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val truth = vecs.keys.flatMap { q =>
      vecs.keys.filter(_ != q).toSeq.sortBy(o => (-cos(vecs(q), vecs(o)), o))
        .take(3).map(q -> _)
    }.toSet
    def edges(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val g0 = SimilarityLsh.topK(corpus, k = 3, numPlanes = 4, numTables = 3, dim = 8)
    val g1 = SimilarityLsh.nnDescentRound(corpus, g0, k = 3)
    val (r0, r1) = (edges(g0).count(truth) , edges(g1).count(truth))
    assert(r1 >= r0, s"refined recall $r1 < initial $r0")
    g1.collect().groupBy(_.getAs[Long]("q_id")).foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to rows.length))
      assert(!rows.exists(_.getAs[Long]("n_id") == q))
    }
  }

  test("skew-guard drops are counted and warn-logged, never silent") {
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property

    // the counting unit on a synthetic over-limit bucket: one bucket of
    // 5 over a cap of 3 → exactly those 5 memberships are dropped
    val keyed = Seq(
      (1L, 0, "b1"), (2L, 0, "b1"), (3L, 0, "b1"), (4L, 0, "b1"), (5L, 0, "b1"),
      (6L, 0, "b2"), (7L, 0, "b2")).toDF("vec_id", "tbl", "bucket")
    assert(SimilarityLsh.droppedMemberships(keyed, 3L) === 5L)
    assert(SimilarityLsh.droppedMemberships(keyed, 10000L) === 0L)

    // end-to-end through the NON-auto path (the one that used to drop
    // silently — r9 verdict task #2): 20 identical vectors share one
    // bucket per table; cap 10 → every membership drops, the pairing
    // returns nothing, and the run must say so out loud
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val app = new AbstractAppender(
        "graft-test-capture", null, null, true, Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit =
        captured.add(e.getMessage.getFormattedMessage)
    }
    app.start()
    val logger = LogManager.getContext(false).asInstanceOf[LoggerContext]
      .getLogger("graft.SimilarityLsh")
    logger.addAppender(app)
    try {
      val same = (0 until 20).map(i => (i.toLong, Seq.fill(8)(0.5f)))
        .toDF("vec_id", "embedding")
      val pairs = SimilarityLsh.candidatePairs(same, numPlanes = 4,
        numTables = 2, dim = 8, maxBucketSize = 10L)
      assert(pairs.count() === 0L)
      val warns = captured.toArray.map(_.toString)
        .filter(_.contains("skew guard dropping"))
      assert(warns.nonEmpty, "over-limit drop produced no warning")
      // 20 vectors × 2 tables = 40 dropped memberships, reported exactly
      assert(warns.exists(_.contains("40 vector-bucket")), s"got: ${warns.toSeq}")
    } finally { logger.removeAppender(app); app.stop() }
    GraftStorage.clear(spark)
  }

  test("r13 audit optimization: anchor-restricted audits equal the full-graph audits exactly") {
    import graft.pipeline.{SimilarityHier, SimilarityIvf}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val cells = SimilarityLsh.cellsFor(n)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_truth"),
        r.getAs[Long]("n_caught"))).toSet
    // 1. flat-IVF audit (now candidates-based) == ranking the FULL graph
    //    and semi-joining anchors after (the pre-r13 shape)
    val fullGraphAudit = SimilarityLsh.recallAuditCore(emb, 3, 50,
      SimilarityIvf.knnGraph(emb, 3, cells))
    val anchored = SimilarityIvf.knnGraphRecallAudit(emb, 3, 50, cells)
    assert(rows(anchored) === rows(fullGraphAudit),
      "anchor-restricted flat audit diverges from the full-graph audit")
    GraftStorage.clear(spark)
    // 2. multi-probe audit (query side restricted to anchors) == full
    //    multi-probe graph audit; also pins that knnGraphMultiProbe's
    //    distinct() is a no-op (each (q,n) arises once), which the
    //    anchored variant omits
    val np = 3
    val fullMp = SimilarityLsh.recallAuditCore(emb, 3, 50,
      SimilarityIvf.knnGraphMultiProbe(emb, 3, cells, np))
    val anchoredMp = SimilarityIvf.knnGraphRecallAudit(emb, 3, 50, cells, np)
    assert(rows(anchoredMp) === rows(fullMp),
      "anchor-restricted multi-probe audit diverges from the full-graph audit")
    GraftStorage.clear(spark)
    // 3. hier audit (candidates-based) == full hier graph audit
    val fullHier = SimilarityLsh.recallAuditCore(emb, 3, 50,
      SimilarityHier.knnGraphHier(emb, 3, capMult = 1, nprobe = 2, knownCount = n))
    val anchoredHier = SimilarityHier.knnGraphHierRecallAudit(emb, 3, 50,
      capMult = 1, nprobe = 2, knownCount = n)
    assert(rows(anchoredHier) === rows(fullHier),
      "anchor-restricted hier audit diverges from the full-graph audit")
    GraftStorage.clear(spark)
    // 4. LSH audit (candidates-based) == full topKAuto graph audit
    val fullLsh = SimilarityLsh.recallAuditCore(emb, 3, 50,
      SimilarityLsh.topKAuto(emb, 3, numTables = 4))
    val anchoredLsh = SimilarityLsh.knnRecallAudit(emb, 3, 50, numTables = 4)
    assert(rows(anchoredLsh) === rows(fullLsh),
      "anchor-restricted LSH audit diverges from the full-graph audit")
    GraftStorage.clear(spark)
    // 5. the multi-probe graph's scored rows are unique per (q_id, n_id)
    //    — the removed distinct() deduplicated nothing (r13)
    val mpGraph = SimilarityIvf.knnGraphMultiProbe(emb, 1000, cells, np)
      .select("q_id", "n_id")
    assert(mpGraph.count() === mpGraph.distinct().count(),
      "multi-probe scored rows are not unique — the distinct removal is unsound")
    GraftStorage.clear(spark)
  }
}

/** tiny helper kept out of the suite for clarity */
object Dedup0 {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  def bruteforcePairs(spark: SparkSession, corpus: DataFrame, thr: Double): Set[(Long, Long)] = {
    import graft.pipeline.Dedup
    Dedup.embeddingNearDup(corpus, thr).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
  }
}
