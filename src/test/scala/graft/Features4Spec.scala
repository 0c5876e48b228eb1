package graft

import graft.GraftStorage.Syntax
import graft.graph.Graph
import graft.pipeline.{Chunking, Dedup, Mix, QualityFilters, Relevance, SimilarityLsh}
import org.apache.spark.sql.functions._

/** Round-10 operator specs: Katz centrality, incremental components,
  * filter-rule ablation, distribution matching, packing stats,
  * interpolated LM scoring, and the ANN recall audit.
  */
class Features4Spec extends SparkTestBase {
  import spark.implicits._

  test("katzCentrality matches the hand-computed chain-with-shortcut") {
    // a→b, b→c, a→c: n1 = {b:1, c:2}; n2 = {c:1} (a→b→c); n3 = {}.
    // katz (betaDen=5, maxLen=3): a=0, b=25·1=25, c=25·2+5·1=55.
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"))
      .toDF("src", "dst").withColumn("w", lit(1.0)).withColumn("type", lit("T"))
    val got = Graph(Graph.verticesOf(e), e).katzCentrality(maxLen = 3, betaDen = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 0L, "b" -> 25L, "c" -> 55L))
  }

  test("katzCentrality counts WALKS (multiplicity), repartition-invariant") {
    // diamond a→b, a→c, b→d, c→d: two length-2 walks into d.
    // n1 = {b:1, c:1, d:2}; n2 = {d:2}; katz(d) = 25·2 + 5·2 = 60.
    val e = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"))
      .toDF("src", "dst").withColumn("w", lit(1.0)).withColumn("type", lit("T"))
    val g = Graph(Graph.verticesOf(e), e)
    val got = g.katzCentrality().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("d") === 60L && got("a") === 0L && got("b") === 25L)
    val g2 = Graph(Graph.verticesOf(e).repartition(7), e.repartition(5))
    assert(g2.katzCentrality().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === got)
  }

  test("componentsIncremental equals the full recompute on randomized splits") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val n = 24
      val pairs = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val df = pairs.toDF("id1", "id2")
      val cut = 4 + trial * 4 // vary the old/delta boundary per trial
      val oldPairs = df.filter($"id1" < cut && $"id2" < cut)
      val delta = df.filter($"id1" >= cut || $"id2" >= cut)
      val full = Dedup.components(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val inc = Dedup.componentsIncremental(Dedup.components(oldPairs), delta)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(inc === full, s"trial $trial (cut $cut): incremental != full recompute")
      GraftStorage.clear(spark)
    }
  }

  test("componentsIncremental: delta-only docs and unmerged families keep canonical labels") {
    // old: {1,2} and {5,6}; delta connects 2-5 (merges) and adds fresh 8-9
    val oldLabels = Dedup.components(Seq((1L, 2L), (5L, 6L)).toDF("id1", "id2"))
    val delta = Seq((2L, 5L), (8L, 9L)).toDF("id1", "id2")
    val got = Dedup.componentsIncremental(oldLabels, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 8L -> 8L, 9L -> 8L))
    GraftStorage.clear(spark)
  }

  test("ablation agrees with failReasons row by row") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val reasons = docs.select(QualityFilters.failReasons(col("text")).as("rs"))
      .collect().map(_.getString(0))
    val expected = QualityFilters.GopherRules.map { r =>
      r.name -> ((reasons.count(_.split(',').contains(r.name)).toLong,
        reasons.count(_ == r.name).toLong))
    }.toMap
    val got = QualityFilters.ablation(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    // every rule must discriminate on the harness corpus (calibration)
    assert(got.values.forall(_._1 > 0L))
  }

  test("matchDistribution: exact feasibility math, audit rates, infeasible target throws") {
    // counts: s0=100, s1=50, s2=200; targets 1:1:2 (W=4)
    // T = min(100·4/1, 50·4/1, 200·4/2) = 200
    // rates: s0 = 200/(4·100) = 0.5, s1 = 200/(4·50) = 1.0, s2 = 400/(4·200) = 0.5
    val df = ((0 until 100).map(i => (i.toLong, "s0")) ++
      (100 until 150).map(i => (i.toLong, "s1")) ++
      (150 until 350).map(i => (i.toLong, "s2"))).toDF("id", "stratum")
    val targets = Seq(("s0", 1L), ("s1", 1L), ("s2", 2L))
    val audit = Mix.matchDistributionAudit(df, "stratum", targets, $"id")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(audit("s0")._2 === 0.5 && audit("s1")._2 === 1.0 && audit("s2")._2 === 0.5)
    assert(audit("s1")._3 === 50L) // rate 1.0 keeps the whole stratum
    // repartition-invariant keep set (pure row decision)
    val a = Mix.matchDistribution(df, "stratum", targets, $"id")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Mix.matchDistribution(df.repartition(13), "stratum", targets, $"id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // a target stratum absent from the corpus must fail loudly
    intercept[IllegalArgumentException] {
      Mix.matchDistribution(df, "stratum", targets :+ (("ghost", 1L)), $"id")
    }
  }

  test("packStats matches the hand-computed boundary straddle") {
    // one source, three 100-token docs, budget 256: doc c spans
    // offsets [200, 300) → crosses the 256 boundary. 2 packs total.
    def doc(id: Long) = (id, "src", Seq.fill(100)("w").mkString(" "))
    val docs = Seq(doc(1L), doc(2L), doc(3L)).toDF("doc_id", "source", "text")
    val row = Chunking.packStats(docs, "doc_id", "text", "source", budget = 256)
      .collect().head
    assert(row.getAs[Long]("n_docs") === 3L)
    assert(row.getAs[Long]("n_packs") === 2L)
    assert(row.getAs[Long]("total_tokens") === 300L)
    assert(row.getAs[Long]("n_split_docs") === 1L)
    assert(row.getAs[Double]("split_frac") === 1.0 / 3.0)
  }

  test("lmScoreInterpolated: hand-computed JM blend") {
    // corpus "a b" / "a c": P(b|a) = 1/2, P_uni(b) = 1/4 → doc1 = 0.375
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = Relevance.lmScoreInterpolated(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got === Map(1L -> 0.375, 2L -> 0.375))
    // single doc "x y": P(y|x) = 1, P_uni(y) = 1/2 → (1 + 0.5)/2 = 0.75
    val one = Relevance.lmScoreInterpolated(Seq((9L, "x y")).toDF("doc_id", "text"))
      .collect().head
    assert(one.getLong(1) === 1L && one.getDouble(2) === 0.75)
  }

  test("tablesFor follows the S-curve: monotone in target, inverse-monotone in planes") {
    import graft.pipeline.SimilarityLsh.tablesFor
    // measured anchor (SCALE.md r10): 4 planes @ cos 0.35 — the formula
    // must predict ≥0.97 recall at 24 tables and the probe measured 0.973
    val p = 1.0 - math.acos(0.35) / math.Pi
    val r24 = 1.0 - math.pow(1.0 - math.pow(p, 4.0), 24.0)
    assert(r24 > 0.97)
    assert(tablesFor(4, targetRecall = 0.97, minCosine = 0.35) <= 24)
    // more planes → finer buckets → more tables to hold the same recall
    assert(tablesFor(8, 0.9, 0.35) > tablesFor(4, 0.9, 0.35))
    // higher target → more tables
    assert(tablesFor(6, 0.99, 0.5) > tablesFor(6, 0.5, 0.5))
    // the 64-table cap engages for near-orthogonal demands
    assert(tablesFor(16, 0.99, 0.1) === 64)
    intercept[IllegalArgumentException] { tablesFor(4, 1.0, 0.5) }
  }

  test("topKAutoRecall meets its recall contract on the sf0.01 corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // knnRecallAudit with the same table count topKAutoRecall derives
    // (planesFor(500)=4 → tablesFor(4, 0.9, 0.35)=16) audits the same
    // graph; the audit's anchors measure top-3 recall vs brute force.
    // Deterministic (no RNG anywhere) — this is a fixed measurement.
    val planes = SimilarityLsh.planesFor(500, SimilarityLsh.PairingMaxBucket)
    val tables = SimilarityLsh.tablesFor(planes, 0.9, 0.35)
    val mean = SimilarityLsh.knnRecallAudit(emb, k = 3, nAnchors = 50,
        numTables = tables)
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(mean >= 0.85, s"recall-sized graph measured $mean (tables=$tables)")
    GraftStorage.clear(spark)
  }

  test("kthSmallest equals the sorted-order statistic on randomized data") {
    import graft.pipeline.Selection
    val rnd = new scala.util.Random(11)
    // wide range (forces multiple refinement rounds) + duplicates
    val xs = Seq.fill(500)(rnd.nextLong() % 100000000L) ++ Seq.fill(50)(42L)
    val df = xs.toDF("x")
    val sorted = xs.sorted
    for (k <- Seq(1L, 275L, 550L)) {
      val row = Selection.kthSmallest(df, "x", k).collect().head
      assert(row.getLong(0) === 550L && row.getLong(1) === k)
      assert(row.getLong(2) === sorted((k - 1).toInt), s"k=$k")
    }
    intercept[IllegalArgumentException] { Selection.kthSmallest(df, "x", 0L) }
    intercept[IllegalArgumentException] { Selection.kthSmallest(df, "x", 551L) }
  }

  test("kthSmallest survives value spans >= 2^63 (span arithmetic must not wrap)") {
    import graft.pipeline.Selection
    // span = MaxValue - MinValue ≈ 2^64: `hi - lo` wraps negative in
    // long arithmetic, which used to skip refinement entirely and
    // collect EVERY distinct value as the "terminal range" (ADVICE r10
    // #2). >4096 distinct values near each extreme force the loop to
    // actually refine in the overflow regime, and k on both sides plus
    // the near-MaxValue rows exercise the `lo + width - 1` clamp.
    val xs = (0 until 4500).map(i => Long.MaxValue - i * 1000L) ++
      (0 until 4500).map(i => Long.MinValue + i * 1000L) ++
      Seq(0L, 7L, -7L)
    val df = xs.toDF("x")
    val sorted = xs.sorted
    for (k <- Seq(1L, 2L, 4501L, 4502L, 4503L, 9000L, 9003L)) {
      val row = Selection.kthSmallest(df, "x", k).collect().head
      assert(row.getLong(2) === sorted((k - 1).toInt), s"k=$k")
    }
  }

  test("lshIndexAfterChanges: deletes vanish from candidates, adds probe the survivors") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val idx = Dedup.bandKeyIndex(Dedup.minhashSignatures(docs))
      .persistTracked()
    val stored = idx.filter(!(col("id") % 10).isin(7L, 9L))
    val adds = idx.filter((col("id") % 10).isin(7L, 9L))
    val deletes = stored.select(col("id")).filter(col("id") % 10 === 8).distinct()
    val after = Dedup.lshIndexAfterChanges(stored, adds, deletes)
    // deleted ids have zero index rows left
    assert(after.join(deletes, Seq("id")).count() === 0L)
    val cands = Dedup.incrementalLshCandidates(after, adds).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every candidate touches an add; none touches a deleted doc
    assert(cands.forall { case (a, b) =>
      (a % 10 == 7 || a % 10 == 9 || b % 10 == 7 || b % 10 == 9) &&
        a % 10 != 8 && b % 10 != 8
    })
    // equivalence with the full-corpus candidate set restricted the same way
    val full = Dedup.lshCandidates(Dedup.minhashSignatures(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) =>
        a % 10 != 8 && b % 10 != 8 &&
          (a % 10 == 7 || a % 10 == 9 || b % 10 == 7 || b % 10 == 9)
      }
    assert(cands.toSet === full.toSet)
    GraftStorage.clear(spark)
  }

  test("kmvContainment: detects a strict subset source directionally") {
    import graft.pipeline.Sketches
    // A = {k1..k50} strictly inside B = {k1..k200}
    val rows = (1 to 50).map(i => ("A", s"k$i")) ++ (1 to 200).map(i => ("B", s"k$i"))
    val df = rows.toDF("g", "key")
    val sk = Sketches.kmvSketch(df, "g", "key", k = 64)
    val got = Sketches.kmvContainment(sk, "g", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // A is 100% contained in B (estimator noise from the k-th-min); B is ~25% in A
    assert(got(("A", "B")) > 0.7, s"cont(A in B) = ${got(("A", "B"))}")
    assert(got(("B", "A")) < 0.5, s"cont(B in A) = ${got(("B", "A"))}")
    assert(got.values.forall(_ >= 0.0))
  }

  test("dedup cascade: stage attribution consistent with its stage operators") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_dedup_cascade")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.length === docs.count())
    assert(out.map(_._1).distinct.length === out.length, "one row per doc")
    // stage-1 victims must be exactly the Jaccard components' non-min members
    val v1 = Dedup.components(
        Dedup.ngramJaccardPairs(docs, minShared = 2L, minJaccard = 0.5)
          .select("id1", "id2"))
      .filter(col("id") =!= col("component"))
      .collect().map(_.getLong(0)).toSet
    assert(out.filter(_._2 == "near_dup").map(_._1).toSet === v1)
    // all three stages non-vacuous on the harness corpus; reps are
    // canonical (kept → self, removed → the smaller min-id representative)
    val byStage = out.groupBy(_._2)
    assert(byStage.keySet === Set("near_dup", "fingerprint", "kept"))
    out.foreach { case (id, st, rep) =>
      if (st == "kept") assert(rep === id) else assert(rep < id)
    }
    GraftStorage.clear(spark)
  }

  test("knnRecallAudit: anchors-sized output, recall bounds, exact-truth cardinality") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val audit = SimilarityLsh.knnRecallAudit(emb, k = 3, nAnchors = 10, numTables = 4)
      .collect()
    assert(audit.length === 10)
    audit.foreach { r =>
      val (t, c, rec) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(t === 3L, "truth side must find exactly k neighbors")
      assert(c >= 0L && c <= t)
      assert(rec === c.toDouble / t.toDouble)
    }
    GraftStorage.clear(spark)
  }
}
