package graft

import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  // planted corpus: 1≡2 exact dup, 3 near-dup of 1 (one word differs),
  // 4 unrelated
  private val base = "the quick brown fox jumps over the lazy dog and runs far away home"
  lazy val docs = Seq(
    (1L, base),
    (2L, base),
    (3L, base.replace("lazy", "sleepy")),
    (4L, "completely different content with nothing shared at all here whatsoever today")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val r = Dedup.exact(docs).collect()
      .map(x => (x.getAs[Long]("keep_id"), x.getAs[Long]("dup_cnt"))).toSet
    assert(r === Set((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("sortedNeighborhood: near-dups adjacent in sort order pair; blocks isolate") {
    val pairs = Dedup.sortedNeighborhood(docs, windowSize = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1,2,3 share the 2-char block "th" and sort adjacently → all pair up;
    // 4 starts "co" — a different block, never paired
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("sortedNeighborhood: the window bounds how far apart pairs can form") {
    // five docs in one block whose sort keys order them 0..4
    val many = (0L to 4L).map(i => (i, s"aa doc number $i padded with words"))
      .toDF("doc_id", "text")
    val w2 = Dedup.sortedNeighborhood(many, windowSize = 2, maxDist = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(w2 === Set((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))) // adjacent only
    val w3 = Dedup.sortedNeighborhood(many, windowSize = 3, maxDist = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(w3 === w2 ++ Set((0L, 2L), (1L, 3L), (2L, 4L))) // plus rank-distance 2
  }

  test("minhash: identical docs get identical signatures; near-dups share most") {
    val sigs = Dedup.minhashSignatures(docs).collect()
      .map(r => r.getAs[Long]("id") -> (0 until 8).map(i => r.getAs[Long](s"m$i"))).toMap
    assert(sigs(1L) === sigs(2L))
    val sharedWithNear = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    val sharedWithFar = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b }
    assert(sharedWithNear >= 4, s"near-dup should share most minhashes, got $sharedWithNear")
    assert(sharedWithFar === 0)
  }

  test("LSH banding surfaces the planted near-dup pair, not the unrelated doc") {
    val sigs = Dedup.minhashSignatures(docs)
    // default banding (4 bands × 2 rows): exact dups always collide, the
    // unrelated doc never does (disjoint shingles → disjoint md5 minima)
    val cands = Dedup.lshCandidates(sigs).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.exists(p => p._1 == 4L || p._2 == 4L))
    // near-dup recall is probabilistic at r=2 (J≈0.65 → ~89% per banding);
    // with r=1 a single shared minhash suffices, and the near-dup shares ≥4
    val fine = Dedup.lshCandidates(sigs, numHashes = 8, rowsPerBand = 1).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(fine.contains((1L, 3L)) && fine.contains((2L, 3L)))
    assert(!fine.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("incremental LSH candidates equal full candidates restricted to delta pairs") {
    // delta = docs 3,4; full-corpus truth restricted to pairs touching it
    val isDelta = (id: Long) => id >= 3L
    val sigsAll = Dedup.minhashSignatures(docs)
    val truth = Dedup.lshCandidates(sigsAll, rowsPerBand = 1).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
      .filter(p => isDelta(p._1) || isDelta(p._2)).toSet
    val oldIdx = Dedup.bandKeyIndex(
      Dedup.minhashSignatures(docs.filter(col("doc_id") < 3)), rowsPerBand = 1)
    val deltaIdx = Dedup.bandKeyIndex(
      Dedup.minhashSignatures(docs.filter(col("doc_id") >= 3)), rowsPerBand = 1)
    val inc = Dedup.incrementalLshCandidates(oldIdx.unionByName(deltaIdx), deltaIdx)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(inc === truth)
    // and no old↔old pair leaks in: (1,2) is a full candidate but not incremental
    assert(Dedup.lshCandidates(sigsAll, rowsPerBand = 1).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")))
      .contains((1L, 2L)) && !inc.contains((1L, 2L)))
  }

  test("merged per-partition signatures equal direct signatures exactly") {
    val sh = Dedup.docShingles(docs, "doc_id", "text", 3)
    val merged = Dedup.mergeSignatures(
        Dedup.minhashSignaturesFrom(sh.filter(length(col("sh")) % 2 === 0), 8)
          .unionByName(
            Dedup.minhashSignaturesFrom(sh.filter(length(col("sh")) % 2 === 1), 8)))
      .collect().map(r => r.toSeq).toSet
    val direct = Dedup.minhashSignatures(docs).collect().map(r => r.toSeq).toSet
    assert(merged === direct)
  }

  test("simhash: hamming(near-dup) < hamming(unrelated)") {
    val fps = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash")).toMap
    assert(fps(1L) === fps(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(1L), fps(3L)) < ham(fps(1L), fps(4L)))
  }

  test("simhashPairs finds close pairs via pigeonhole block candidates") {
    val pairs = Dedup.simhashPairs(docs, maxDist = 4).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("ngram jaccard: exact dup scores 1.0; near-dup in (0,1); unrelated absent") {
    val pairs = Dedup.ngramJaccardPairs(docs).collect()
      .map(r => ((r.getAs[Long]("id1"), r.getAs[Long]("id2")), r.getAs[Double]("jaccard"))).toMap
    assert(pairs((1L, 2L)) === 1.0)
    val nd = pairs((1L, 3L))
    assert(nd > 0.0 && nd < 1.0)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("containment: subset doc scores 1.0 containment despite low jaccard") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "alpha beta gamma delta epsilon"), // strict prefix subset of 1
      (3L, "nothing shared here at all with anything else whatsoever"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(corpus, minContainment = 0.9).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(3), r.getDouble(4)))).toMap
    // doc2's 3 shingles all appear in doc1: c21 = 1.0 while jaccard is only 0.3
    assert(pairs.keySet === Set((1L, 2L)))
    assert(pairs((1L, 2L)) === ((0.3, 1.0)))
  }

  test("prefix-filtered pairs equal the brute-force jaccard join above threshold") {
    // richer corpus: planted exact dup, word-swap near-dups, decoys that
    // share common shingles but sit below 0.5
    val corpus = (1L to 10L).map { i =>
      val tail = if (i <= 2) "alpha beta gamma delta epsilon zeta eta theta"
      else if (i == 3) "alpha beta gamma delta epsilon zeta eta iota"
      else s"common words here then unique u$i v$i w$i x$i y$i z$i"
      (i, s"doc opener text $tail")
    }.toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"),
        r.getAs[Long]("shared"), r.getAs[Double]("jaccard"))).toSet
    val brute = key(Dedup.ngramJaccardPairsNaive(corpus, minShared = 1L, minJaccard = 0.5))
    val prefix = key(Dedup.prefixFilteredPairs(corpus, minJaccard = 0.5))
    assert(prefix === brute)            // exact: no false negatives OR positives
    assert(brute.exists(p => p._1 == 1L && p._2 == 2L && p._4 === 1.0))
  }

  test("prefix-filtered pairs: randomized corpora, exact equality with brute force") {
    // seeded random docs over a small vocabulary force heavy shingle
    // sharing and borderline jaccards — the regime where a buggy prefix
    // bound would drop a true pair
    val rnd = new scala.util.Random(42)
    val vocab = Vector("red", "blue", "green", "cat", "dog", "runs", "fast", "slow")
    val corpus = (1L to 20L).map { i =>
      val words = Seq.fill(6 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Double]("jaccard"))).toSet
    for (t <- Seq(0.25, 0.5, 0.75)) {
      val brute = key(Dedup.ngramJaccardPairsNaive(corpus, minShared = 1L, minJaccard = t))
      val prefix = key(Dedup.prefixFilteredPairs(corpus, minJaccard = t))
      assert(prefix === brute, s"threshold $t")
    }
  }

  test("containment prefix-probe-full equals the brute-force all-pairs join") {
    // seeded random small-vocab docs plus planted subset docs: heavy
    // shingle sharing, asymmetric sizes — the regime where a wrong
    // prefix bound (or a min-side mixup) drops a true containment pair
    val rnd = new scala.util.Random(7)
    val vocab = Vector("red", "blue", "green", "cat", "dog", "runs", "fast", "slow")
    val base = (1L to 15L).map { i =>
      val words = Seq.fill(5 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
      (i, words.mkString(" "))
    }
    // subsets of doc 1: high containment, low jaccard
    val corpus = (base ++ Seq(
      (16L, base.head._2.split(" ").take(4).mkString(" ")),
      (17L, base.head._2 + " extra tail words beyond the original")))
      .toDF("doc_id", "text")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"), r.getAs[Long]("shared"),
        r.getAs[Double]("c12"), r.getAs[Double]("c21"))).toSet
    for (c <- Seq(0.5, 0.6, 0.8, 0.9)) {
      val brute = key(Dedup.containmentPairsNaive(corpus, minContainment = c))
      val pref = key(Dedup.containmentPairs(corpus, minContainment = c))
      assert(pref === brute, s"threshold $c")
    }
  }

  test("embedding near-dup finds planted identical vector") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.1f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(vecs, 0.9).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("embeddingNearDupAuto: count-gated regimes that agree on their overlap") {
    // 64-dim vectors (the LSH regime's dim contract) with a planted
    // near-dup pair: base + a tiny perturbation of it + an orthogonal one
    def vec(seed: Int): Seq[Float] =
      (0 until 64).map(i => (((seed * 31 + i) % 7) - 3).toFloat)
    val base = vec(1)
    val near = base.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val vecs = Seq((1L, base), (2L, near), (3L, vec(5)), (4L, vec(9)))
      .toDF("vec_id", "embedding")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) -> r.getAs[Double]("cos"))
      .toMap
    val exact = key(Dedup.embeddingNearDup(vecs, 0.9))
    assert(exact.contains((1L, 2L)), "planted near-dup missing from exact regime")
    // BELOW the limit the auto form IS the exact regime
    val below = key(Dedup.embeddingNearDupAuto(vecs, 0.9, exactLimit = 100L))
    assert(below === exact)
    // ABOVE the limit it switches to self-sizing LSH: a SUBSET of the
    // exact pairs, with bit-identical cosines on the overlap (same
    // Similarity.cosine expression, same operand order)
    val lsh = key(Dedup.embeddingNearDupAuto(vecs, 0.9, exactLimit = 0L))
    lsh.foreach { case (ids, cos) =>
      assert(exact.contains(ids), s"LSH regime invented pair $ids")
      assert(exact(ids) === cos, s"regimes disagree on cosine for $ids")
    }
    GraftStorage.clear(spark)
  }

  test("minhash estimates: exact dup scores 1.0; near-dup strictly between") {
    val est = Dedup.minhashEstimates(docs).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) -> r.getAs[Double]("est_jaccard"))
      .toMap
    assert(est((1L, 2L)) === 1.0) // identical docs agree on every component
    // near-dup pair surfaced by banding agrees on some but not all
    est.get((1L, 3L)).foreach(e => assert(e > 0.0 && e <= 1.0))
    assert(est.keySet.forall { case (a, b) => a < b })
  }

  test("components: transitive chain collapses to one cluster, min id label") {
    // A~B, B~C but no A~C pair, plus an unrelated pair (8,9): the chain
    // must still land in ONE component — the pairwise→cluster gap
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("id1", "id2")
    val comp = Dedup.components(pairs).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("components: long path converges (diameter iterations) and caps loudly") {
    val path = (1L until 8L).map(i => (i, i + 1)).toDF("id1", "id2")
    val comp = Dedup.components(path).collect()
      .map(r => r.getAs[Long]("component")).toSet
    assert(comp === Set(1L)) // every vertex reaches min id 1
    // the cap lives on the DISTRIBUTED regime (the local union-find has no
    // iterations to cap) — force it, on a path long enough that even the
    // halved loop cannot finish in 2 rounds
    val long = (1L until 64L).map(i => (i, i + 1)).toDF("id1", "id2")
    intercept[IllegalArgumentException](
      Dedup.components(long, maxIter = 2, localEdgeThreshold = 0L).collect())
  }

  test("components: local union-find and distributed halved loop agree") {
    // two chains + a triangle + a singleton pair: exercises path
    // compression, union-by-min across chains, and both regimes
    val pairs = Seq(
      (5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), // chain, min 1
      (10L, 11L), (11L, 12L), (12L, 10L),     // triangle, min 10
      (20L, 21L)).toDF("id1", "id2")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toSet
    val local = rows(Dedup.components(pairs))
    val dist = rows(Dedup.components(pairs, localEdgeThreshold = 0L))
    assert(local === dist)
    assert(local === Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("components: halved distributed loop converges on a deep chain well under the diameter cap") {
    // diameter 63 — plain min-label needs 63 rounds and would blow
    // maxIter=20; path halving must land it inside the default cap
    val deep = (1L until 64L).map(i => (i, i + 1)).toDF("id1", "id2")
    val comp = Dedup.components(deep, localEdgeThreshold = 0L).collect()
      .map(r => r.getAs[Long]("component")).toSet
    assert(comp === Set(1L))
  }

  test("components: string ids use UTF8-binary order in both regimes") {
    val pairs = Seq(("b", "a"), ("a", "c"), ("x", "y")).toDF("id1", "id2")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getString(1)).toSet
    val local = rows(Dedup.components(pairs))
    val dist = rows(Dedup.components(pairs, localEdgeThreshold = 0L))
    assert(local === dist)
    assert(local === Set("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("dedupByClusters: one survivor per cluster plus all singletons") {
    val corpus = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val kept = Dedup.dedupByClusters(corpus, pairs).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(kept === Set(1L, 4L, 5L)) // 2,3 fold into 1's cluster
  }

  test("components of no pairs is empty; dedupByClusters keeps everything") {
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.components(empty).count() === 0)
    val corpus = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Dedup.dedupByClusters(corpus, empty).count() === 2)
  }

  test("dedupByClustersKeeping keeps the best-scoring member, ties to min id") {
    val corpus = Seq(
      (1L, "aa"), (2L, "bbbb"), (3L, "cc"),   // cluster {1,2,3}: 2 is longest
      (4L, "dd"), (5L, "dd"),                 // cluster {4,5}: tie → min id 4
      (6L, "solo")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val kept = Dedup.dedupByClustersKeeping(corpus, pairs,
        org.apache.spark.sql.functions.length(col("text")).cast("long"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept === Set(2L, 4L, 6L))
  }

  test("lshRecallAudit: 1 band of all hashes is strictly no more complete than 8 bands of 1") {
    // near-identical docs (1,2) and (3,4); unrelated fillers. With 8
    // one-hash bands a single matching minhash surfaces the pair; with 1
    // eight-hash band every minhash must match — recall can only drop.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"),
      (3L, "one two three four five six seven"),
      (4L, "one two three four five six seven eight"),
      (5L, "completely different words entirely here now"),
      (6L, "another unrelated document text body filler")).toDF("doc_id", "text")
    val rows = Dedup.lshRecallAudit(docs, minJaccard = 0.3, minShared = 1L)
      .collect()
      .map(r => r.getAs[Int]("rows_per_band") ->
        (r.getAs[Long]("true_pairs"), r.getAs[Long]("caught"))).toMap
    assert(rows.keySet === Set(1, 2, 4, 8))
    val truePairs = rows(1)._1
    assert(truePairs > 0) // the planted near-dups are above threshold
    assert(rows.values.forall(_._1 === truePairs)) // truth is config-independent
    // monotone: more bands with fewer rows each can only catch MORE
    assert(rows(1)._2 >= rows(2)._2)
    assert(rows(2)._2 >= rows(4)._2)
    assert(rows(4)._2 >= rows(8)._2)
  }

  test("hammingPairs: complete vs brute force over random 64-bit fingerprints") {
    // deterministic LCG-seeded fingerprints incl. planted near-pairs
    val rnd = new scala.util.Random(42)
    val base = (1L to 40L).map(i => i -> rnd.nextLong())
    val planted = base.take(8).map { case (i, f) =>
      // flip up to 5 bits → guaranteed pairs at dist <= 5
      (i + 100L, f ^ (1L to (i % 5 + 1)).map(b => 1L << rnd.nextInt(64)).reduce(_ | _))
    }
    val all = base ++ planted
    val fpDf = all.toDF("id", "fp")
    for (maxDist <- Seq(0, 3, 5)) {
      val got = Dedup.hammingPairs(fpDf, "id", "fp", bits = 64, maxDist = maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val want = (for {
        (i, fi) <- all; (j, fj) <- all if i < j
        d = java.lang.Long.bitCount(fi ^ fj) if d <= maxDist
      } yield (i, j, d)).toSet
      assert(got === want, s"maxDist=$maxDist")
    }
  }
}
