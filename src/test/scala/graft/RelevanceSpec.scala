package graft

import graft.pipeline.Relevance

class RelevanceSpec extends SparkTestBase {
  import spark.implicits._

  test("oovRate: top-k vocabulary by frequency with lexicographic ties, exact counts") {
    // corpus frequencies: the=3, cat=2, dog=2, sat=1, ran=1, zz=1
    // vocabSize=3 → vocab {the, cat, dog} (c desc, then term asc beats
    // sat/ran/zz at c=1; cat < dog irrelevant, both in)
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the dog ran"),
      (3L, "the cat dog zz")).toDF("doc_id", "text")
    val got = Relevance.oovRate(docs, "doc_id", "text", vocabSize = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      1L -> ((1L, 3L, 1.0 / 3.0)),   // sat OOV
      2L -> ((1L, 3L, 1.0 / 3.0)),   // ran OOV
      3L -> ((1L, 4L, 0.25))))       // zz OOV
  }

  test("oovRate: duplicate token instances count individually; all-OOV doc is rate 1") {
    val docs = Seq((1L, "a a a b"), (2L, "x y")).toDF("doc_id", "text")
    // vocab size 1 → {a} (freq 3)
    val got = Relevance.oovRate(docs, "doc_id", "text", vocabSize = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(1L -> ((1L, 4L, 0.25)), 2L -> ((2L, 2L, 1.0))))
  }

  test("lmScore: mean bigram conditional probability, instances counted, short docs absent") {
    // corpus bigrams: (a b) ×2 from docs 1,2; (b c) ×1; (a c) ×1
    // P(b|a) = 2/3, P(c|a) = 1/3, P(c|b) = 1
    val docs = Seq(
      (1L, "a b c"),   // bigrams (a b), (b c) → mean( 2/3, 1 ) = 5/6
      (2L, "a b"),     // (a b) → 2/3
      (3L, "a c"),     // (a c) → 1/3
      (4L, "x")).toDF("doc_id", "text") // no bigrams → absent
    val got = Relevance.lmScore(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L)._1 === 2L)
    assert(math.abs(got(1L)._2 - (2.0 / 3.0 + 1.0) / 2.0) < 1e-15)
    assert(got(2L) === ((1L, 2.0 / 3.0)))
    assert(got(3L) === ((1L, 1.0 / 3.0)))
  }

  test("rrfRetrieve: fuses dense and lexical ranks; one-arm hits score one term") {
    import graft.pipeline.Hybrid
    // 4 entities: embeddings make 1 closest to 0; texts make 2 share
    // shingles with 0 while 1 shares none
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val docs = Seq(
      (0L, "the quick brown fox jumps"),
      (1L, "zz yy xx ww vv"),
      (2L, "the quick brown fox sleeps"),
      (3L, "aa bb cc dd ee")).toDF("doc_id", "text")
    val got = Hybrid.rrfRetrieve(docs, emb, numSeeds = 1, topK = 3, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(2), r.getLong(3)))).toMap
    // dense ranks for q 0: 1 (cos~0.994), 2 (0.0), 3 (-1.0)
    // lexical for q 0: only 2 shares shingles ("the quick brown", "quick brown fox")
    val d1 = 1.0 / 61.0           // dense rank 1, no lexical
    val d2 = 1.0 / 62.0 + 1.0 / 61.0 // dense rank 2 + lexical rank 1
    val d3 = 1.0 / 63.0
    assert(got.keySet === Set((0L, 1L), (0L, 2L), (0L, 3L)))
    assert(got((0L, 2L)) === ((d2, 1L))) // fused winner
    assert(got((0L, 1L)) === ((d1, 2L)))
    assert(got((0L, 3L)) === ((d3, 3L)))
  }
  test("cooccurrenceLift: df band prunes hot/rare terms; lift is the exact integer ratio") {
    import graft.pipeline.Relevance
    // df over distinct doc-term pairs: a=4, b=4, c=4, x=1 (d6's repeats
    // count once via array_distinct). Band [0.25N, 0.75N] = [1.5, 4.5]
    // keeps a,b,c (df 4); drops x (df 1). minPairFrac 0.5 -> c_ab >= 3.
    val docs = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "a c"),
      (4L, "a b c"), (5L, "x"), (6L, "b b c c"))
      .toDF("doc_id", "text")
    val got = Relevance.cooccurrenceLift(docs, "doc_id", "text",
        minDfFrac = 0.25, maxDfFrac = 0.75, minPairFrac = 0.5)
      .collect().map(r => (r.getAs[String]("term1"), r.getAs[String]("term2")) ->
        ((r.getAs[Long]("c_ab"), r.getAs[Long]("c_a"), r.getAs[Long]("c_b"),
          r.getAs[Double]("lift")))).toMap
    // pairs in >= 3 docs: (a,b) d1,d2,d4; (a,c) d1,d3,d4; (b,c) d1,d4,d6
    val lift = (3.0 * 6.0) / (4.0 * 4.0)
    assert(got === Map(
      ("a", "b") -> ((3L, 4L, 4L, lift)),
      ("a", "c") -> ((3L, 4L, 4L, lift)),
      ("b", "c") -> ((3L, 4L, 4L, lift))))
    // tighter minPairFrac empties the result rather than lowering the bar
    assert(Relevance.cooccurrenceLift(docs, "doc_id", "text", 0.25, 0.75, 0.625).isEmpty)
  }

  test("vocabCoverage: cumulative token coverage at probe ranks, freq-desc lexicographic order") {
    import graft.pipeline.Relevance
    // token counts: b=5, a=4, c=2, d=1 (12 total); rank order b,a,c,d
    val docs = Seq((1L, "b b b a a"), (2L, "b b a a c c d")).toDF("doc_id", "text")
    val got = Relevance.vocabCoverage(docs, "text", probeRanks = Seq(1, 2, 4))
      .collect().map(r => r.getAs[Long]("vocab_rank") ->
        ((r.getAs[Long]("covered_tokens"), r.getAs[Long]("total_tokens"),
          r.getAs[Double]("coverage")))).toMap
    assert(got === Map(
      1L -> ((5L, 12L, 5.0 / 12.0)),
      2L -> ((9L, 12L, 9.0 / 12.0)),
      4L -> ((12L, 12L, 1.0))))
    // probe past the vocabulary is simply absent, not an error
    assert(!Relevance.vocabCoverage(docs, "text", Seq(9)).collect()
      .map(_.getAs[Long]("vocab_rank")).contains(9L))
  }

  test("sparseCosinePairs: hand-computed integer-weight cosine; df cap prunes pairing") {
    // N=3; df(x)=df(y)=2, df(z)=1 -> floor idf: x,y -> 1, z -> 3
    // wa = {x:2, y:1} (norm 5), wb = {x:1, y:2} (norm 5), wc = {z:9}
    // s(a,b) = 2+2 = 4 -> cos = 4/(sqrt(5)*sqrt(5)) ≈ 0.8 (the exact IEEE
    // value, NOT 0.8: sqrt(5)² rounds to 4.999...6); c pairs with no one
    val docs = Seq((1L, "x x y"), (2L, "x y y"), (3L, "z z z"))
      .toDF("doc_id", "text")
    val got = Relevance.sparseCosinePairs(docs, "doc_id", "text",
        maxDfFrac = 1, minCos = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L,
      4.0 / (math.sqrt(5.0) * math.sqrt(5.0)))))
    // the df cap excludes common terms from PAIRING and from the norms:
    // with maxDfFrac = 2 only z (df=1) survives df*2 <= 3, so no pairs
    assert(Relevance.sparseCosinePairs(docs, "doc_id", "text",
      maxDfFrac = 2, minCos = 0.0).count() === 0L)
    GraftStorage.clear(spark)
  }
}
