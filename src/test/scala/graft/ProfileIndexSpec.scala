package graft

import graft.pipeline.{Index, Profile}
import org.apache.spark.sql.functions._

class ProfileIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("inverted index: df counts all docs, postings sorted and capped") {
    val docs = Seq(
      (3L, "b a"), (1L, "a a c"), (2L, "a b"))
      .toDF("doc_id", "text")
    val idx = Index.inverted(docs, "doc_id", "text", minDf = 1L, maxPostings = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(idx("a") === ((3L, "1,2")))   // df=3 (duplicate within doc 1 collapsed), cap=2
    assert(idx("b") === ((2L, "2,3")))
    assert(idx("c") === ((1L, "1")))
  }

  test("ngramNovelty: verbatim duplicate scores 0.0, first occurrence 1.0") {
    val docs = Seq(
      (1L, "a b c d"),      // grams "a b c", "b c d" — first occurrence
      (2L, "a b c d"),      // verbatim re-crawl of doc 1 → novelty 0.0
      (3L, "x y z a b c"))  // 3 novel grams + 1 seen ("a b c") → 3/4
      .toDF("doc_id", "text")
    val got = Profile.ngramNovelty(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty")))).toMap
    assert(got(1L) === ((2L, 2L, 1.0)))
    assert(got(2L) === ((2L, 0L, 0.0)))
    assert(got(3L) === ((4L, 3L, 0.75)))
  }

  test("gramDupMass: bag semantics — within-doc repeats count as duplicate mass") {
    val docs = Seq(
      (1L, "srcA", "a b c a b c"), // instances: abc, bca, cab, abc → 4 total, 3 distinct
      (2L, "srcB", "p q r"))       // 1 total, 1 distinct
      .toDF("doc_id", "source", "text")
    val got = Profile.gramDupMass(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("total_grams"), r.getAs[Long]("distinct_grams"),
          r.getAs[Double]("dup_mass_frac")))).toMap
    assert(got("srcA") === ((4L, 3L, 0.25)))
    assert(got("srcB") === ((1L, 1L, 0.0)))
  }

  test("keySkew: count-of-counts histogram with row contributions") {
    val df = Seq("a", "a", "a", "b", "b", "b", "c").toDF("k")
    val got = Profile.keySkew(df, "k").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // two keys occur 3× (6 rows), one key occurs once
    assert(got === Map(3L -> ((2L, 6L)), 1L -> ((1L, 1L))))
  }

  test("profile: null and exact distinct counts per column, one row each") {
    val df = Seq(
      (Some(1), Some("x")), (None, Some("x")), (Some(1), None), (Some(2), Some("y")))
      .toDF("a", "b")
    val got = Profile.columns(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("a") === ((1L, 2L)))
    assert(got("b") === ((1L, 2L)))
  }

  test("profile plans one scan: multi-distinct goes through a single Expand") {
    val df = Seq((1, "x")).toDF("a", "b")
    val plan = Profile.columns(df, Seq("a", "b")).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert("(?s)Scan|LocalTableScan".r.findAllIn(plan).size >= 1)
  }

  test("bitmap: popcounts recover per-value counts; positions are repartition-invariant") {
    val df = (0L until 100L).map(i => (i, s"v${i % 3}")).toDF("id", "cat")
    val bm = Index.bitmap(df, "cat", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // total popcount per value == its row count; no bit above 31 is ever set
    val pops = bm.groupBy(_._1).view
      .mapValues(_.map(t => java.lang.Long.bitCount(t._3).toLong).sum).toMap
    assert(pops === Map("v0" -> 34L, "v1" -> 33L, "v2" -> 33L))
    assert(bm.forall { case (_, _, bits) => (bits >>> 32) === 0L })
    // same words/bits under a different physical layout
    val bm2 = Index.bitmap(df.repartition(7), "cat", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(bm2 === bm.toSet)
    // disjoint values of one column never share a bit in any word
    bm.groupBy(_._2).values.foreach { ws =>
      val together = ws.map(_._3).reduce(_ | _)
      assert(java.lang.Long.bitCount(together) ===
        ws.map(t => java.lang.Long.bitCount(t._3)).sum)
    }
  }

  test("bitmapIntersect: AND-popcount equals the direct two-column count") {
    val df = (0L until 200L).map(i => (i, s"a${i % 4}", s"b${i % 5}"))
      .toDF("id", "x", "y")
    val got = Index.bitmapIntersect(
        Index.bitmap(df, "x", "id"), Index.bitmap(df, "y", "id"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val direct = df.groupBy("x", "y").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === direct)
  }

  test("phraseSearch: consecutive-only matches, overlap counting, k-word fold") {
    val docs = Seq(
      (1L, "hash join beats sort"),     // one match
      (2L, "join hash"),                // wrong order: no match
      (3L, "hash x join"),              // gap: no match
      (4L, "hash join hash join"),      // two matches
      (5L, "a a a")).toDF("doc_id", "text")
    def run(p: String*) = Index.phraseSearch(docs, "doc_id", "text", p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run("hash", "join") === Map(1L -> 1L, 4L -> 2L))
    // overlapping occurrences each count: "a a" in "a a a" matches twice
    assert(run("a", "a") === Map(5L -> 2L))
    // 3-word phrase folds two positional joins
    assert(run("hash", "join", "beats") === Map(1L -> 1L))
    // single word degrades to term lookup with occurrence counts
    assert(run("hash") === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }
}
