package graft

import graft.pipeline.Contamination

class ContaminationSpec extends SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b c d e f"),    // grams(3): "a b c" "b c d" "c d e" "d e f"
    (2L, "x y z q r"),      // nothing shared with the benchmark
    (3L, "p p a b c p p"))  // one shared gram "a b c" at token 2
    .toDF("doc_id", "text")
  private val bench = Seq(
    (100L, "a b c d z"),    // contributes "a b c" "b c d" "c d z"
    (101L, "d e f g"))      // contributes "d e f" "e f g"
    .toDF("doc_id", "text")

  test("overlaps counts distinct shared n-grams per (doc, bench) pair") {
    val got = Contamination.overlaps(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bench_id")) ->
        r.getAs[Long]("n_shared")).toMap
    assert(got === Map((1L, 100L) -> 2L, (1L, 101L) -> 1L, (3L, 100L) -> 1L))
  }

  test("taintedSpans merges overlapping tainted grams into maximal token spans") {
    val got = Contamination.taintedSpans(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tok_start"),
        r.getAs[Long]("tok_end"), r.getAs[Long]("n_grams"))).toSet
    // doc 1: tainted grams at p=0 ("a b c"), p=1 ("b c d"), p=3 ("d e f")
    // — p=3 is within gap n of p=1 (3-1 <= 3), spans [1,4) and [3,6)
    // overlap, so ALL THREE merge into one maximal span [0,6)
    // doc 3: single gram at p=2 → span [2,5)
    assert(got === Set((1L, 0L, 6L, 3L), (3L, 2L, 5L, 1L)))
  }

  test("taintedSpans splits runs separated by a gap wider than n") {
    val c = Seq((1L, "a b c z1 z2 z3 z4 a b c z5")).toDF("doc_id", "text")
    val b = Seq((9L, "a b c")).toDF("doc_id", "text")
    // tainted grams at p=0 and p=7; 7-0 > 3 → two disjoint spans
    val got = Contamination.taintedSpans(c, b, "doc_id", "text", n = 3)
      .collect().map(r => (r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"),
        r.getAs[Long]("n_grams"))).toSet
    assert(got === Set((0L, 3L, 1L), (7L, 10L, 1L)))
  }

  test("taintedBudget reports exact tainted-token volume per doc, zeros for clean") {
    val got = Contamination.taintedBudget(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("tainted_tokens"), r.getAs[Double]("tainted_frac")))).toMap
    assert(got === Map(
      1L -> ((6L, 1L, 6L, 1.0)),       // one merged span [0,6) covers all
      2L -> ((5L, 0L, 0L, 0.0)),       // clean doc still present
      3L -> ((7L, 1L, 3L, 3.0 / 7.0))))
  }

  test("taintedSpans matches brute-force interval merging on random corpora") {
    val rnd = new scala.util.Random(13)
    def randDoc() =
      (0 until 6 + rnd.nextInt(20)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString(" ")
    val corp = (1L to 15L).map(i => (i, randDoc()))
    val bset = (100L to 103L).map(i => (i, randDoc()))
    val n = 3
    val got = Contamination.taintedSpans(corp.toDF("doc_id", "text"),
        bset.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("tok_start"),
        r.getAs[Long]("tok_end"), r.getAs[Long]("n_grams"))).toSet
    def grams(s: String) = {
      val ws = s.split(" ")
      (0 to ws.length - n).map(p => p -> ws.slice(p, p + n).mkString(" "))
    }
    val benchGrams = bset.flatMap(d => grams(d._2).map(_._2)).toSet
    val expect = corp.flatMap { case (id, s) =>
      val tainted = grams(s).collect { case (p, g) if benchGrams(g) => p }
      tainted.foldLeft(List.empty[List[Int]]) {
        case (h :: t, p) if p - h.head <= n => (p :: h) :: t
        case (acc, p) => List(p) :: acc
      }.map(run => (id, run.min.toLong, run.max.toLong + n, run.size.toLong))
    }.toSet
    assert(got === expect)
  }
}
