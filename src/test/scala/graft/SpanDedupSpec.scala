package graft

import graft.pipeline.SpanDedup

class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d"),       // spans: "a b", "c d"
    (2L, "a b x y"),       // "a b" repeats doc 1 → dropped here
    (3L, "c d c d"))       // "c d" repeats doc 1; the SECOND "c d" within
                           // the doc is also a repeat of the first corpus
                           // occurrence → both dropped
    .toDF("doc_id", "text")

  test("keepFirst keeps only the first corpus occurrence of each span") {
    val got = SpanDedup.keepFirst(docs, "doc_id", "text", span = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_kept")))).toMap
    assert(got === Map(1L -> ((2L, 2L)), 2L -> ((2L, 1L)), 3L -> ((2L, 0L))))
  }

  test("kept_frac is the exact integer ratio") {
    val fracs = SpanDedup.keepFirst(docs, "doc_id", "text", span = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("kept_frac"))
      .toMap
    assert(fracs(2L) === 0.5 && fracs(3L) === 0.0)
  }

  test("first occurrence is by (doc_id, span_idx) order, not partition order") {
    // doc 1's span_idx 0 and doc 2's span_idx 0 tie on doc order → doc 1 wins
    val spans = SpanDedup.spans(docs, "doc_id", "text", span = 2)
      .where($"span_text" === "a b").orderBy("doc_id").collect()
    assert(spans.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
  }

  test("tail spans shorter than the span width still participate") {
    val d = Seq((1L, "a b c"), (2L, "c")).toDF("doc_id", "text")
    // doc 1: "a b", "c"; doc 2: "c" is a repeat
    val got = SpanDedup.keepFirst(d, "doc_id", "text", span = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_kept")).toMap
    assert(got === Map(1L -> 2L, 2L -> 0L))
  }

  test("boilerplate reports spans in >= minDocs distinct docs with occurrence counts") {
    val d = Seq(
      (1L, "x y z a b c"),
      (2L, "x y z d e f"),
      (3L, "x y z x y z"))  // two occurrences in one doc count once for n_docs
      .toDF("doc_id", "text")
    val got = SpanDedup.boilerplate(d, "doc_id", "text", span = 3, minDocs = 2)
      .collect().map(r => (r.getAs[String]("span_text"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_occurrences")))
    assert(got.toSet === Set(("x y z", 3L, 4L)))
  }

  test("dupSubstrings: aligned-window anchors flag only cross-document repeats") {
    val d = Seq(
      (1L, "abcdefgh"), // windows "abcd" "cdef" "efgh"
      (2L, "abcdxxxx"), // "abcd" shared with doc 1; "cdxx" "xxxx" unique
      (3L, "zz"),       // shorter than the window → absent from output
      (4L, "xyxyxy"))   // "xyxy" twice WITHIN one doc — not a cross-doc dup
      .toDF("doc_id", "text")
    val got = SpanDedup.dupSubstrings(d, "doc_id", "text", window = 4, stride = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("dup_windows"),
          r.getAs[Double]("dup_frac")))).toMap
    assert(got === Map(
      1L -> ((3L, 1L, 1.0 / 3.0)),
      2L -> ((3L, 1L, 1.0 / 3.0)),
      4L -> ((2L, 0L, 0.0))))
  }

  test("dupRuns coalesces consecutive duplicated anchors into maximal char intervals") {
    val d = Seq(
      (1L, "abcdefghij"), // windows at 0,2,4,6: abcd cdef efgh ghij
      (2L, "abcdefxxxx"), // shares abcd(0) and cdef(2) with doc 1 → one run
      (3L, "ghijzzzzzz")) // shares ghij(0) with doc 1 → isolated run
      .toDF("doc_id", "text")
    val got = SpanDedup.dupRuns(d, "doc_id", "text", window = 4, stride = 2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("run_start"),
        r.getAs[Long]("run_end"), r.getAs[Long]("n_windows"))).toSet
    assert(got === Set(
      (1L, 0L, 6L, 2L),   // abcd+cdef merge: chars [0,6)
      (1L, 6L, 10L, 1L),  // ghij alone: [6,10) — gap at efgh keeps it separate
      (2L, 0L, 6L, 2L),
      (3L, 0L, 4L, 1L)))
  }

  test("dupRunStats: runs are disjoint so cut/kept char sums are exact") {
    val d = Seq(
      (1L, "abcdefghij"),
      (2L, "abcdefxxxx"),
      (3L, "ghijzzzzzz"),
      (4L, "qq"))         // shorter than window → zero windows, zero cuts
      .toDF("doc_id", "text")
    val got = SpanDedup.dupRunStats(d, "doc_id", "text", window = 4, stride = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chars"), r.getAs[Long]("n_runs"),
          r.getAs[Long]("cut_chars"), r.getAs[Long]("kept_chars")))).toMap
    assert(got === Map(
      1L -> ((10L, 2L, 10L, 0L)),  // [0,6) + [6,10) — whole doc duplicated
      2L -> ((10L, 1L, 6L, 4L)),
      3L -> ((10L, 1L, 4L, 6L)),
      4L -> ((2L, 0L, 0L, 2L))))
  }

  test("dupRuns matches brute-force interval coalescing on random corpora") {
    val rnd = new scala.util.Random(11)
    val corpus = (1L to 12L).map(i =>
      (i, (0 until 10 + rnd.nextInt(30)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString))
    val (window, stride) = (5, 2)
    val got = SpanDedup.dupRuns(corpus.toDF("doc_id", "text"),
        "doc_id", "text", window, stride)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("run_start"),
        r.getAs[Long]("run_end"), r.getAs[Long]("n_windows"))).toSet
    val wins = corpus.flatMap { case (id, s) =>
      (0 to (s.length - window) / stride)
        .map(i => (id, i, s.substring(i * stride, i * stride + window)))
    }
    val dupSet = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size > 1).keySet
    val expect = wins.filter(w => dupSet(w._3)).groupBy(_._1).toSeq.flatMap {
      case (id, ws) =>
        // split sorted anchor indices into consecutive islands
        ws.map(_._2).sorted.foldLeft(List.empty[List[Int]]) {
          case (acc @ (h :: t), i) if h.head == i - 1 => (i :: h) :: t
          case (acc, i) => List(i) :: acc
        }.map(run => (id, run.min.toLong * stride,
          run.max.toLong * stride + window, run.size.toLong))
    }.toSet
    assert(got === expect)
  }

  test("cutRuns rebuilds text from gaps; whole-doc dup yields empty, not original") {
    // window=4, stride=2 → anchors i=0..3 at chars 2i. Anchor texts:
    //   doc1 "abcdefghij": abcd cdef efgh ghij
    //   doc2 "abcdefXXXX": abcd cdef efXX XXXX
    //   doc3 "ZZghijZZZZ": ZZgh ghij ijZZ ZZZZ
    //   doc5 "XXghijXXXX": XXgh ghij ijXX XXXX
    // cross-doc dups: abcd,cdef {1,2}; ghij {1,3,5}; XXXX {2,5}
    val d = Seq(
      (1L, "abcdefghij"), // dup anchors i=0,1,3 → runs [0,6),[6,10): all cut
      (2L, "abcdefXXXX"), // dup anchors i=0,1,3 → all cut
      (3L, "ZZghijZZZZ"), // dup anchor i=1 → run [2,6): keeps "ZZ"+"ZZZZ"
      (4L, "qq"),         // shorter than window → unchanged
      (5L, "XXghijXXXX")) // dup anchors i=1,3 → runs [2,6),[6,10): keeps "XX"
      .toDF("doc_id", "text")
    val got = SpanDedup.cutRuns(d, "doc_id", "text", window = 4, stride = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_runs")))).toMap
    assert(got === Map(
      1L -> (("", 2L)),
      2L -> (("", 2L)),
      3L -> (("ZZZZZZ", 1L)),
      4L -> (("qq", 0L)),
      5L -> (("XX", 2L))))
  }

  test("cutRuns matches brute-force gap reconstruction on random corpora") {
    val rnd = new scala.util.Random(17)
    val corpus = (1L to 12L).map(i =>
      (i, (0 until 10 + rnd.nextInt(30)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString))
    val (window, stride) = (5, 2)
    val got = SpanDedup.cutRuns(corpus.toDF("doc_id", "text"),
        "doc_id", "text", window, stride)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_runs")))).toMap
    val wins = corpus.flatMap { case (id, s) =>
      (0 to (s.length - window) / stride)
        .map(i => (id, i, s.substring(i * stride, i * stride + window)))
    }
    val dupSet = wins.groupBy(_._3).filter(_._2.map(_._1).distinct.size > 1).keySet
    val runsByDoc = wins.filter(w => dupSet(w._3)).groupBy(_._1).view.mapValues { ws =>
      ws.map(_._2).sorted.foldLeft(List.empty[List[Int]]) {
        case (acc @ (h :: t), i) if h.head == i - 1 => (i :: h) :: t
        case (acc, i) => List(i) :: acc
      }.map(run => (run.min * stride, run.max * stride + window))
    }.toMap
    // window=5 > 2·stride=4 → runs may OVERLAP in char space; the brute
    // force cuts the interval UNION (cursor = max(cursor, run end))
    val expect = corpus.map { case (id, s) =>
      val runs = runsByDoc.getOrElse(id, Nil).sortBy(_._1)
      val kept = new StringBuilder
      var cursor = 0
      runs.foreach { case (rs, re) =>
        if (rs > cursor) kept ++= s.substring(cursor, rs)
        cursor = math.max(cursor, re)
      }
      kept ++= s.substring(cursor)
      id -> ((kept.toString, runs.size.toLong))
    }.toMap
    assert(got === expect)
    // dupRunStats measures the same union: kept_chars == |clean_text|
    val stats = SpanDedup.dupRunStats(corpus.toDF("doc_id", "text"),
        "doc_id", "text", window, stride)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chars"), r.getAs[Long]("n_runs"),
          r.getAs[Long]("cut_chars"), r.getAs[Long]("kept_chars")))).toMap
    val statsExpect = corpus.map { case (id, s) =>
      val (clean, nRuns) = expect(id)
      id -> ((s.length.toLong, nRuns,
        (s.length - clean.length).toLong, clean.length.toLong))
    }.toMap
    assert(stats === statsExpect)
  }

  test("crossSourceOverlap counts distinct shared keys once per unordered source pair") {
    import graft.pipeline.Dedup
    val units = Seq(
      ("k1", "A"), ("k1", "B"), ("k1", "C"), // k1 shared by all three
      ("k2", "A"), ("k2", "B"), ("k2", "B"), // duplicate (k2,B) row counts once
      ("k3", "C"))                           // single-source key contributes nothing
      .toDF("k", "src")
    val got = Dedup.crossSourceOverlap(units, "k", "src").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("A", "B") -> 2L, ("A", "C") -> 1L, ("B", "C") -> 1L))
    // whole-document wrapper: identical texts across sources
    val docs = Seq((1L, "same text", "A"), (2L, "same text", "B"), (3L, "other", "A"))
      .toDF("doc_id", "text", "source")
    val dd = Dedup.crossSourceDups(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(dd === Map(("A", "B") -> 1L))
  }

  test("dupSubstrings matches brute-force window comparison on random corpora") {
    val rnd = new scala.util.Random(7)
    // small alphabet forces genuine collisions
    val corpus = (1L to 12L).map(i =>
      (i, (0 until 10 + rnd.nextInt(30)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString))
    val (window, stride) = (5, 2)
    val got = SpanDedup.dupSubstrings(corpus.toDF("doc_id", "text"),
        "doc_id", "text", window, stride)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("dup_windows")))).toMap
    val wins = corpus.flatMap { case (id, s) =>
      (0 to (s.length - window) / stride).map(i => id -> s.substring(i * stride, i * stride + window))
    }
    val dupSet = wins.groupBy(_._2).filter(_._2.map(_._1).distinct.size > 1).keySet
    val expect = wins.groupBy(_._1).view.mapValues(ws =>
      (ws.size.toLong, ws.count(w => dupSet(w._2)).toLong)).toMap
    assert(got === expect)
  }

  test("dedupWithinDoc keeps first occurrence of each span, reassembles in order") {
    import graft.pipeline.SpanDedup
    // span=2: doc 1 repeats "a b" twice and "c d" once; doc 2 has no repeats
    val docs = Seq(
      (1L, "a b c d a b e f c d"),
      (2L, "x y z w")).toDF("doc_id", "text")
    val got = SpanDedup.dedupWithinDoc(docs, span = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("n_spans_dropped")))).toMap
    assert(got(1L) === (("a b c d e f", 5L, 2L)))
    assert(got(2L) === (("x y z w", 2L, 0L)))
    // ragged tail: last span shorter than the width still round-trips
    val ragged = Seq((3L, "p q r")).toDF("doc_id", "text")
    val g3 = SpanDedup.dedupWithinDoc(ragged, span = 2).collect().head
    assert(g3.getAs[String]("clean_text") === "p q r")
    assert(g3.getAs[Long]("n_spans") === 2L)
  }
}
