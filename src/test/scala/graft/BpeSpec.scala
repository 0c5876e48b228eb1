package graft

import graft.pipeline.Bpe

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("one round merges the argmax pair greedily, leftmost non-overlapping") {
    val docs = Seq((1L, "aaaa bc")).toDF("doc_id", "text")
    // top pair (a,a) ×3; "aaaa" → [aa, aa]; runs of matches collapse by parity
    val got = Bpe.trainRound(docs, "doc_id", "text", rounds = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("cnt"))
      .toMap
    assert(got === Map(("aa", "aa") -> 1L, ("b", "c") -> 1L))
  }

  test("odd-length runs leave the trailing token unmerged (true BPE greedy)") {
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    // each "aaa" → [aa, a]
    val got = Bpe.trainRound(docs, "doc_id", "text", rounds = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("cnt"))
      .toMap
    assert(got === Map(("aa", "a") -> 2L))
  }

  test("non-adjacent matches all merge (abab → [ab, ab])") {
    val docs = Seq((1L, "abab abab ax")).toDF("doc_id", "text")
    // (a,b) ×4 beats (b,a) ×2 and (a,x) ×1
    val got = Bpe.trainRound(docs, "doc_id", "text", rounds = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("cnt"))
      .toMap
    assert(got === Map(("ab", "ab") -> 2L, ("a", "x") -> 1L))
  }

  test("two rounds compose: the second argmax is taken on merged tokens") {
    val docs = Seq((1L, "abc abc abc")).toDF("doc_id", "text")
    // round 1: (a,b) ×3 ties (b,c) ×3 → lexicographic (a,b); words → [ab, c]
    // round 2: (ab, c) ×3 → words → [abc]; no pairs remain
    val got = Bpe.trainRound(docs, "doc_id", "text", rounds = 2).collect()
    assert(got.isEmpty)
  }
}
