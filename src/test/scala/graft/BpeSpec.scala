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

  // ------------------------------------------------------------- encode

  private val engMerges = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
    "e" -> "r", "an" -> "d", "o" -> "u", "r" -> "e")

  private def tokens(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Seq[String]] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sortBy(_._1).map(_._2).toSeq }

  test("encode: rules apply in rank order, exhaustively per rule") {
    val docs = Seq((1L, "the other and tin")).toDF("doc_id", "text")
    val got = tokens(Bpe.encode(docs, "doc_id", "text", engMerges))
    // "the":  t,h,e → th,e (r0) → the (r1)
    // "other": o,t,h,e,r → o,th,e,r (r0) → o,the,r (r1) — e consumed, r4 moot
    // "and":  a,n,d → an,d (r3) → and (r5)
    // "tin":  t,i,n → t,in (r2); (t,h) never matches
    assert(got === Map(
      (1L, 0L) -> Seq("the"), (1L, 1L) -> Seq("o", "the", "r"),
      (1L, 2L) -> Seq("and"), (1L, 3L) -> Seq("t", "in")))
  }

  test("encode: surrogate-pair code points are single tokens") {
    val docs = Seq((1L, "a😀b")).toDF("doc_id", "text")
    val got = tokens(Bpe.encode(docs, "doc_id", "text", engMerges))
    assert(got === Map((1L, 0L) -> Seq("a", "😀", "b")))
  }

  test("validateMerges rejects an operand no earlier rule forms") {
    intercept[IllegalArgumentException] {
      Bpe.validateMerges(Seq("ab" -> "c"))
    }
    Bpe.validateMerges(Seq("a" -> "b", "ab" -> "c")) // valid — no throw
  }

  test("encode (codegen priority) ≡ encodeByPlan (sequential projections) on random valid tables") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcd"
    for (trial <- 1 to 5) {
      // grow a VALID table: operands sampled from formed ∪ alphabet
      var formed = alphabet.map(_.toString).toVector
      val merges = (1 to 6).map { _ =>
        val a = formed(rnd.nextInt(formed.size))
        val b = formed(rnd.nextInt(formed.size))
        formed :+= a + b
        a -> b
      }
      val docs = (1L to 40L).map { i =>
        val w = (1 to 1 + rnd.nextInt(10)).map(_ => alphabet(rnd.nextInt(4))).mkString
        (i, w)
      }.toDF("doc_id", "text")
      val fast = tokens(Bpe.encode(docs, "doc_id", "text", merges))
      val slow = tokens(Bpe.encodeByPlan(docs, "doc_id", "text", merges))
      assert(fast === slow, s"trial $trial diverged on table $merges")
    }
  }
}
