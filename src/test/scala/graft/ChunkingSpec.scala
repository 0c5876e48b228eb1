package graft

import graft.pipeline.Chunking
import org.apache.spark.sql.functions.{col, md5}

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  test("chunk: overlapping windows with short tail; short doc → one chunk") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "x y")).toDF("doc_id", "text")
    val got = Chunking.chunk(docs, "doc_id", "text", window = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set(
      (1L, 0L, "a b c d"), (1L, 1L, "c d e f"), (1L, 2L, "e f g"), (1L, 3L, "g"),
      (2L, 0L, "x y")))
  }

  test("pack: cumulative word budget per group, docs may straddle the cut") {
    // group g: docs of 3, 4, 2, 6 words with budget 5
    // cum-before: 0, 3, 7, 9 → packs 0, 0, 1, 1
    val docs = Seq(
      (1L, "a a a", "g"), (2L, "b b b b", "g"), (3L, "c c", "g"), (4L, "d d d d d d", "g"),
      (9L, "z", "h")).toDF("doc_id", "text", "source")
    val got = Chunking.pack(docs, "doc_id", "text", "source", budget = 5)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 9L -> 0L))
  }

  test("contentDefined: chunks reassemble the document; chunk count and sizes are consistent") {
    val rnd = new scala.util.Random(5)
    val words = Vector.tabulate(400)(_ => s"w${rnd.nextInt(120)}")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = Chunking.contentDefined(docs, "doc_id", "text", mask = 8)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.map(_._2).sum === 400L)                 // word-preserving
    assert(got.map(_._1).toSeq === got.indices.map(_.toLong)) // dense idx
    assert(got.length > 10, s"mask=8 over 400 words should cut often, got ${got.length}")
  }

  test("contentDefined: a head insertion re-synchronizes — later chunk hashes survive") {
    val rnd = new scala.util.Random(17)
    val words = Vector.tabulate(300)(_ => s"t${rnd.nextInt(90)}")
    val original = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val shifted = Seq((1L, ("INSERTED0 INSERTED1 INSERTED2 " + words.mkString(" ")))).toDF("doc_id", "text")
    def hashes(df: org.apache.spark.sql.DataFrame) =
      Chunking.contentDefined(df, "doc_id", "text", mask = 8)
        .collect().map(_.getString(3)).toSet
    val a = hashes(original); val b = hashes(shifted)
    val survived = (a & b).size.toDouble / a.size
    assert(survived >= 0.8,
      s"CDC must keep most chunk hashes under a head insertion; survived=$survived")
    // the fixed-window baseline loses (nearly) everything under the same shift
    def fixedHashes(df: org.apache.spark.sql.DataFrame) =
      Chunking.chunk(df, "doc_id", "text", window = 8, stride = 8)
        .select(md5(col("chunk_text"))).collect().map(_.getString(0)).toSet
    val fa = fixedHashes(original); val fb = fixedHashes(shifted)
    assert((fa & fb).size.toDouble / fa.size <= 0.2)
  }

  test("contentDefined: boundary-free and single-word docs give one whole-doc chunk") {
    val docs = Seq((1L, "only"), (2L, "a b")).toDF("doc_id", "text")
    // mask so large no 4-hex-digit prefix can be ≡ 0 except pathologically
    val got = Chunking.contentDefined(docs, "doc_id", "text", mask = 70000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet === Set((1L, 0L, 1L), (2L, 0L, 2L)))
  }

  test("lengthBuckets: boundary word counts land in the fitting bucket; long docs clamp") {
    def doc(id: Long, n: Int) = (id, Seq.fill(n)("w").mkString(" "))
    // 16 fits the 16-bucket exactly; 17 spills to 32; 100 → 128; 5000 clamps
    val docs = Seq(doc(1, 1), doc(2, 16), doc(3, 17), doc(4, 100), doc(5, 5000))
      .toDF("doc_id", "text")
    val got = Chunking.lengthBuckets(docs, "doc_id", "text",
        minBucket = 16, maxBucket = 2048)
      .collect().map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_tokens"),
          r.getAs[Long]("padded_tokens"), r.getAs[Double]("waste_frac")))).toMap
    assert(got === Map(
      16L -> ((2L, 17L, 32L, 15.0 / 32.0)),
      32L -> ((1L, 17L, 32L, 15.0 / 32.0)),
      128L -> ((1L, 100L, 128L, 28.0 / 128.0)),
      // the 5000-word doc truncates to the 2048 cap: zero padding waste
      2048L -> ((1L, 2048L, 2048L, 0.0))))
  }
}
