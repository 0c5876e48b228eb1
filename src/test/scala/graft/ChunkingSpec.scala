package graft

import graft.pipeline.Chunking

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
}
