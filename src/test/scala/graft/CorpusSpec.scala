package graft

import graft.pipeline.Corpus

class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  // 12+ words with enough English stopwords to (a) win language ID and
  // (b) clear the 0.3 quality floor (word-count band + stopword ratio)
  private val good = "the quick fox and the lazy dog ran to the old barn again"

  test("clean: language filter, quality floor, exact dedup keep lowest id") {
    val docs = Seq(
      (1L, good),                           // keeper
      (2L, good),                           // exact duplicate → dropped (id 1 wins)
      (3L, "el la de y que en los perros"), // Spanish → dropped
      (4L, "!!! ??? ***"),                  // junk punctuation → dropped
      (5L, good + " extra"))                // near-dup but distinct digest → kept
      .toDF("doc_id", "text")
    val kept = Corpus.clean(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    assert(kept.keySet === Set(1L, 5L))
    assert(kept.values.toSet === Set("en"))
  }

  test("clean: dedup winner is deterministic regardless of row order") {
    val a = Corpus.clean(Seq((9L, good), (7L, good), (8L, good)).toDF("doc_id", "text"))
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    val b = Corpus.clean(Seq((8L, good), (9L, good), (7L, good)).toDF("doc_id", "text"))
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(a === Seq(7L) && b === Seq(7L))
  }

  test("clean: quality threshold is inclusive and tunable") {
    val docs = Seq((1L, good)).toDF("doc_id", "text")
    assert(Corpus.clean(docs, minQuality = 0.99).count() === 0)
    assert(Corpus.clean(docs, minQuality = 0.0).count() === 1)
  }
}
