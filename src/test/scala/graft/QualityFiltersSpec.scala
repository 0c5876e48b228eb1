package graft

import graft.pipeline.QualityFilters
import org.apache.spark.sql.functions._

class QualityFiltersSpec extends SparkTestBase {
  import spark.implicits._

  test("dupWordRatio: exact integer-ratio semantics") {
    val df = Seq((1L, "a b c d"), (2L, "a a a b"), (3L, "x x x x")).toDF("doc_id", "text")
    val got = df.select($"doc_id", QualityFilters.dupWordRatio($"text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 0.0, 2L -> 0.5, 3L -> 0.75))
  }

  test("topNgram: most frequent 2-gram, lexicographic tie-break, coverage fraction") {
    val df = Seq(
      // "b c" appears twice (4 of 6 words covered → 2*2/6)
      (1L, "a b c b c d"),
      // all 2-grams distinct → tie on count=1 → smallest shingle "a b" wins
      (2L, "c a b d"),
      // shorter than n → absent from output
      (3L, "solo")).toDF("doc_id", "text")
    val got = df.transform(QualityFilters.topNgram(_, "text", 2))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSet === Set((1L, "b c", 4.0 / 6.0), (2L, "a b", 0.5)))
  }

  test("gopher battery: keep iff no rule fails; reasons sorted") {
    // 26 distinct words (2 stopwords, 12×5-char, 12×4-char → mean 112/26
    // ≈ 4.31 ∈ [4.0, 4.6]), zero duplication → passes every rule
    val good = "the a table value merge batch query scans joins group parts " +
      "hashs sorts lines part hash sort line scan join fast slow data rows cols keys"
    val shortDoc = "tiny doc the a"                         // word_count fails (and more)
    val df = Seq((1L, good), (2L, shortDoc)).toDF("doc_id", "text")
    val got = df.select($"doc_id",
        QualityFilters.keep($"text").as("keep"),
        QualityFilters.failReasons($"text").as("reasons"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(got(1L)._1, s"expected keep, reasons=${got(1L)._2}")
    assert(got(1L)._2 === "")
    assert(!got(2L)._1)
    // reasons comma-joined in sorted order, word_count among them
    val rs = got(2L)._2.split(",").toSeq
    assert(rs.contains("word_count") && rs === rs.sorted)
  }
}
