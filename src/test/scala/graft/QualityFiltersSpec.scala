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

  test("quality classifier: md5-derived reference scores, repartition-invariant") {
    import graft.pipeline.QualityClassifier
    def bucket(tok: String, b: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % b
    }
    def weight(bk: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"w:$bk".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(2), 16) % 16) - 8
    }
    val docs = Seq((1L, "hello world"), (2L, "one two three")).toDF("doc_id", "text")
    val got = QualityClassifier.score(docs, buckets = 4096)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("w_sum"), r.getAs[Long]("n_features"), r.getAs[Double]("score"))))
      .toMap
    // doc 1 features: hello, world, "hello world" (unigrams + bigram)
    val f1 = Seq("hello", "world", "hello world").map(t => weight(bucket(t, 4096)))
    assert(got(1L) === ((f1.sum, 3L, f1.sum.toDouble / 3.0)))
    val f2 = Seq("one", "two", "three", "one two", "two three").map(t => weight(bucket(t, 4096)))
    assert(got(2L) === ((f2.sum, 5L, f2.sum.toDouble / 5.0)))
    // distributed determinism: same verdicts under any partitioning
    val a = QualityClassifier.score(docs, buckets = 4096).collect().toSet
    val b = QualityClassifier.score(docs.repartition(7), buckets = 4096).collect().toSet
    assert(a === b)
  }
}
