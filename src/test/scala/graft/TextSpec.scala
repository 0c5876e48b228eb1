package graft

import graft.pipeline.Text
import org.apache.spark.sql.functions._

class TextSpec extends SparkTestBase {
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("shingles: n=3 over words") {
    val df = Seq(Tuple1("a b c d e")).toDF("text")
    // Spark materializes array columns as collection.Seq (mutable.ArraySeq)
    val sh = one[collection.Seq[String]](df.select(Text.shingles(col("text"), 3)))
    assert(sh.toSeq === Seq("a b c", "b c d", "c d e"))
    val short = one[collection.Seq[String]](Seq(Tuple1("a b")).toDF("text").select(Text.shingles(col("text"), 3)))
    assert(short.toSeq === Seq.empty)
  }

  test("charPairs: sliding 2-char windows; degenerate words empty") {
    val df = Seq(Tuple1("fox")).toDF("w")
    assert(one[collection.Seq[String]](df.select(Text.charPairs(col("w")))).toSeq
      === Seq("fo", "ox"))
    assert(one[collection.Seq[String]](Seq(Tuple1("ab")).toDF("w")
      .select(Text.charPairs(col("w")))).toSeq === Seq("ab"))
    assert(one[collection.Seq[String]](Seq(Tuple1("x")).toDF("w")
      .select(Text.charPairs(col("w")))).toSeq === Seq.empty)
    assert(one[collection.Seq[String]](Seq(Tuple1("")).toDF("w")
      .select(Text.charPairs(col("w")))).toSeq === Seq.empty)
  }

  test("token count: alpha runs, digit runs, single punct") {
    val df = Seq(Tuple1("Hello, world! x2")).toDF("text")
    // tokens: Hello , world ! x 2
    assert(one[Long](df.select(Text.tokenCount(col("text")))) === 6L)
  }

  test("lang predict: deterministic argmax with list-order tie-break") {
    val en = one[String](Seq(Tuple1("the cat and the dog of a house")).toDF("text")
      .select(Text.langPredict(Text.langEvidence(col("text")))))
    assert(en === "en")
    val de = one[String](Seq(Tuple1("der hund und die katze und das haus")).toDF("text")
      .select(Text.langPredict(Text.langEvidence(col("text")))))
    assert(de === "de")
    // no stopwords at all → all counts 0 → first language wins
    val tie = one[String](Seq(Tuple1("xyzzy qwerty")).toDF("text")
      .select(Text.langPredict(Text.langEvidence(col("text")))))
    assert(tie === "en")
  }

  test("quality score ingredients are exact ratios") {
    val df = Seq(Tuple1("the dog runs")).toDF("text")
    assert(one[Long](df.select(Text.nWords(col("text")))) === 3L)
    assert(one[Double](df.select(Text.stopwordRatio(col("text")))) === 1.0 / 3.0)
    assert(one[Double](df.select(Text.punctRatio(col("text")))) === 0.0)
    assert(one[Double](df.select(Text.meanWordLen(col("text")))) === 10.0 / 3.0)
  }

  test("fingerprint: k smallest shingle hashes, stable") {
    val df = Seq(Tuple1("a b c d e f g h")).toDF("text")
    val fp1 = one[String](df.select(Text.fingerprint(col("text"))))
    val fp2 = one[String](df.select(Text.fingerprint(col("text"))))
    assert(fp1 === fp2)
    assert(fp1.split(",").length === 5)
    assert(fp1.split(",").toList === fp1.split(",").toList.sorted)
  }
}
