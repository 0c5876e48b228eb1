package graft

import graft.ops.Normalize
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private def norm(tags: Seq[String]): Seq[String] =
    Seq(Tuple1(tags)).toDF("hts")
      .select(Normalize.normalizeTags(col("hts")).as("n"))
      .collect().head.getSeq[String](0).toList

  test("lowercase + de-accent + dedup + sort") {
    assert(norm(Seq("Spärk", "BIGDATA", "spark", "bigdata")) === Seq("bigdata", "spark"))
  }

  test("full accent map translates char-for-char") {
    assert(norm(Seq("áäčďéěíĺľňóôŕšťúùůýž")) === Seq("aacdeeillnoorstuuuyz"))
    assert(norm(Seq("ãöü")) === Seq("aou"))
  }

  test("reference quirk: empty array round-trips to [\"\"]") {
    assert(norm(Seq.empty) === Seq(""))
  }

  test("elementwise variant keeps [] → []") {
    val r = Seq(Tuple1(Seq.empty[String])).toDF("hts")
      .select(Normalize.normalizeTagsElementwise(col("hts")).as("n"))
      .collect().head.getSeq[String](0)
    assert(r.isEmpty)
  }

  test("normalization is idempotent") {
    val once = norm(Seq("Ünïcode", "Spärk", "Spärk"))
    assert(norm(once) === once)
  }

  test("stringify matches the reference's '[a,b]' format") {
    val s = Seq(Tuple1(Seq("a", "b"))).toDF("x")
      .select(Normalize.stringifyArray(col("x"))).collect().head.getString(0)
    assert(s === "[a,b]")
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("x")
      .select(Normalize.stringifyArray(col("x"))).collect().head.getString(0)
    assert(empty === "[]")
  }
}
