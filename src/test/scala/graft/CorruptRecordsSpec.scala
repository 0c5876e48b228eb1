package graft

import graft.tweets.TweetSchema
import java.nio.file.Files

/** Malformed-line handling on the JSON-lines tweet source — the parser
  * modes that decide whether a 100 TB ingest is audited, silently
  * truncated, or dead on arrival.
  */
class CorruptRecordsSpec extends SparkTestBase {

  private def fixture(): String = {
    val dir = Files.createTempDirectory("graft_corrupt").toFile
    val f = new java.io.File(dir, "tweets.jsonl")
    val good1 = """{"user":{"id":1},"text":"ok","hashtagEntitiesArray":["a"]}"""
    val bad = """{"user":{"id":2},"text":"truncated..."""
    val good2 = """{"user":{"id":3},"text":"also ok"}"""
    Files.writeString(f.toPath, Seq(good1, bad, good2).mkString("\n"))
    f.getPath
  }

  test("readWithQuarantine splits good rows from quarantined raw lines") {
    val (good, quarantined) = TweetSchema.readWithQuarantine(spark, fixture())
    assert(good.select("user.id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
    assert(!good.columns.contains("_corrupt_record"))
    val lines = quarantined.collect().map(_.getString(0))
    assert(lines.length === 1 && lines.head.contains("truncated"))
  }

  test("DROPMALFORMED silently drops the bad line") {
    val df = spark.read.schema(TweetSchema.schema)
      .option("mode", "DROPMALFORMED").json(fixture())
    assert(df.count() === 2L)
  }

  test("FAILFAST throws on the first bad line") {
    val df = spark.read.schema(TweetSchema.schema)
      .option("mode", "FAILFAST").json(fixture())
    intercept[org.apache.spark.SparkException] { df.collect() }
  }
}
