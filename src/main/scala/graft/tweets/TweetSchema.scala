package graft.tweets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Explicit schema for the tweet corpus.
  *
  * The reference infers the schema on read
  * (`RetweetTagsJaccardGraph.py:33`, `bigdata/__init__.py:85`), which
  * costs a full extra pass over the corpus — a non-starter at 100 TB.
  * The fields below are exactly those the reference code touches
  * (SURVEY.md §1.1); `inferSchema = true` remains as an escape hatch for
  * exploratory use.
  */
object TweetSchema {
  private val hashtagEntities =
    ArrayType(StructType(Seq(StructField("text", StringType))))

  val schema: StructType = StructType(Seq(
    StructField("user", StructType(Seq(StructField("id", LongType)))),
    StructField("text", StringType),
    StructField("hashtagEntities", hashtagEntities),
    StructField("hashtagEntitiesArray", ArrayType(StringType)),
    StructField("retweeted_status", StructType(Seq(
      StructField("user", StructType(Seq(StructField("id", LongType)))),
      StructField("text", StringType),
      StructField("hashtagEntities", hashtagEntities),
      StructField("hashtagEntitiesArray", ArrayType(StringType)))))
  ))

  /** JSON-lines tweet source (reference S1). Explicit schema keeps the scan
    * single-pass and enables nested-schema pruning.
    */
  def read(spark: SparkSession, path: String, inferSchema: Boolean = false): DataFrame =
    if (inferSchema) spark.read.json(path)
    else spark.read.schema(schema).json(path)
}
