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

  /** [[schema]] plus the corrupt-record audit column. Kept separate:
    * `_corrupt_record` must be declared in the read schema for PERMISSIVE
    * mode to populate it (Spark silently yields all-null rows otherwise),
    * but downstream reference-parity operators should not see it.
    */
  val schemaWithCorrupt: StructType =
    StructType(schema.fields :+ StructField("_corrupt_record", StringType))

  /** Corruption-tolerant read for real-world corpora — at 100 TB,
    * malformed lines are a certainty, and how they're handled is the
    * difference between a poisoned dataset and an audited one:
    *   - this reader (PERMISSIVE-equivalent): bad lines are split into a
    *     quarantine relation carrying the raw line, good rows parse on;
    *   - DROPMALFORMED: bad lines vanish silently (no audit trail — use
    *     only when the quarantine sink itself is the bottleneck);
    *   - FAILFAST: the job dies on the first bad line (CI / contract
    *     tests, never production ingest).
    * Returns `(good, quarantined)`. Implemented as ONE `text` scan +
    * `from_json` over [[schemaWithCorrupt]] (a malformed line yields a
    * struct whose `_corrupt_record` holds the raw text — a null STRUCT is
    * not guaranteed) rather than the JSON datasource's corrupt column:
    * Spark disallows datasource queries whose projection is the corrupt
    * column alone (the quarantine sink's exact shape) unless the parsed
    * relation is cached first — the text-scan split is a plain column
    * filter, no cache pinned, still a single pass.
    */
  def readWithQuarantine(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, from_json}
    val parsed = spark.read.text(path)
      .select(col("value"), from_json(col("value"), schemaWithCorrupt,
        java.util.Map.of("mode", "PERMISSIVE",
          "columnNameOfCorruptRecord", "_corrupt_record")).as("t"))
    (parsed.filter(col("t._corrupt_record").isNull)
      .select("t.*").drop("_corrupt_record"),
      parsed.filter(col("t._corrupt_record").isNotNull)
        .select(col("value").as("raw_line")))
  }
}
