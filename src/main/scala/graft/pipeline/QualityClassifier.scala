package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed linear document-quality classifier — the fastText-shaped
  * inference step public LLM data recipes run over every crawled page
  * (CCNet / Llama's Wikipedia-reference classifier, GPT-3's WebText
  * quality model): featurize a document as hashed unigrams + bigrams,
  * average a weight per feature bucket, threshold the score.
  *
  * Scale shape — the part that matters at 100 TB: the model is a
  * BROADCAST weight table (buckets ≪ corpus), so scoring is a map-side
  * hash-join probe plus ONE per-doc aggregate; the corpus never
  * shuffles except by doc id for the sum. No UDF anywhere — hashing is
  * codegen'd `md5`/`conv`, the join is Spark's broadcast hash join, and
  * the score is a ratio of exact integers (deterministic double, DuckDB
  * replays it bit-for-bit).
  *
  * The weight VALUES here are md5-derived stand-ins in [-8, 7] — the
  * zero-dependency deterministic choice; a production run would load a
  * trained vector into the same `(bucket, w)` table and change nothing
  * else about the plan.
  */
object QualityClassifier {

  /** Hashed feature multiset `(id, bucket)`: word unigrams + bigrams
    * (repeats kept — a linear bag-of-words scorer counts multiplicity),
    * bucket = first 60 bits of md5(token) mod `buckets`.
    */
  def features(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text", buckets: Int = 4096): DataFrame = {
    val toks = concat(Text.words(col(textCol)), Text.shingles(col(textCol), 2))
    docs.select(col(idCol).as("id"), explode(toks).as("tok"))
      .select(col("id"),
        pmod(conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"),
          lit(buckets.toLong)).as("bucket"))
  }

  /** The `(bucket, w)` weight table, w ∈ [-8, 7] md5-derived. */
  def weights(spark: SparkSession, buckets: Int = 4096): DataFrame =
    spark.range(buckets.toLong).select(col("id").as("bucket"),
      ((conv(substring(md5(concat(lit("w:"), col("id").cast("string"))), 1, 2), 16, 10)
        .cast("long") % 16L) - 8L).as("w"))

  /** Per-doc score + keep verdict: `(doc_id, w_sum, n_features, score,
    * keep)`. Documents with no features (no text) emit no row, matching
    * the join-then-aggregate contract.
    */
  def score(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
            buckets: Int = 4096, threshold: Double = 0.0): DataFrame = {
    val spark = docs.sparkSession
    features(docs, idCol, textCol, buckets)
      .join(broadcast(weights(spark, buckets)), "bucket")
      .groupBy(col("id"))
      .agg(sum(col("w")).as("w_sum"), count(lit(1)).as("n_features"))
      .select(col("id").as(idCol), col("w_sum"), col("n_features"),
        (col("w_sum").cast("double") / col("n_features").cast("double")).as("score"))
      .withColumn("keep", col("score") >= threshold)
  }
}
