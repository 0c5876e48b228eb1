package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composite corpus cleaning — the C4-style filter chain every LLM
  * training-data pipeline runs before tokenization: language ID → quality
  * floor → exact dedup, composed from the [[Text]] and [[Dedup]]
  * primitives so each stage keeps its per-stage contract.
  *
  * Scale shape: language and quality are pure per-row Catalyst expressions
  * (stream through the scan, no shuffle); the only shuffle is the dedup's
  * groupBy over 32-byte md5 digests of the SURVIVORS — filtering first
  * means the dedup shuffle sees only post-filter rows, and documents
  * themselves never ride it. Winner per digest is min(doc_id) —
  * deterministic under retries and partitioning.
  */
object Corpus {

  /** Surviving `(doc_id, lang, quality)` after the chain. Defaults target
    * an English corpus with a permissive quality floor; both knobs are
    * per-run policy.
    */
  def clean(docs: DataFrame, lang: String = "en",
            minQuality: Double = 0.3): DataFrame = {
    val scored = docs.select(col("doc_id"), col("text"),
      Text.langPredict(Text.langEvidence(col("text"))).as("lang"),
      Text.qualityScore(col("text")).as("quality"))
    val filtered = scored.filter(col("lang") === lang && col("quality") >= minQuality)
    val keep = filtered.select(col("doc_id"), md5(col("text")).as("digest"))
      .groupBy("digest").agg(min("doc_id").as("doc_id"))
    filtered.join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id", "lang", "quality")
  }
}
