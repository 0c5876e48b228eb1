package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: find training documents that share
  * n-gram shingles with an evaluation/benchmark set (the standard
  * decontamination step of public LLM recipes — GPT-3 used 13-gram
  * overlap, Llama 2 n-gram token overlap; the n is a parameter here).
  *
  * Scale shape: both sides shingle → md5 (the 32-char digest rides the
  * shuffle, never the text) → distinct per doc → equi-join on the digest.
  * The benchmark side is tiny by construction (eval sets are thousands of
  * docs, the corpus is billions), so Spark broadcasts it and the corpus
  * side streams map-side with no corpus shuffle at all; worst-case skew
  * from a ubiquitous shingle is bounded by the benchmark's occurrence
  * count of that shingle, not the corpus's.
  */
object Contamination {

  /** Pairs `(doc_id, bench_id, n_shared)` — the number of DISTINCT
    * n-word shingles document `doc_id` of `corpus` shares with document
    * `bench_id` of `benchmark`. Pairs sharing nothing are absent; filter
    * `n_shared >= k` for a contamination threshold.
    */
  def overlaps(corpus: DataFrame, benchmark: DataFrame,
               idCol: String, textCol: String, n: Int): DataFrame = {
    def hashed(df: DataFrame, out: String) = df.select(col(idCol).as(out),
      explode(array_distinct(transform(Text.shingles(col(textCol), n), s => md5(s)))).as("h"))
    hashed(corpus, "doc_id")
      .join(broadcast(hashed(benchmark, "bench_id")), "h")
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_shared"))
  }
}
