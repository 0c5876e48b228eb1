package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Positional decontamination cut list: the maximal TOKEN spans of each
    * corpus document covered by at least one n-gram that also occurs in
    * the benchmark set — what a GPT-3-style 13-gram decontamination pass
    * actually removes (the span, not just the doc flag [[overlaps]]
    * gives). An n-gram at token position `p` (0-based) taints tokens
    * `[p, p+n)`; two tainted grams merge when their spans overlap or
    * touch (`p₂ − p₁ ≤ n` under the sort) — the classic interval merge,
    * here a lag-gap flag + running sum because every interval has the
    * same length. Returns `(doc_id, tok_start, tok_end, n_grams)`,
    * `tok_end` exclusive; spans in one document are disjoint.
    *
    * Scale shape: the benchmark gram set is eval-sized → broadcast; the
    * corpus side streams map-side through the semi join (no corpus
    * shuffle), and only the TAINTED positions — bounded by benchmark
    * coverage, not corpus size — reach the per-document window. All
    * integers → hash-exact across engines.
    */
  def taintedSpans(corpus: DataFrame, benchmark: DataFrame,
                   idCol: String, textCol: String, n: Int): DataFrame = {
    // positions survive the shingle null-filter unchanged: only TRAILING
    // entries are null (i > |ws| − n), so element k is the gram at token k
    val grams = corpus.select(col(idCol),
      posexplode(transform(Text.shingles(col(textCol), n), s => md5(s))))
      .select(col(idCol), col("pos").cast("long").as("p"), col("col").as("h"))
    val bench = benchmark
      .select(explode(array_distinct(
        transform(Text.shingles(col(textCol), n), s => md5(s)))).as("h"))
      .distinct()
    val w = Window.partitionBy(col(idCol)).orderBy(col("p"))
    grams.join(broadcast(bench), Seq("h"), "left_semi")
      .withColumn("gap", when(
        col("p") - lag(col("p"), 1).over(w) > n, 1L).otherwise(0L))
      .withColumn("run", sum(col("gap")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("run"))
      .agg(min(col("p")).as("tok_start"),
        (max(col("p")) + n).as("tok_end"), count(lit(1)).as("n_grams"))
      .select(col(idCol), col("tok_start"), col("tok_end"), col("n_grams"))
  }

  /** Per-document decontamination BUDGET: how many tokens the
    * [[taintedSpans]] cut list removes — `(doc_id, n_tokens, n_spans,
    * tainted_tokens, tainted_frac)`, one row per corpus document (clean
    * docs report zeros). Spans are disjoint, so the token sum is exact;
    * the fraction is one IEEE divide of two exact longs (replayable).
    */
  def taintedBudget(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, n: Int): DataFrame = {
    val cuts = taintedSpans(corpus, benchmark, idCol, textCol, n)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("tok_end") - col("tok_start")).as("tainted_tokens"))
    corpus.select(col(idCol),
        size(Text.words(col(textCol))).cast("long").as("n_tokens"))
      .join(cuts, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("tainted_tokens"), lit(0L)).as("tainted_tokens"),
        (coalesce(col("tainted_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("tainted_frac"))
  }
}
