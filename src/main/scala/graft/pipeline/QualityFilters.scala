package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher/C4-style document-quality filters — the rule battery an LLM
  * training corpus runs before tokenization (repetition, length, and
  * lexical-shape gates; cf. Rae et al. 2021 "Scaling Language Models"
  * §A1.1 and Raffel et al. 2020 C4 heuristics, both public).
  *
  * Everything except [[topNgram]] is a pure per-row Catalyst expression —
  * shuffle-free, codegen'd, streams through a 100 TB scan. [[topNgram]]
  * is the one rule that genuinely needs an aggregation (the most-frequent
  * n-gram per document); it two-stage-aggregates on the high-cardinality
  * `(doc_id, shingle)` key, so no single task ever sees more than one
  * document's shingle partial counts.
  *
  * Determinism contract (driver hash-compare): every ratio divides exact
  * integer counts (bit-identical IEEE division in any engine), and rule
  * verdicts are string literals assembled with `array_sort` — see
  * [[graft.Queries]] class doc.
  */
object QualityFilters {

  /** Fraction of word occurrences that are repeats of an earlier word:
    * `(n_words - n_distinct_words) / n_words`. The cheap word-level twin
    * of Gopher's duplicate-line fraction (this corpus has no newlines).
    */
  def dupWordRatio(c: Column): Column = {
    val ws = Text.words(c)
    (size(ws) - size(array_distinct(ws))).cast("double") / size(ws).cast("double")
  }

  /** Gopher-style rule battery, calibrated to the harness corpus so each
    * rule actually discriminates (word counts run 10-99, mean word length
    * ~4.2-4.8, dup-word ratio ~0.25-0.68 at sf0.01).
    */
  final case class Rule(name: String, fails: Column => Column)

  val GopherRules: Seq[Rule] = Seq(
    Rule("word_count", c => !Text.nWords(c).between(25, 80)),
    Rule("mean_word_len", c => !Text.meanWordLen(c).between(4.0, 4.6)),
    Rule("dup_words", c => dupWordRatio(c) > 0.55),
    Rule("stopword", c => Text.stopwordHits(Text.words(c), Text.StopwordLists.flatMap(_._2)) < 2))

  /** True iff every rule passes. */
  def keep(c: Column): Column = GopherRules.map(r => !r.fails(c)).reduce(_ && _)

  /** Sorted comma-joined names of the rules that fail (empty string =
    * keep) — the audit trail a filtering pipeline logs per dropped doc.
    */
  def failReasons(c: Column): Column =
    array_join(
      array_sort(filter(
        array(GopherRules.map(r => when(r.fails(c), lit(r.name))): _*),
        x => x.isNotNull)),
      ",")

  /** Per-rule ABLATION audit for the battery: for each rule, how many
    * documents it fails (`n_fail`) and how many it is the SOLE reason
    * for dropping (`n_sole_fail` — the documents that would re-enter the
    * corpus if this one rule were removed). The tuning table a filter
    * pipeline reads before loosening a threshold: a rule with high
    * `n_fail` but near-zero `n_sole_fail` is redundant with the rest of
    * the battery; a rule carrying most of its fails alone is the one
    * whose threshold actually decides corpus size.
    *
    * Scale shape: ONE pass — per-row fail flags (pure codegen'd
    * expressions) into one map-combined aggregate of 2·|rules| sums,
    * then a |rules|-row `stack` unpivot. Shuffle moves 2·|rules| longs.
    */
  def ablation(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val flags = GopherRules.map(r => r.fails(col(textCol)).cast("int"))
    val nFails = flags.reduce(_ + _)
    val flagged = docs.select(
      GopherRules.zip(flags).map { case (r, f) => f.as("f_" + r.name) } :+
        nFails.as("nf"): _*)
    val aggs = GopherRules.flatMap { r =>
      Seq(sum(col("f_" + r.name)).cast("long").as("fail_" + r.name),
        sum(when(col("f_" + r.name) === 1 && col("nf") === 1, 1L)
          .otherwise(0L)).as("sole_" + r.name))
    }
    val one = flagged.agg(aggs.head, aggs.tail: _*)
    val stackArgs = GopherRules
      .map(r => s"'${r.name}', fail_${r.name}, sole_${r.name}").mkString(", ")
    one.select(expr(
      s"stack(${GopherRules.size}, $stackArgs) AS (rule, n_fail, n_sole_fail)"))
  }

  /** Most frequent n-word shingle per document and the fraction of the
    * document's words it covers (`count·n / n_words` — Gopher's "top
    * n-gram fraction"). Ties break on the lexicographically smallest
    * shingle via a `min_by` over `(-count, shingle)` struct ordering, so
    * the winner is partition-order-independent. Documents shorter than
    * `n` words have no shingles and are absent from the result.
    *
    * Scale shape: explode → two-stage hash aggregate on `(doc_id,
    * shingle)` then `doc_id` — partial aggregation map-side, and the
    * second shuffle moves one row per distinct (doc, shingle), never the
    * text.
    */
  def topNgram(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs
      .select(col("doc_id"), Text.nWords(col(textCol)).as("n_words"),
        explode(Text.shingles(col(textCol), n)).as("sh"))
      .groupBy("doc_id", "n_words", "sh").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id", "n_words")
      .agg(min_by(struct(col("sh"), col("cnt")),
        struct((-col("cnt")).as("nc"), col("sh").as("s"))).as("top"))
      .select(col("doc_id"), col("top.sh").as("top_ngram"),
        (col("top.cnt") * n).cast("double") / col("n_words").cast("double") as "frac")
}
