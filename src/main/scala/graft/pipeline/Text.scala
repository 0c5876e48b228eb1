package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, language ID, quality scoring, token counting,
  * and document fingerprinting. Everything here is pure Catalyst
  * expressions — codegen'd, no UDFs, shuffle-free per row — so the ops
  * stream through a 100 TB scan at full speed.
  *
  * Cross-engine determinism: ratios are divisions of exact integer counts
  * (bit-identical doubles in any IEEE engine), so the DuckDB oracle can
  * hash-compare them without tolerance.
  */
object Text {

  /** Whitespace words (single-space split, faithful to simple corpora). */
  def words(c: Column): Column = split(c, " ")

  /** Let-bind a computed array once: `array(a)` evaluates `a` a single
    * time, and the transform lambda variable is a cheap bound reference.
    * Without this, a lambda body referencing the source expression (e.g.
    * `element_at(split(text), i)`) re-evaluates the split PER ELEMENT —
    * O(W²) characters per document on the shingle path.
    */
  private[graft] def bindArray(a: Column)(f: Column => Column): Column =
    element_at(transform(array(a), f), 1)

  /** n-word shingles, e.g. "a b c d" with n=3 → ["a b c", "b c d"].
    * Index lambda is 0-based; `element_at` is 1-based.
    */
  def shingles(c: Column, n: Int): Column =
    bindArray(words(c)) { ws =>
      filter(
        transform(ws, (x, i) =>
          when(i <= size(ws) - n,
            concat_ws(" ", Seq(x) ++ (1 until n).map(j => element_at(ws, i + lit(j + 1))): _*))),
        s => s.isNotNull)
    }

  /** Adjacent character pairs of a word ("fox" → ["fo", "ox"]) — the
    * statistic a BPE tokenizer-training round maximizes (count pairs →
    * merge the argmax). Empty for words shorter than 2 chars. O(W) via a
    * sliding `substring`, shuffle-free per row.
    */
  def charPairs(word: Column): Column =
    bindArray(word)(w =>
      when(length(w) >= 2,
        transform(sequence(lit(1), length(w) - 1), i => w.substr(i, lit(2))))
        .otherwise(array().cast("array<string>")))

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small and fixed — the mechanism (per-language
    * evidence counts + deterministic argmax) is what matters; lists are
    * swappable.
    */
  val StopwordLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des"),
    "de" -> Seq("der", "die", "das", "und", "ein", "zu", "den"),
    "zh" -> Seq("的", "是", "了", "我", "不"))

  /** Count of words present in `list`. */
  def stopwordHits(ws: Column, list: Seq[String]): Column =
    size(filter(ws, w => w.isin(list: _*))).cast("long")

  /** Per-language stopword evidence counts, columns `c_en .. c_zh`. */
  def langEvidence(textCol: Column): Seq[Column] = {
    val ws = words(textCol)
    StopwordLists.map { case (lang, list) => stopwordHits(ws, list).as(s"c_$lang") }
  }

  /** Deterministic argmax over the evidence counts: first language (in
    * [[StopwordLists]] order) whose count is >= all later ones. Integer
    * comparisons only — no cross-engine float risk.
    */
  def langPredict(counts: Seq[Column]): Column = {
    val langs = StopwordLists.map(_._1)
    langs.init.zipWithIndex.foldRight(lit(langs.last)) { case ((lang, i), elseC) =>
      val wins = counts.drop(i + 1).map(o => counts(i) >= o).reduce(_ && _)
      when(wins, lit(lang)).otherwise(elseC)
    }
  }

  /** Token count with a BPE-ish regex: alpha runs, digit runs, or single
    * punctuation — the standard cheap proxy for LLM token budgeting.
    */
  val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(TokenPattern), lit(0))).cast("long")

  /** Quality-score ingredients (all exact-integer-ratio doubles):
    * word count, mean word length, stopword ratio, punctuation ratio.
    */
  def nWords(c: Column): Column = size(words(c)).cast("long")

  def meanWordLen(c: Column): Column = {
    val ws = words(c)
    // total word chars / word count; exact ints → deterministic double
    aggregate(ws, lit(0L), (acc, w) => acc + length(w).cast("long")).cast("double") /
      size(ws).cast("double")
  }

  def stopwordRatio(c: Column): Column =
    stopwordHits(words(c), StopwordLists.flatMap(_._2)).cast("double") /
      size(words(c)).cast("double")

  def punctRatio(c: Column): Column =
    // empty text → null (not 0/0 = NaN), matching SQL division-by-zero
    // semantics so the cross-engine contract holds on degenerate input
    when(length(c) === 0, lit(null).cast("double")).otherwise(
      (length(c) - length(regexp_replace(c, "[^A-Za-z0-9 ]", ""))).cast("double") /
        length(c).cast("double"))

  /** Composite quality score in [0,1]-ish: weights are fixed constants and
    * every term is a deterministic double, so the score itself is
    * deterministic. Heuristic, tune freely.
    */
  def qualityScore(c: Column): Column =
    lit(0.4) * stopwordRatio(c) +
      lit(0.3) * (lit(1.0) - punctRatio(c)) +
      lit(0.3) * when(nWords(c).between(10, 2000), lit(1.0)).otherwise(lit(0.0))

  /** Bottom-k document fingerprint: the k lexicographically-smallest md5
    * digests of the doc's distinct n-gram shingles, comma-joined. A
    * fixed-size sketch — two docs sharing most shingles share most of the
    * sketch (same family as winnowing; driver-verifiable because md5 is
    * identical everywhere).
    */
  def fingerprint(c: Column, n: Int = 3, k: Int = 5): Column =
    array_join(slice(array_sort(array_distinct(transform(shingles(c, n), s => md5(s)))), 1, k), ",")

  /** Rolling-hash (Rabin-Karp) fingerprint: bottom-k distinct
    * `window`-byte polynomial hashes, comma-joined — the O(len) sketch for
    * char-level near-dup detection (see [[graft.functions.RollingHash]]).
    * Windows other than 16 need `VectorFunctions.registerRolling` first.
    */
  def rollingFingerprint(c: Column, window: Int = 16, k: Int = 5): Column =
    array_join(
      transform(
        slice(array_sort(array_distinct(
          graft.functions.VectorFunctions.rollingHashes(c, window))), 1, k),
        h => h.cast("string")),
      ",")
}
