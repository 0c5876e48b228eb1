package graft.pipeline

import graft.GraftStorage.Syntax
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relevance scoring: per-document top-k terms by TF-IDF and BM25
  * (Robertson et al., public literature). Used in training pipelines for
  * keyword extraction, domain tagging, and quality-weighted sampling.
  *
  * Determinism contract: both scorers use a LINEAR idf ratio rather than
  * the textbook logarithm — `N/df` for TF-IDF, `(N-df+0.5)/(df+0.5)` for
  * BM25 — because `log`'s last ulp is libm-dependent while IEEE
  * `+ - * /` are correctly rounded and bit-identical in every engine.
  * Linear idf is order-isomorphic to log idf (log is monotone), so
  * RANKINGS are identical to the textbook formulas; only the absolute
  * scores differ. Every other input is an exact integer (tf, df, doc
  * length) or an exact ratio of them, and the oracle replays the same
  * operation tree.
  *
  * Scale shape: two hash aggregates (doc-term tf, term df), one
  * broadcast of the per-term df table IF small — here left as a shuffle
  * join since term vocabulary at 100 TB is itself huge — and one scalar
  * corpus-stats DataFrame cross-joined as a broadcast (never a driver
  * `.count()` in the plan). Final top-k windows partition on the
  * high-cardinality doc id, so no straggler task.
  */
object Relevance {

  /** `(doc_id, term, tf)` and `(term, df)` building blocks. */
  private def tfTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(Text.words(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))

  private def topK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.withColumn("rank",
        row_number().over(Window.partitionBy(idCol).orderBy(col("score").desc, col("term"))).cast("long"))
      .filter(col("rank") <= k)

  /** Top-k terms per document by `tf · N/df` (linear idf; see class doc),
    * rank ties broken on the lexicographically smaller term.
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = tfTable(docs, idCol, textCol)
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df_, "term").crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        ((col("tf") * col("n_docs")).cast("double") / col("df").cast("double")).as("score"))
    topK(scored, idCol, k)
  }

  /** SPARSE lexical similarity JOIN — all-pairs TF-IDF cosine over the
    * df-CAPPED term space, via the inverted index: the lexical twin of
    * the dense embedding ANN path (and the recall backstop MinHash
    * misses when near-dups share vocabulary but not shingles). Weights
    * are exact integers `tf · (N div df)` (floor idf — coarse for
    * common terms, which the cap drops anyway), so the pair dot product
    * and both norms are exact longs; the cosine is the documented
    * 4-IEEE-op finish (cast, two sqrt, divide) — bit-replayable.
    *
    * Scale: the pairing join fans out df² per term, so it runs ONLY
    * over terms with `df · maxDfFrac ≤ N` — the same dyadic-fraction
    * df guard as [[cooccurrenceLift]]; common-term mass never joins.
    * Norms use the same capped space, so the metric is internally
    * consistent (cosine OVER the capped vocabulary, documented).
    * Overflow contract: w ≤ tf·N, so Σ w² needs tf²·N²·|terms| < 2⁶³
    * — at N = 10⁹ lower the idf scale or pre-bucket df.
    */
  def sparseCosinePairs(docs: DataFrame, idCol: String, textCol: String,
                        maxDfFrac: Int = 16, minCos: Double = 0.3): DataFrame = {
    val tf = docs.select(col(idCol), explode(filter(
        split(lower(col(textCol)), "[^a-z]+"), w => length(w) > 0)).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // pinned: the weighted index feeds the norm aggregate AND both
    // sides of the pairing join (the Dedup.components contract)
    val w = tf.join(dfT, "term").crossJoin(broadcast(n))
      .filter(col("df") * maxDfFrac <= col("n_docs"))
      .select(col(idCol), col("term"),
        (col("tf") * expr("n_docs div df")).as("w"))
      .persistTracked()
    val norms = w.groupBy(col(idCol)).agg(sum(col("w") * col("w")).as("n2"))
    val s = w.select(col(idCol).as("id1"), col("term"), col("w").as("w1"))
      .join(w.select(col(idCol).as("id2"), col("term"), col("w").as("w2")),
        Seq("term"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(sum(col("w1") * col("w2")).as("s"))
    s.join(norms.select(col(idCol).as("id1"), col("n2").as("na")), Seq("id1"))
      .join(norms.select(col(idCol).as("id2"), col("n2").as("nb")), Seq("id2"))
      .select(col("id1"), col("id2"),
        (col("s").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Mean token rarity per document: the average over the doc's word
    * occurrences of `corpus_word_count / corpus_tf(word)` — high = rare
    * vocabulary, the cheap "information density" quality signal (the
    * linear-ratio stand-in for mean self-information, order-isomorphic
    * per word since log is monotone).
    *
    * Determinism: each ratio divides exact longs; the per-doc SUM fixes
    * its fold order by sorting the ratios first (float addition is not
    * associative — an unordered SQL SUM would be partition-order-
    * dependent; `aggregate` over a sorted array is not). The collected
    * array is bounded by document length, never corpus size.
    */
  def tokenRarity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = docs.select(col(idCol), explode(Text.words(col(textCol))).as("term"))
    val tf = w.groupBy("term").agg(count(lit(1)).as("tf"))
    val tot = w.agg(count(lit(1)).as("n_total"))
    val rs = w.join(tf, "term").crossJoin(broadcast(tot))
      .select(col(idCol),
        (col("n_total").cast("double") / col("tf").cast("double")).as("ratio"))
      .groupBy(idCol).agg(sort_array(collect_list("ratio")).as("rs"))
    rs.select(col(idCol),
      (aggregate(col("rs"), lit(0.0), (a, x) => a + x) /
        size(col("rs")).cast("double")).as("rarity"))
  }

  /** Per-document out-of-vocabulary rate against a corpus-derived fixed
    * vocabulary: the `vocabSize` most frequent tokens (ties → the
    * lexicographically smaller token, so the vocabulary itself is
    * deterministic). The training-mix staple: a doc whose tokens mostly
    * fall outside the tokenizer's vocabulary inflates sequence length and
    * degrades loss — filter or reweight by this before mixing.
    *
    * Scale shape: one hash aggregate for token frequencies, a top-k via
    * `orderBy().limit(k)` (TakeOrderedAndProject — per-partition partial
    * top-k, only k rows reach the driver-side merge, never a global
    * sort), then the k-row vocabulary BROADCASTs to a left join flagging
    * each token instance, and one per-doc aggregate. `oov_rate` is a
    * ratio of exact counts → bit-replayable double.
    */
  def oovRate(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text", vocabSize: Int = 64): DataFrame = {
    val w = docs.select(col(idCol), explode(Text.words(col(textCol))).as("term"))
    val vocab = w.groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(vocabSize)
      .select(col("term"), lit(1L).as("known"))
    w.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(idCol).agg(
        sum(when(col("known").isNull, 1L).otherwise(0L)).as("oov"),
        count(lit(1)).as("total"))
      .select(col(idCol), col("oov"), col("total"),
        (col("oov").cast("double") / col("total").cast("double")).as("oov_rate"))
  }

  /** Per-document score under the corpus-trained bigram language model:
    * the mean conditional probability `P(w2|w1)` over the document's
    * bigram INSTANCES. The perplexity-filter shape (CCNet/C4 score docs
    * under a reference LM and drop the tail) with a determinism-safe
    * scoring rule: KenLM-style log-perplexity depends on libm `log`,
    * while a mean of exact-integer-ratio probabilities is bit-replayable
    * and ranks documents comparably for filtering (mean-prob is monotone
    * enough for a threshold gate; it is NOT numerically perplexity).
    *
    * Docs with fewer than two tokens have no bigrams and are absent —
    * callers treat absence as "unscorable", not score 0.
    *
    * Scale shape: one hash agg for bigram counts, one window on the
    * high-cardinality `w1`, a shuffle join back to per-doc bigram
    * instances (LM vocabulary² is too big to broadcast at corpus scale),
    * then the per-doc sorted-array fold ([[tokenRarity]]'s float-sum
    * determinism trick; array bounded by doc length).
    */
  def lmScore(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val bg = docs
      .select(col(idCol), explode(Text.shingles(col(textCol), 2)).as("bg"))
      .select(col(idCol), split(col("bg"), " ").getItem(0).as("w1"),
        split(col("bg"), " ").getItem(1).as("w2"))
    val lm = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .withColumn("prob",
        col("c").cast("double") /
          sum(col("c")).over(Window.partitionBy(col("w1"))).cast("double"))
      .select("w1", "w2", "prob")
    bg.join(lm, Seq("w1", "w2"))
      .groupBy(idCol).agg(sort_array(collect_list("prob")).as("ps"))
      .select(col(idCol), size(col("ps")).cast("long").as("n_bigrams"),
        (aggregate(col("ps"), lit(0.0), (a, x) => a + x) /
          size(col("ps")).cast("double")).as("lm_score"))
  }

  /** [[lmScore]] with Jelinek–Mercer unigram interpolation (λ = 1/2):
    * per bigram instance the score is
    *
    *   p = (P(w2|w1) + P(w2)) / 2
    *
    * — the smoothing every practical LM filter needs, because a raw
    * bigram model assigns unseen-context words probability mass only
    * through their context (a doc full of rare-but-ordinary words scores
    * as badly as gibberish; the unigram term separates the two). λ is
    * fixed at 1/2 so the combination is one addition and one halving of
    * two exact-integer-ratio doubles — a fixed IEEE tree, bit-replayable
    * (a tunable λ would multiply by an arbitrary double; 0.5 is exact).
    * Same absence contract as [[lmScore]] (< 2 tokens ⇒ unscorable).
    *
    * Scale shape: [[lmScore]]'s plan plus one token-count aggregate and
    * its 1-row corpus-total broadcast (the q_tfidf scalar pattern); the
    * unigram join keys on the high-cardinality `w2`.
    */
  def lmScoreInterpolated(docs: DataFrame, idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val bg = docs
      .select(col(idCol), explode(Text.shingles(col(textCol), 2)).as("bg"))
      .select(col(idCol), split(col("bg"), " ").getItem(0).as("w1"),
        split(col("bg"), " ").getItem(1).as("w2"))
    val lm = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .withColumn("p2",
        col("c").cast("double") /
          sum(col("c")).over(Window.partitionBy(col("w1"))).cast("double"))
      .select("w1", "w2", "p2")
    val toks = docs.select(explode(Text.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val nTok = toks.agg(sum(col("cw")).as("n_tokens"))
    val uni = toks.crossJoin(broadcast(nTok))
      .select(col("w").as("w2"),
        (col("cw").cast("double") / col("n_tokens").cast("double")).as("p1"))
    bg.join(lm, Seq("w1", "w2")).join(uni, Seq("w2"))
      .groupBy(idCol)
      .agg(sort_array(collect_list((col("p2") + col("p1")) / lit(2.0))).as("ps"))
      .select(col(idCol), size(col("ps")).cast("long").as("n_bigrams"),
        (aggregate(col("ps"), lit(0.0), (a, x) => a + x) /
          size(col("ps")).cast("double")).as("lm_jm_score"))
  }

  /** Top-k terms per document by BM25 with linear idf (see class doc):
    *
    *   idf = (N - df + 0.5) / (df + 0.5)
    *   score = idf · (tf·(k1+1)) / (tf + k1·(0.25 + 0.75·(dl/avgdl)))
    *
    * with the standard k1 = 1.2, b = 0.75 (0.25 + 0.75·x ≡ 1 − b + b·x).
    * The operation tree is replayed verbatim by the oracle, so scores are
    * bit-identical.
    */
  def bm25TopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val dl = docs.select(col(idCol), Text.nWords(col(textCol)).as("dl"))
    val tf = tfTable(docs, idCol, textCol)
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val scored = tf.join(df_, "term").join(dl, idCol).crossJoin(broadcast(stats))
      .select(col(idCol), col("term"), {
        val tfD = col("tf").cast("double")
        val idf = ((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))
        val denom = tfD + lit(1.2) *
          (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl")))
        (idf * ((tfD * lit(2.2)) / denom)).as("score")
      })
    topK(scored, idCol, k)
  }

  /** Vocabulary coverage curve: for each probe size k, the fraction of
    * all corpus TOKEN OCCURRENCES covered by the k most frequent terms
    * (frequency ties broken lexicographically) — the planning table for
    * choosing a tokenizer vocab size or an OOV cutoff: "64 types cover
    * 95% of tokens" is read straight off it. Returns
    * `(vocab_rank, covered_tokens, total_tokens, coverage)` per probe.
    *
    * Scale note: the rank window is over the VOCABULARY (one row per
    * distinct term — Heaps-law sublinear, millions at worst), never the
    * corpus; the corpus-sized work is the one map-combined term-count
    * aggregate. The single-partition sort on the vocab relation is the
    * deliberate, documented exception to the no-global-window rule —
    * same rationale as the k-row centroid collects.
    */
  def vocabCoverage(docs: DataFrame, textCol: String,
                    probeRanks: Seq[Int]): DataFrame = {
    val tf = docs.select(explode(Text.words(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("c").desc, col("term"))
    val ranked = tf
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = docs.agg(sum(Text.nWords(col(textCol))).as("total_tokens"))
    ranked.filter(col("r").isin(probeRanks.map(_.toLong): _*))
      .crossJoin(broadcast(tot))
      .select(col("r").as("vocab_rank"), col("cum").as("covered_tokens"),
        col("total_tokens"),
        (col("cum").cast("double") / col("total_tokens").cast("double"))
          .as("coverage"))
  }

  /** Term co-occurrence lift — the linear-ratio PMI (pointwise mutual
    * information, Church & Hanks 1990) of term pairs sharing a document:
    *
    *   lift(a,b) = P(a,b) / (P(a)·P(b)) = (c_ab · N) / (c_a · c_b)
    *
    * over DOCUMENT-LEVEL occurrence counts (`c_x` = docs containing x,
    * `c_ab` = docs containing both, N = corpus size). PMI is
    * `log2(lift)` — monotone, so lift preserves every ranking while
    * keeping the output an exact-integer ratio (see class doc for why
    * `log` is banned). Pairs are returned for terms whose df lies in
    * `[minDfFrac·N, maxDfFrac·N]` with `c_ab ≥ minPairFrac·N`,
    * `term1 < term2` — FRACTIONS of the corpus, not absolute counts, so
    * one parameterization holds across scale factors. Pass dyadic
    * fractions (k/2^m): `frac · N` is then exact in a double and the
    * band comparisons are bit-identical in every engine.
    *
    * Scale shape: the df band is the blowup guard — the per-doc pair
    * fan-out is quadratic in the doc's DISTINCT kept terms, and
    * `maxDfFrac` removes exactly the ubiquitous terms that would
    * otherwise pair with everything (the same hot-key reasoning as the
    * PPJoin prefix filter). Plan: distinct doc-term pairs (one
    * digest-sized shuffle), df aggregate + band filter against the
    * broadcast 1-row corpus count, doc-keyed self-join of the pruned
    * table, pair-keyed count, then two joins back to the (small,
    * banded) df table for `c_a`/`c_b`.
    */
  def cooccurrenceLift(docs: DataFrame, idCol: String, textCol: String,
                       minDfFrac: Double, maxDfFrac: Double,
                       minPairFrac: Double): DataFrame = {
    val docTerms = docs
      .select(col(idCol), explode(array_distinct(Text.words(col(textCol)))).as("term"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val df_ = docTerms.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .filter(col("df").cast("double") >= lit(minDfFrac) * col("n_docs").cast("double") &&
        col("df").cast("double") <= lit(maxDfFrac) * col("n_docs").cast("double"))
    val kept = docTerms.join(df_.select("term"), "term")
    // prune on the pair threshold BEFORE the df lookups — the aggregate
    // output is the big relation here, the banded df table the small one
    val pairs = kept.select(col(idCol), col("term").as("term1"))
      .join(kept.select(col(idCol), col("term").as("term2")), Seq(idCol))
      .filter(col("term1") < col("term2"))
      .groupBy("term1", "term2").agg(count(lit(1)).as("c_ab"))
      .crossJoin(broadcast(n))
      .filter(col("c_ab").cast("double") >= lit(minPairFrac) * col("n_docs").cast("double"))
    pairs
      .join(df_.select(col("term").as("term1"), col("df").as("c_a")), "term1")
      .join(df_.select(col("term").as("term2"), col("df").as("c_b")), "term2")
      .select(col("term1"), col("term2"), col("c_ab"), col("c_a"), col("c_b"),
        ((col("c_ab") * col("n_docs")).cast("double")
          / (col("c_a") * col("c_b")).cast("double")).as("lift"))
  }
}
