package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftStorage.Syntax

/** DSIR-shaped importance weighting for training-data selection (Xie et
  * al., "Data Selection for Language Models via Importance Resampling",
  * arXiv 2302.03169 — published method): score every raw document by how
  * much more likely its hashed-n-gram features are under a TARGET corpus
  * distribution than under the RAW corpus distribution, then keep the
  * top-weighted slice. The published recipe uses bag-of-hashed-ngrams
  * unigram models and log-likelihood-ratio weights; this implementation
  * keeps the same models and feature space but scores with the
  * CROSS-MULTIPLIED INTEGER difference per feature instead of a float
  * log-ratio, so every weight is an exact integer both engines agree on
  * (same determinism trade the linear-idf BM25 in [[Relevance]] makes —
  * per-feature order vs target/raw likelihood is preserved exactly;
  * per-document sums weight common features more than a log would).
  *
  * Scale shape — what matters at 100 TB: both feature models are
  * `buckets`-row aggregates (buckets ≪ corpus, the whole point of
  * feature hashing), the per-feature weight table is built once and
  * BROADCAST, and scoring is a map-side probe + one per-doc sum — the
  * corpus shuffles only by doc id. Adding a new target domain re-runs
  * only the buckets-row model aggregate, not the corpus scan.
  *
  * Overflow contract (same class as `graft_doti`'s): per-feature weights
  * are bounded by `(|features_target|+buckets) · (max bucket count + 1)`,
  * and a document sums at most `len(text)` of them — exact in a long
  * while `total_features² · doc_len < 2⁶³` (comfortably true to ~10⁹
  * model features); past that, swap the sum to `decimal(38,0)` or
  * downsample the MODEL counts (the models are distributions — scaling
  * both sides preserves every weight's sign and relative order).
  */
object Importance {

  /** Hashed feature multiset `(id, bucket, is_target)`: word unigrams +
    * bigrams with multiplicity (the DSIR featurizer), bucket = first 60
    * bits of md5(token) mod `buckets` — identical hashing to
    * [[QualityClassifier.features]] so the two share oracle plumbing.
    */
  private[graft] def labeledFeatures(docs: DataFrame, idCol: String, textCol: String,
                                     targetPred: Column, buckets: Int): DataFrame = {
    val toks = concat(Text.words(col(textCol)), Text.shingles(col(textCol), 2))
    docs.select(col(idCol).as("id"), targetPred.as("is_target"), explode(toks).as("tok"))
      .select(col("id"), col("is_target"),
        pmod(conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"),
          lit(buckets.toLong)).as("bucket"))
  }

  /** Per-bucket importance weight table (`buckets` rows):
    *
    *   w(f) = (c_t(f)+1)·(T_r+B) − (c_r(f)+1)·(T_t+B)
    *
    * the cross-multiplied numerator of the add-one-smoothed likelihood
    * ratio p_t(f)/p_r(f) − 1: positive iff the feature is MORE likely
    * under the target model, with magnitude proportional to the
    * (smoothed) probability gap scaled by the constant (T_t+B)·(T_r+B).
    * Buckets no document touches still get the smoothing pseudo-count on
    * both sides — the table is dense over `range(buckets)`.
    */
  private[graft] def featureWeights(feats: DataFrame, buckets: Int): DataFrame = {
    val spark = feats.sparkSession
    val counts = feats.groupBy(col("bucket"))
      .agg(sum(when(col("is_target"), 1L).otherwise(0L)).as("c_t"),
        sum(when(col("is_target"), 0L).otherwise(1L)).as("c_r"))
    val totals = counts.agg(sum(col("c_t")).as("tt"), sum(col("c_r")).as("tr"))
    val b = lit(buckets.toLong)
    spark.range(buckets.toLong).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("c_t", "c_r"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        ((col("c_t") + 1L) * (col("tr") + b) -
          (col("c_r") + 1L) * (col("tt") + b)).as("w"))
  }

  /** Per-document importance weights `(doc_id, w_sum, n_features,
    * score)`: `w_sum` the exact-integer sum of per-feature weights over
    * the document's feature INSTANCES, `score = w_sum / n_features` (one
    * ratio of exact ints — documents of different lengths compare on the
    * mean, not the raw sum). Documents whose text produces no features
    * emit no row (join-then-aggregate contract, as
    * [[QualityClassifier.score]]).
    *
    * `targetPred` labels the rows the target model trains on (e.g.
    * `col("lang") === "en"` — "select raw docs that look like the
    * English slice"); every row, target or not, is scored.
    */
  def dsirWeights(docs: DataFrame, targetPred: Column, idCol: String = "doc_id",
                  textCol: String = "text", buckets: Int = 4096): DataFrame = {
    // both the model aggregate and the scoring probe read the feature
    // relation — persist it once instead of re-running the corpus scan +
    // tokenize + md5 per side (the md5 dominates; measured ~25% off the
    // end-to-end at sf0.1). GraftStorage owns the release.
    val feats = labeledFeatures(docs, idCol, textCol, targetPred, buckets)
      .persistTracked()
    feats
      .join(broadcast(featureWeights(feats, buckets)), "bucket")
      .groupBy(col("id"))
      .agg(sum(col("w")).as("w_sum"), count(lit(1)).as("n_features"))
      .select(col("id").as(idCol), col("w_sum"), col("n_features"),
        (col("w_sum").cast("double") / col("n_features").cast("double")).as("score"))
  }

  /** Deterministic top-`k` selection by importance score (ties → min doc
    * id): the RESAMPLE step of DSIR with the sampling made reproducible —
    * rank instead of draw (the same determinism stance as [[Mix]]'s
    * hash-based sampling; a Gumbel draw would need engine-matched RNG).
    * Output is the selected slice of the per-doc weight table.
    *
    * `orderBy().limit(k)` plans as TakeOrderedAndProject — per-partition
    * partial top-k, k rows to the merge, NO global sort of the weight
    * table — and the rank window then runs over only the k survivors
    * (the [[Relevance.oovRate]] vocabulary-pick shape). A whole-corpus
    * budgeted selection should use [[Mix.selectByBudget]]'s two-phase
    * prefix-sum instead of a large k here.
    */
  def dsirSelect(docs: DataFrame, targetPred: Column, k: Int,
                 idCol: String = "doc_id", textCol: String = "text",
                 buckets: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    dsirWeights(docs, targetPred, idCol, textCol, buckets)
      .orderBy(col("score").desc, col(idCol)).limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("score").desc, col(idCol))).cast("long"))
  }
}
