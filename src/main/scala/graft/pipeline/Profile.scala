package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling: the per-column health report every ingest pipeline runs
  * before trusting a new drop of data.
  */
object Profile {

  /** Per-column null count + EXACT distinct count in ONE scan, long form
    * (`col_name, n_nulls, n_distinct`).
    *
    * Plan shape: Catalyst rewrites the multi-column `count(DISTINCT …)`
    * aggregate into a single Expand (one pass over the data, ×N rows in
    * flight) rather than N separate scans — the right trade at 100 TB
    * where the scan dominates. The wide 1-row aggregate then unpivots via
    * `stack`, which is driver-free.
    *
    * Exact distinct over a 100 TB column is itself a full shuffle of that
    * column; when the profile is advisory (it usually is), swap
    * `countDistinct` for `approx_count_distinct` and keep the same shape —
    * the Expand collapses to map-side HLL sketches.
    */
  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(when(col(c).isNull, lit(1))).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__dst"))
    }
    val stackArgs = cols.map(c => s"'$c', `${c}__nulls`, `${c}__dst`").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct)"))
  }

  /** Key-distribution skew report: the count-of-counts histogram for a
    * prospective join/group key — `(cnt, n_keys, n_rows)` = "n_keys
    * distinct keys occur cnt times each, contributing cnt·n_keys rows". This
    * is the diagnostic to run BEFORE keying a 100 TB shuffle: a heavy tail
    * here is the signal to reach for [[Skew.saltedCount]] / stop-key caps,
    * and max(cnt)² bounds the worst self-join blowup per key.
    *
    * Two hash aggregates, both with map-side partials; the second groups by
    * the count value itself (tiny domain), so the report is sketch-sized
    * no matter how large or skewed the input.
    */
  def keySkew(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .groupBy(col("cnt")).agg(count(lit(1)).as("n_keys"))
      .select(col("cnt"), col("n_keys"), (col("cnt") * col("n_keys")).as("n_rows"))

  /** Per-key mode: the most frequent `value`, ties broken to the SMALLEST
    * value (mode is tie-ambiguous by definition — pinning the break makes
    * it deterministic under any partitioning, and hash-replayable).
    *
    * Plan: (key, value) counts, then `min(struct(-cnt, value))` per key —
    * an algebraic aggregate with map-side partials, NOT a rank window
    * (a window would sort every key's whole value list; the struct-min
    * collapses it shard-locally first — the same argmin-as-aggregate
    * trick as [[SimilarityIvf.assignTo]]'s `max_by`).
    */
  def mode(df: DataFrame, key: String, value: String): DataFrame =
    df.groupBy(col(key), col(value)).agg(count(lit(1)).as("cnt"))
      .groupBy(col(key))
      .agg(min(struct((-col("cnt")).as("neg"), col(value).as("v"))).as("m"))
      .select(col(key), col("m.v").as("mode_value"),
        (-col("m.neg")).as("mode_count"))

  /** Per-group content checksum for replica/sync reconciliation: each row
    * hashes to a 48-bit md5 prefix integer; the group checksum is their
    * exact-decimal SUM — commutative and associative, so it is invariant
    * under partitioning, row order, retries, and engine, unlike any
    * ordered digest. Two tables agree on (n_rows, checksum) per group ⟺
    * their row multisets almost surely agree — the cheap first pass of
    * any cross-store data-diff (the per-row digests are the second).
    * Emitted as a STRING (engines disagree on wide-integer column types,
    * not on digits).
    *
    * One map-combined hash aggregate; only (group, 48-bit int) partials
    * ride the shuffle.
    */
  /** Deterministic SHARD MANIFEST — the "write the training shards"
    * step made auditable: every doc hash-routes to `shards` buckets
    * (`md5(seed:id) mod shards` — engine-replayable, placement stable
    * under reshuffles/retries), and the manifest row per shard carries
    * doc count, token mass, and the order-invariant content checksum
    * ([[checksum]]'s exact-decimal sum of 48-bit row digests). Two
    * writers producing the same manifest almost surely wrote the same
    * shard contents — the reproducible-dataset-release contract.
    * One map-combined aggregate; only (shard, partial) rows shuffle.
    */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
                    shards: Int = 16, seed: String = "shard"): DataFrame = {
    require(shards >= 1, s"shards=$shards must be >= 1")
    docs.select(
        (conv(substring(md5(concat(lit(seed + ":"), col(idCol).cast("string"))),
          1, 15), 16, 10).cast("long") % shards).as("shard"),
        Text.nWords(col(textCol)).as("ntok"),
        conv(substring(md5(concat_ws("|", col(idCol), col(textCol))), 1, 12),
          16, 10).cast("decimal(28,0)").as("h"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"),
        sum(col("h")).cast("string").as("checksum"))
  }

  def checksum(df: DataFrame, group: String, cols: Seq[String]): DataFrame =
    df.select(col(group),
        conv(substring(md5(concat_ws("|", cols.map(col): _*)), 1, 12), 16, 10)
          .cast("decimal(28,0)").as("h"))
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h")).cast("string").as("checksum"))

  /** Per-source corpus "data card" — the one-table summary a dataset
    * release ships (docs, token mass, exact-dup rate, language
    * concentration): `(source, n_docs, n_tokens, n_distinct, dup_rate,
    * lang_gini, mean_words)`. `dup_rate = 1 − distinct md5(text)/n`;
    * `lang_gini = 1 − Σ_l (n_l/n)²` — Gini impurity as the
    * language-diversity number because it is a RATIO OF EXACT INTEGER
    * SUMS (`(n² − Σ n_l²)/n²`, one IEEE divide), where Shannon entropy
    * would drag libm `log` into the hash contract.
    *
    * Two aggregates keyed on `source` (+ one pre-aggregate on
    * `(source, lang)`) and a source-keyed join of sketch-sized relations
    * — the corpus shuffles twice by a low-cardinality key with map-side
    * partial aggregation doing the heavy lifting.
    */
  def corpusCard(docs: DataFrame, sourceCol: String = "source",
                 langCol: String = "lang", idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val base = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " "))).cast("long").as("n_tokens"),
        countDistinct(md5(col(textCol))).as("n_distinct"))
    val langSq = docs.groupBy(col(sourceCol), col(langCol))
      .agg(count(lit(1)).as("nl"))
      .groupBy(col(sourceCol))
      .agg(sum(col("nl") * col("nl")).as("sum_sq"))
    base.join(langSq, Seq(sourceCol))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"), col("n_distinct"),
        ((col("n_docs") - col("n_distinct")).cast("double") /
          col("n_docs").cast("double")).as("dup_rate"),
        ((col("n_docs") * col("n_docs") - col("sum_sq")).cast("double") /
          (col("n_docs") * col("n_docs")).cast("double")).as("lang_gini"),
        (col("n_tokens").cast("double") / col("n_docs").cast("double")).as("mean_words"))
  }

  /** Per-document n-gram NOVELTY: the fraction of a doc's distinct
    * n-grams whose FIRST corpus occurrence (minimum doc id) is this doc —
    * the standard memorization/duplication diagnostic ("how much of this
    * doc is text the corpus has already seen?"). A verbatim re-crawl
    * scores 0.0; pristine text ~1.0. Returns
    * `(doc_id, n_grams, n_novel, novelty)`; docs shorter than n words
    * have no grams and no row.
    *
    * Plan: grams FINGERPRINT to 60-bit md5-prefix longs at explode time
    * (the [[Dedup]]/[[Mix]] convention) so every downstream exchange
    * moves 8-byte keys instead of ~n-word strings — measured 3.8 → 2.2 s
    * at the synthesized 10× point. Then: distinct (doc, fp) → min-id
    * aggregate keyed on the fingerprint → join back (the aggregate's
    * exchange is reused — same key) → one doc-keyed aggregate. Never a
    * self-join: attribution is an argmin, so cost is O(gram instances),
    * not O(df²) per gram like the pairwise dedup joins. A 60-bit
    * collision (P ≈ grams²/2⁶¹) merges two grams' attribution
    * IDENTICALLY in any engine — the oracle replays the same md5, so
    * determinism survives even the astronomically unlikely case.
    * `novelty` is a ratio of exact longs — one IEEE divide.
    */
  def ngramNovelty(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", n: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
        explode(Text.shingles(col(textCol), n)).as("g"))
      .select(col("id"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("sh"))
      .distinct()
    val first = sh.groupBy(col("sh")).agg(min(col("id")).as("first_id"))
    sh.join(first, Seq("sh"))
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_id") === col("id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
  }

  /** Per-group duplicate n-gram MASS: of all n-gram INSTANCES (bag
    * semantics — repeats inside one doc count), what share is a repeat of
    * an already-seen gram? This is the "how much would n-gram-level dedup
    * save" sizing number a 100 TB dedup run reads before paying for the
    * pairwise pass. Returns
    * `(group, total_grams, distinct_grams, dup_mass_frac)`.
    *
    * One exploded projection → one aggregate with an exact
    * `count(DISTINCT)` (Expand-based partial aggregation; the scan
    * dominates at scale). Swap to `approx_count_distinct` for an
    * advisory run — same shape, map-side HLL sketches.
    */
  def gramDupMass(docs: DataFrame, groupCol: String = "source",
                  textCol: String = "text", n: Int = 3): DataFrame =
    docs.select(col(groupCol),
        explode(Text.shingles(col(textCol), n)).as("sh"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("total_grams"),
        countDistinct(col("sh")).as("distinct_grams"))
      .withColumn("dup_mass_frac",
        (col("total_grams") - col("distinct_grams")).cast("double") /
          col("total_grams").cast("double"))
}
