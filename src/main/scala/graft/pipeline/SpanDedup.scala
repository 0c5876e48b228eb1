package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sub-document (span-level) corpus dedup and boilerplate detection — the
  * "line dedup" stage of public web-corpus recipes (RefinedWeb / FineWeb
  * remove repeated LINES across documents; C4 drops any three-sentence
  * span seen before). The harness documents are single-line word streams,
  * so the unit here is a fixed-width non-overlapping word window
  * ([[Chunking.chunk]] with `stride = window`) — the same shape, with the
  * span boundary a pure word-position function instead of '\n'.
  *
  * Both operators share one plan skeleton: split → span rows → ONE hash
  * shuffle keyed on the span text (equivalently its digest). At 100 TB
  * that shuffle carries (span_digest, doc_id, span_idx) triples — never
  * documents — and the span keys are high-cardinality by construction, so
  * there is no skew: this is the same "only digests ride the shuffle"
  * shape as [[Dedup.exact]], one level below the document.
  */
object SpanDedup {

  /** Non-overlapping `span`-word units of each document, exactly
    * [[Chunking.chunk]]`(window = span, stride = span)`.
    */
  def spans(docs: DataFrame, idCol: String, textCol: String, span: Int): DataFrame =
    Chunking.chunk(docs, idCol, textCol, window = span, stride = span)
      .withColumnRenamed("chunk_idx", "span_idx")
      .withColumnRenamed("chunk_text", "span_text")

  /** Keep-first span dedup: a span survives iff it is the FIRST corpus
    * occurrence of its text, in deterministic `(doc_id, span_idx)` order —
    * later repeats are dropped, whatever document they sit in. Returns the
    * per-document audit a cleaning pipeline logs: total spans, surviving
    * spans, kept fraction (exact-integer-ratio double).
    *
    * Plan: one window `row_number` partitioned by the span text (the
    * digest), then a per-document re-aggregate. The window partitions are
    * per-UNIQUE-span — tiny and high-cardinality (a span repeated enough
    * to matter is exactly what the operator removes), so no task ever
    * sorts more than one span's occurrence list.
    */
  def keepFirst(docs: DataFrame, idCol: String, textCol: String,
                span: Int): DataFrame = {
    val w = Window.partitionBy(col("span_text"))
      .orderBy(col(idCol), col("span_idx"))
    spans(docs, idCol, textCol, span)
      .withColumn("kept", row_number().over(w) === 1)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .select(col(idCol), col("n_spans"), col("n_kept"),
        (col("n_kept").cast("double") / col("n_spans").cast("double"))
          .as("kept_frac"))
  }

  /** WITHIN-document span dedup — C4's "remove repeated lines inside the
    * page", distinct from [[keepFirst]]'s cross-corpus pass: each
    * document keeps only the FIRST occurrence of each of its spans, and
    * the cleaned text is reassembled in original order. Returns
    * `(id, clean_text, n_spans, n_spans_dropped)`.
    *
    * Scale shape: completely SHUFFLE-FREE — the span split and the
    * keep-first fold are per-row expressions (a document's spans live in
    * one array), so at 100 TB this is a map-only pass over the corpus.
    * The fold is an interpreted higher-order function, but it runs once
    * per document over ~doc_len/span elements (O(c²) `array_contains`
    * with c spans — c is small by construction), unlike the per-pair hot
    * loops that justified codegen expressions elsewhere.
    */
  def dedupWithinDoc(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", span: Int = 8): DataFrame = {
    val ws = graft.pipeline.Text.words(col(textCol))
    val nChunks = ceil(size(ws) / lit(span.toDouble)).cast("long")
    val chunks = transform(sequence(lit(0L), nChunks - 1),
      i => concat_ws(" ", slice(ws, (i * span + 1).cast("int"), lit(span))))
    val deduped = aggregate(chunks,
      array().cast("array<string>"),
      (acc, x) => when(array_contains(acc, x), acc).otherwise(concat(acc, array(x))))
    docs.select(col(idCol),
        chunks.as("__c"), deduped.as("__d"))
      .select(col(idCol), array_join(col("__d"), " ").as("clean_text"),
        size(col("__c")).cast("long").as("n_spans"),
        (size(col("__c")) - size(col("__d"))).cast("long").as("n_spans_dropped"))
  }

  /** Exact duplicated-substring detection via aligned character-window
    * anchors — the distributed relaxation of the suffix-array substring
    * dedup of "Deduplicating Training Data Makes Language Models Better"
    * (Lee et al., arXiv 2107.06499): any duplicated substring of length
    * ≥ `window + stride − 1` chars must contain at least one stride-aligned
    * `window`-char anchor occurring verbatim in both documents, so counting
    * cross-document anchor collisions lower-bounds (and at stride ≤ window,
    * tightly tracks) the duplicated-substring mass without ever building a
    * corpus-wide suffix array. Returns the per-document audit
    * `(id, n_windows, dup_windows, dup_frac)`; documents shorter than
    * `window` chars have no anchors and are absent.
    *
    * Scale shape: the anchor rows are `(md5 digest, doc_id)` pairs — 32-byte
    * keys, high-cardinality by construction — so the plan is one hash
    * aggregate on the digest (distinct-doc count, map-side partials), one
    * digest-keyed join back (same partitioning, exchange reused), and a
    * final id-keyed aggregate. Documents never ride a shuffle; at 100 TB
    * the shuffled volume is ~`chars/stride` digest rows.
    */
  def dupSubstrings(docs: DataFrame, idCol: String, textCol: String,
                    window: Int, stride: Int): DataFrame = {
    val n = length(col(textCol)).cast("long")
    // Column./ on longs is DOUBLE division; floor restores the integer
    // window count (operands are non-negative and < 2^53, so exact)
    val nWin = floor((n - window) / stride) + 1L
    val wins = docs.filter(n >= window)
      .select(col(idCol),
        explode(transform(sequence(lit(0L), nWin - 1),
          i => md5(col(textCol).substr((i * stride + 1).cast("int"), lit(window))
            .cast("binary")))).as("digest"))
    val dup = wins.groupBy(col("digest"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .select(col("digest"), lit(1L).as("is_dup"))
    wins.join(dup, Seq("digest"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("is_dup"), lit(0L))).as("dup_windows"))
      .select(col(idCol), col("n_windows"), col("dup_windows"),
        (col("dup_windows").cast("double") / col("n_windows").cast("double"))
          .as("dup_frac"))
  }

  /** Maximal duplicated RUNS — the cut list an exact substring-dedup pass
    * applies (Lee et al. 2107.06499 report the repeated intervals, not
    * just a per-doc fraction; [[dupSubstrings]] gives the fraction, this
    * gives the intervals). A window at anchor `i` covers chars
    * `[i·stride, i·stride + window)`; consecutive duplicated anchors
    * coalesce into one maximal run `(doc_id, run_start, run_end,
    * n_windows)` with `run_end` exclusive. Runs are emitted in ANCHOR
    * space: a run's interval never nests inside another's (both
    * endpoints strictly increase down the sorted runs), but two runs'
    * CHAR intervals overlap when `window > 2·stride` (islands one
    * missing anchor apart sit `2·stride` chars apart). Downstream
    * consumers ([[dupRunStats]], [[cutRuns]]) are union-aware — they
    * measure and cut the interval UNION, never summing raw lengths —
    * so any (window, stride) is safe; with `window ≤ 2·stride` the
    * runs are exactly disjoint.
    *
    * Scale shape: the anchor relation is `(digest, doc_id, i)` triples —
    * documents never ride a shuffle. One digest-keyed aggregate finds
    * shared anchors, one digest-keyed LEFT SEMI join marks them (same
    * partitioning, exchange reused), then the island detection is a
    * per-document window (`i − row_number` over anchors ordered by `i`)
    * + one (doc, runkey) aggregate — both keyed on the high-cardinality
    * doc id. All-integer arithmetic → hash-exact across engines.
    */
  def dupRuns(docs: DataFrame, idCol: String, textCol: String,
              window: Int, stride: Int): DataFrame = {
    val n = length(col(textCol)).cast("long")
    val nWin = floor((n - window) / stride) + 1L
    val wins = docs.filter(n >= window)
      .select(col(idCol), posexplode(transform(sequence(lit(0L), nWin - 1),
        i => md5(col(textCol).substr((i * stride + 1).cast("int"), lit(window))
          .cast("binary")))))
      .select(col(idCol), col("pos").cast("long").as("i"), col("col").as("digest"))
    val dup = wins.groupBy(col("digest"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .select(col("digest"))
    wins.join(dup, Seq("digest"), "left_semi")
      .withColumn("rk", col("i") - row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("i"))))
      .groupBy(col(idCol), col("rk"))
      .agg(min(col("i")).as("i0"), max(col("i")).as("i1"),
        count(lit(1)).as("n_windows"))
      .select(col(idCol), (col("i0") * stride).as("run_start"),
        (col("i1") * stride + window).as("run_end"), col("n_windows"))
  }

  /** The KEPT intervals between a document's runs: `(id, gs, ge)` with
    * `[gs, ge)` the maximal char spans NOT covered by any run — `[0, s₁)`,
    * `[max(e…), s₂)` …, `[e_k, n)`, empty/negative gaps dropped. Correct
    * for overlapping (window > 2·stride) runs because [[dupRuns]] output
    * is never nested: both endpoints strictly increase down the sorted
    * runs, so `lag(run_end)` IS the prefix max and a clipped-away gap
    * means the previous run already covers this one's start.
    */
  private def runGaps(runs: DataFrame, base: DataFrame, idCol: String): DataFrame = {
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("run_start"))
    val mid = runs.select(col(idCol),
      coalesce(lag(col("run_end"), 1).over(wDoc), lit(0L)).as("gs"),
      col("run_start").as("ge"))
    val tailGap = runs.groupBy(col(idCol)).agg(max(col("run_end")).as("gs"))
      .join(base, Seq(idCol))
      .select(col(idCol), col("gs"), col("n").as("ge"))
    mid.union(tailGap).filter(col("ge") > col("gs"))
  }

  /** Per-document budget view of [[dupRuns]]: how many chars the cut list
    * removes and keeps — `(doc_id, n_chars, n_runs, cut_chars,
    * kept_chars)`, one row per document (docs with no duplicated run
    * report zero cuts). The char volumes measure the interval UNION via
    * the gap complement ([[runGaps]]), so overlapping runs never double
    * count. The number a pipeline owner multiplies by the corpus size
    * before committing to a substring-dedup pass.
    */
  def dupRunStats(docs: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame = {
    val runs = dupRuns(docs, idCol, textCol, window, stride)
    val base = docs.select(col(idCol),
      length(col(textCol)).cast("long").as("n"))
    val kept = runGaps(runs, base, idCol)
      .groupBy(col(idCol)).agg(sum(col("ge") - col("gs")).as("kept"))
    val nRuns = runs.groupBy(col(idCol)).agg(count(lit(1)).as("n_runs"))
    base.join(nRuns, Seq(idCol), "left").join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n").as("n_chars"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"),
        // no runs → kept is the whole doc (the gap relation has no row);
        // runs covering everything → kept 0
        when(col("n_runs").isNull, lit(0L))
          .otherwise(col("n") - coalesce(col("kept"), lit(0L))).as("cut_chars"),
        when(col("n_runs").isNull, col("n"))
          .otherwise(coalesce(col("kept"), lit(0L))).as("kept_chars"))
  }

  /** APPLY the [[dupRuns]] cut list: rebuild each document's text with
    * the duplicated runs removed — `(doc_id, clean_text, n_runs)`, every
    * input document present (no runs → text unchanged). The kept text is
    * the ordered concatenation of the GAPS between runs ([[runGaps]]) —
    * the complement of the runs' interval union, so overlapping
    * (window > 2·stride) runs cut correctly too.
    *
    * Plan: the runs relation (pair-survivor-sized, not corpus-sized)
    * gets a per-doc lag window to emit gap intervals, one equi-join back
    * to the documents for the substring slices, and one per-doc
    * aggregate that sorts the (gap_start, segment) structs and joins the
    * segments — order restored by the sort key, not by any partition
    * order, so the rebuilt string is deterministic under any layout.
    * Char offsets fit ints because a JVM String already bounds a single
    * document below 2³¹ chars.
    */
  def cutRuns(docs: DataFrame, idCol: String, textCol: String,
              window: Int, stride: Int): DataFrame = {
    val runs = dupRuns(docs, idCol, textCol, window, stride)
    val base = docs.select(col(idCol), col(textCol).as("t"),
      length(col(textCol)).cast("long").as("n"))
    val tl = runs.groupBy(col(idCol)).agg(count(lit(1)).as("n_runs"))
    val rebuilt = runGaps(runs, base, idCol)
      .join(base, Seq(idCol))
      .select(col(idCol), struct(col("gs"),
        col("t").substr((col("gs") + 1).cast("int"),
          (col("ge") - col("gs")).cast("int")).as("seg")).as("g"))
      .groupBy(col(idCol))
      .agg(array_join(transform(array_sort(collect_list(col("g"))),
        x => x.getField("seg")), "").as("clean_text"))
    base.join(rebuilt, Seq(idCol), "left")
      .join(tl.select(col(idCol), col("n_runs")), Seq(idCol), "left")
      // three regimes: no runs → original text; runs with gaps → rebuilt;
      // runs covering the WHOLE doc → every gap is empty, the rebuilt row
      // is absent, and the clean text is "" (not the original!)
      .select(col(idCol),
        when(col("n_runs").isNull, col("t"))
          .otherwise(coalesce(col("clean_text"), lit(""))).as("clean_text"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"))
  }

  /** Boilerplate spans: span texts occurring in at least `minDocs`
    * DISTINCT documents (nav bars, cookie banners, license headers — the
    * lines a web pipeline strips before dedup). Returns
    * `(span_text, n_docs, n_occurrences)`.
    *
    * Plan: one hash aggregate on the span text; the distinct-doc count is
    * a partial-aggregating `count(distinct)` over (span, doc) pairs —
    * two map-combined exchanges of digest-sized rows, output sketch-sized
    * (only spans above the threshold).
    */
  def boilerplate(docs: DataFrame, idCol: String, textCol: String,
                  span: Int, minDocs: Int): DataFrame =
    spans(docs, idCol, textCol, span)
      .groupBy(col("span_text"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
}
