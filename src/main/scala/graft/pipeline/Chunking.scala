package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window assembly for LLM training: split long documents into
  * overlapping word windows (chunking) and assign short documents to
  * fixed-budget training sequences (the concatenate-and-cut packing every
  * public pretraining recipe uses — GPT-2's "documents are concatenated,
  * then sliced into 1024-token segments" onward).
  *
  * Both are deterministic: chunk boundaries are pure functions of the
  * word positions, and packing order is the explicit `(group, id)` sort
  * key — never partition order.
  */
object Chunking {

  /** Overlapping word windows: one chunk starting at every `stride`-th
    * word position (`0, stride, 2·stride, …` while < word count), each
    * `window` words long (the tail chunks are shorter). A document
    * shorter than `window` yields exactly one chunk. Pure per-row
    * array expressions + one posexplode — shuffle-free, streams through
    * the scan.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1, s"window/stride must be >= 1")
    // transform's index i is 0-based over words; a chunk starts wherever
    // i % stride == 0 (slice is 1-based, hence i+1). bindArray let-binds
    // the split ONCE — referencing it inside the lambda directly would
    // re-split per word position (the O(W²) trap, see Text.bindArray)
    val chunks = docs.select(col(idCol),
      Text.bindArray(Text.words(col(textCol))) { ws =>
        filter(
          transform(ws,
            (_, i) => when(i % stride === 0, array_join(slice(ws, i + 1, lit(window)), " "))),
          c => c.isNotNull)
      }.as("chunks"))
    chunks.select(col(idCol),
      posexplode(col("chunks")).as(Seq("chunk_idx", "chunk_text")))
      .select(col(idCol), col("chunk_idx").cast("long"), col("chunk_text"))
  }

  /** Concatenate-and-cut sequence packing: within each `groupCol` stratum
    * (documents ordered by `idCol`), a running word-count is cut every
    * `budget` words; a document's `pack_id` is the pack its FIRST word
    * lands in — `floor(cumsum_before / budget)`. Documents may straddle a
    * boundary (standard pretraining semantics; the consumer slices the
    * concatenated stream).
    *
    * Scale note: the running sum is a window over `(groupCol, idCol)` —
    * partition the packing by a real stratum (source/shard/date) so no
    * single task sorts the whole corpus; packing WITHIN a shard is what
    * training pipelines do anyway (shards are the unit of shuffling).
    */
  def pack(docs: DataFrame, idCol: String, textCol: String,
           groupCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(groupCol), col(idCol), Text.nWords(col(textCol)).as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      // integer `div`, not `/`: Column./ on longs returns double
      .select(col(groupCol), col(idCol), col("n_tokens"),
        expr(s"(cum - n_tokens) div $budget").as("pack_id"))
  }

  /** Packing-quality audit for [[pack]]'s concatenate-and-cut layout:
    * per group, the pack count, token mass, and — the loss signal — how
    * many documents STRADDLE a pack boundary (`n_split_docs`): a split
    * document trains with its context truncated mid-thought, so the
    * split fraction is the coherence price of zero-padding packing
    * (cf. the document-masking discussion in T5/GPT-3 style packing).
    * A document starting at stream offset `s` with `n` tokens straddles
    * iff `(s+n−1) div budget > s div budget`. Returns one row per group:
    * `(group, n_docs, n_packs, total_tokens, n_split_docs, split_frac)`.
    *
    * Scale shape: the same single per-group cumulative window as
    * [[pack]] (partitioned on the stratum, the shard unit), then one
    * map-combined aggregate — no extra shuffle beyond the packer's own.
    */
  def packStats(docs: DataFrame, idCol: String, textCol: String,
                groupCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(groupCol), col(idCol), Text.nWords(col(textCol)).as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(col(groupCol), col("n_tokens"),
        expr(s"(cum - n_tokens) div $budget").as("p0"),
        expr(s"(cum - 1) div $budget").as("p1"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        (max(col("p1")) + 1).as("n_packs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(when(col("p1") > col("p0"), 1L).otherwise(0L)).as("n_split_docs"))
      .select(col(groupCol), col("n_docs"), col("n_packs"), col("total_tokens"),
        col("n_split_docs"),
        (col("n_split_docs").cast("double") / col("n_docs").cast("double"))
          .as("split_frac"))
  }

  /** Length-bucketed batching audit: assign each document to the smallest
    * bucket from a fixed power-of-two menu `minBucket, 2·minBucket, …,
    * maxBucket` that fits its word count (longer documents clamp to
    * `maxBucket` — the truncation bucket), and report per bucket the doc
    * count, the real token mass, the padded mass (`bucket · n_docs`), and
    * the padding waste fraction — the planning table a batching system
    * reads before choosing bucket boundaries (dynamic batching à la
    * fairseq/T5 groups by length for exactly this reason).
    *
    * The bucket is an explicit `when`-cascade over the fixed menu, NOT
    * `2^ceil(log2 n)`: integer comparisons are bit-identical across
    * engines, float `log2` at an exact power boundary is not. One
    * map-side-combined aggregate on a ≤ `log2(max/min)+1`-value key;
    * shuffle-free in every way that matters.
    */
  def lengthBuckets(docs: DataFrame, idCol: String, textCol: String,
                    minBucket: Int = 16, maxBucket: Int = 2048): DataFrame = {
    require(minBucket >= 1 && maxBucket >= minBucket,
      s"need 1 <= minBucket <= maxBucket, got $minBucket/$maxBucket")
    val menu = Iterator.iterate(minBucket.toLong)(_ * 2)
      .takeWhile(_ < maxBucket).toSeq :+ maxBucket.toLong
    val nTok = Text.nWords(col(textCol)).cast("long")
    val bucket = menu.init.reverse.foldLeft(lit(maxBucket.toLong)) {
      case (otherwise, b) => when(nTok <= b, lit(b)).otherwise(otherwise)
    }
    docs.select(bucket.as("bucket"),
        least(nTok, lit(maxBucket.toLong)).as("__tok"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("sum_tokens"))
      .select(col("bucket"), col("n_docs"), col("sum_tokens"),
        (col("bucket") * col("n_docs")).as("padded_tokens"),
        (((col("bucket") * col("n_docs")) - col("sum_tokens")).cast("double")
          / (col("bucket") * col("n_docs")).cast("double")).as("waste_frac"))
  }

  /** Content-defined chunking: cut after any word whose md5 prefix is
    * ≡ 0 mod `mask` — boundaries are decided by CONTENT, not position, so
    * an insertion near the head of a document shifts only the chunk it
    * lands in; every later chunk re-synchronizes to the same cut words
    * and keeps its hash (the storage-dedup / rsync boundary trick, and
    * the property the spec asserts). Fixed windows ([[chunk]]) and fixed
    * spans (`SpanDedup.spans`) lose ALL alignment after one insertion;
    * this is the shift-robust sub-document dedup unit.
    *
    * Expected chunk length is `mask` words (geometric); a document with
    * no boundary word is one chunk. Output per chunk: `(id, chunk_idx,
    * n_words, chunk_md5)` — the hash, not the text (dedup consumes
    * digests).
    *
    * Scale shape: pure per-row array expressions + one posexplode —
    * shuffle-free, streams through the scan; downstream dedup shuffles
    * 16-byte digests only.
    */
  def contentDefined(docs: DataFrame, idCol: String, textCol: String,
                     mask: Int): DataFrame = {
    require(mask >= 2, s"mask=$mask must be >= 2")
    val chunks = docs.select(col(idCol),
      Text.bindArray(Text.words(col(textCol))) { ws =>
        // 1-based cut positions: after word i+1 iff its md5 prefix hits
        // the mask and it isn't the last word (a trailing cut would make
        // an empty chunk). bindArray again: cuts feed two slice lambdas.
        Text.bindArray(concat(
          array(lit(0L)),
          filter(
            transform(ws, (w, i) =>
              when(conv(substring(md5(w), 1, 4), 16, 10).cast("long") % mask === 0
                && i + 1 < size(ws), (i + 1).cast("long"))),
            p => p.isNotNull),
          array(size(ws).cast("long")))) { cuts =>
          zip_with(
            slice(cuts, lit(1), size(cuts) - 1),
            slice(cuts, lit(2), size(cuts) - 1),
            (a, b) => array_join(slice(ws, (a + 1).cast("int"), (b - a).cast("int")), " "))
        }
      }.as("chunks"))
    chunks.select(col(idCol),
      posexplode(col("chunks")).as(Seq("chunk_idx", "chunk_text")))
      .select(col(idCol), col("chunk_idx").cast("long"),
        size(split(col("chunk_text"), " ")).cast("long").as("n_words"),
        md5(col("chunk_text")).as("chunk_md5"))
  }
}
