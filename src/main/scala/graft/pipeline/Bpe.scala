package graft.pipeline

import graft.GraftStorage.Syntax
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One BPE tokenizer-training round over a word corpus: count adjacent
  * token pairs, pick the argmax pair (ties → lexicographically smallest —
  * deterministic), merge its LEFTMOST NON-OVERLAPPING occurrences in
  * every word, and recount. This is the inner loop of byte-pair encoding
  * (Sennrich et al.) — a production trainer iterates it to a vocab
  * budget; the round is the distributed primitive.
  *
  * Greedy non-overlapping matching is inherently sequential, which SQL
  * has no fold for — but it collapses to PARITY inside maximal runs of
  * consecutive matches (in "aaaa" with pair (a,a), positions 0 and 2
  * merge, 1 and 3 are consumed), and the runs live WITHIN one word: the
  * whole merge is a per-row array projection, O(tokens²) per word with
  * word-length-bounded arrays. The first cut ran the same parity logic
  * as corpus-wide windows — three exchanges of the char-token relation;
  * this form shuffles nothing but the pair counts.
  *
  * Scale shape per round: ONE map-combined pair-count aggregate onto
  * ≤ |vocab|² keys, a 1-row argmax broadcast back onto the words (never
  * a driver literal — the round stays one lazy plan), and a shuffle-free
  * merge projection.
  */
object Bpe {

  /** Let-bind a computed array once (see [[Text.bindArray]]). */
  private def bind(a: Column)(f: Column => Column): Column =
    element_at(transform(array(a), f), 1)

  /** `(id, wpos, toks)` — each word as its single-char token array.
    * Char extraction is substring-based (`split(w, "")` has
    * engine-varying empty-element behavior); `sequence(1, 0)` DESCENDS,
    * hence the non-empty-word guard.
    */
  def words(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id),
      posexplode(split(col(text), " ")).as(Seq("wpos", "w")))
      .filter(length(col("w")) > 0)
      .select(col(id), col("wpos"),
        bind(col("w")) { w =>
          transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))
        }.as("toks"))

  /** Adjacent pair counts over the token-array relation. The pair list
    * is `zip(toks[0..n-2], toks[1..n-1])` via `arrays_zip` over two
    * `slice`s — regular collection expressions that stay inside
    * whole-stage codegen, unlike the transform/filter HOF formulation
    * (interpreted per row with per-element lambda evaluation).
    */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("toks")) > 1)
      .select(explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("a"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("b"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Leftmost-non-overlapping merge of pair `(pa, pb)` in the token array
    * `toks`, as higher-order-function collection lambdas — the
    * INDEPENDENT implementation twin of the codegen'd
    * [[graft.functions.BpeMergePair]] (which [[mergeRound]] uses on the
    * hot path), kept under [[encodeByPlan]] so the equivalence spec pins
    * two genuinely different formulations against each other. `m(j)`
    * marks a match at 1-based position j; a match merges iff the count of
    * consecutive matches immediately before it is even (run parity);
    * position i+1 is consumed by a merge at i.
    *
    * Guards matter under ANSI: `sequence(1, 0)` DESCENDS (1-char words
    * need the size>1 branch) and `element_at(_, 0)` THROWS, so the
    * boundary indices hide behind lazy `when` branches, never behind `||`.
    */
  private[graft] def mergePairExpr(toks: Column, pa: Column, pb: Column): Column =
    bind(toks) { t =>
      bind(when(size(t) > 1,
          transform(sequence(lit(1), size(t) - 1), j =>
            element_at(t, j) === pa && element_at(t, j + 1) === pb))
        .otherwise(array().cast("array<boolean>"))) { m =>
        bind(transform(m, (mj, j0) =>
          // merge iff the run of consecutive matches before j = j0+1 has
          // even length (greedy leftmost-non-overlapping = run parity)
          mj && aggregate(slice(m, lit(1), j0), lit(0),
            (acc, x) => when(x, acc + 1).otherwise(lit(0))) % 2 === 0)) { mg =>
          filter(
            transform(t, (ti, i0) =>
              when(coalesce(when(i0 > 0, element_at(mg, i0)), lit(false)),
                lit(null).cast("string")) // consumed by the merge at i0-1
              .otherwise(
                when(coalesce(when(i0 < size(t) - 1, element_at(mg, i0 + 1)),
                    lit(false)),
                  concat(pa, pb)).otherwise(ti))),
            x => x.isNotNull)
        }
      }
    }

  /** Merge the argmax pair's leftmost non-overlapping occurrences in
    * every word — one per-row projection against the 1-row broadcast
    * argmax, via the codegen'd [[graft.functions.BpeMergePair]] (the pair
    * stays a broadcast COLUMN, never a driver literal, so the round is
    * one lazy plan).
    */
  def mergeRound(words: DataFrame): DataFrame = {
    graft.functions.VectorFunctions.register(words.sparkSession)
    val top = pairCounts(words)
      .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1)
      .select(col("a").as("pa"), col("b").as("pb"))
    words.crossJoin(broadcast(top))
      .select(col(words.columns.head), col("wpos"),
        call_function("graft_bpe_merge_pair",
          col("toks"), col("pa"), col("pb")).as("toks"))
  }

  /** A merge table is VALID when every rule's operands are single
    * characters or the output of an earlier rule — the invariant real BPE
    * training produces (a merged token exists only after the rule that
    * forms it). Validity is what makes sequential rank-order application
    * ([[encodeByPlan]]) and priority-order application
    * ([[graft.functions.BpeEncode]]) provably identical: merging rule r
    * only creates adjacencies involving its output token, whose consuming
    * rules necessarily rank AFTER r, so no earlier rule can ever become
    * applicable again.
    */
  def validateMerges(merges: Seq[(String, String)]): Unit = {
    val formed = scala.collection.mutable.Set[String]()
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      def ok(x: String) = x.codePointCount(0, x.length) == 1 || formed.contains(x)
      require(ok(a) && ok(b),
        s"merge #$r ('$a','$b'): operand is neither a single character " +
          "nor formed by an earlier rule — not a rank-ordered BPE table")
      formed += a + b
    }
  }

  /** ENCODE with a learned merge table, as a chain of per-rule
    * [[mergePairExpr]] projections — rule r's pair as literals, applied
    * exhaustively (leftmost non-overlapping) before rule r+1, the
    * original sequential BPE encoder (Sennrich et al.). Output:
    * `(id, wpos, tpos, token)`.
    *
    * Every stage is a shuffle-free narrow projection, so the whole encode
    * is one map stage regardless of R — but the PLAN carries one Project
    * node per rule, so analyzer time is O(R): right for oracle-sized
    * tables (≤ a few dozen rules) and as the independent semantics spec
    * for [[graft.functions.BpeEncode]]; production-vocab tables (R ~ 30k)
    * use the expression, whose cost per word is O(tokens²) with O(1) rank
    * lookups and no plan growth.
    */
  def encodeByPlan(docs: DataFrame, id: String, text: String,
                   merges: Seq[(String, String)]): DataFrame = {
    validateMerges(merges)
    var w = words(docs, id, text)
    merges.foreach { case (a, b) =>
      w = w.select(col(id), col("wpos"),
        mergePairExpr(col("toks"), lit(a), lit(b)).as("toks"))
    }
    w.select(col(id), col("wpos"),
        posexplode(col("toks")).as(Seq("tpos", "token")))
      .select(col(id), col("wpos").cast("long").as("wpos"),
        col("tpos").cast("long").as("tpos"), col("token"))
  }

  /** ENCODE with the codegen'd [[graft.functions.BpeEncode]] expression —
    * the production path: per-word greedy priority tokenization compiled
    * into whole-stage codegen, O(1) rank lookups against the broadcast
    * merge table, constant plan size at any vocab. Provably identical to
    * [[encodeByPlan]] on a valid table (see [[validateMerges]];
    * spec-verified on random tables). Output: `(id, wpos, tpos, token)`.
    */
  def encode(docs: DataFrame, id: String, text: String,
             merges: Seq[(String, String)]): DataFrame = {
    validateMerges(merges)
    val fn = graft.functions.BpeEncode.register(docs.sparkSession, merges)
    docs.select(col(id), posexplode(split(col(text), " ")).as(Seq("wpos", "w")))
      .filter(length(col("w")) > 0)
      .select(col(id), col("wpos"),
        posexplode(call_function(fn, col("w"))).as(Seq("tpos", "token")))
      .select(col(id), col("wpos").cast("long").as("wpos"),
        col("tpos").cast("long").as("tpos"), col("token"))
  }

  /** `rounds` merge rounds, then the post-merge pair counts — the
    * relation a trainer would argmax for the NEXT merge.
    */
  def trainRound(docs: DataFrame, id: String, text: String,
                 rounds: Int = 1): DataFrame = {
    // Persist the char-split relation: each round reads it twice (the
    // argmax aggregate runs as the broadcast-subquery job, the merge
    // projection in the main job) and re-deriving it re-scans the text
    // column — at 100 TB the scan, not the merge, is the round.
    var w = words(docs, id, text)
      .persistTracked()
    for (_ <- 1 to rounds) w = mergeRound(w)
    pairCounts(w)
  }
}
