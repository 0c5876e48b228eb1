package graft.pipeline

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

  /** Adjacent pair counts over the token-array relation. */
  def pairCounts(words: DataFrame): DataFrame =
    words.select(explode(bind(col("toks")) { t =>
        filter(
          transform(t, (_, i) =>
            when(i < size(t) - 1,
              struct(element_at(t, i + 1).as("a"), element_at(t, i + 2).as("b")))),
          p => p.isNotNull)
      }).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge the argmax pair's leftmost non-overlapping occurrences in
    * every word — one per-row projection against the 1-row broadcast
    * argmax. `m(j)` marks a match at 1-based position j; a match merges
    * iff the count of consecutive matches immediately before it is even
    * (run parity); position i+1 is consumed by a merge at i.
    */
  def mergeRound(words: DataFrame): DataFrame = {
    val top = pairCounts(words)
      .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1)
      .select(col("a").as("pa"), col("b").as("pb"))

    // m(j), 1-based over j=1..n-1: pair (t(j), t(j+1)) matches the argmax.
    // Guards matter under ANSI: `sequence(1, 0)` DESCENDS (1-char words
    // need the size>1 branch) and `element_at(_, 0)` THROWS, so the
    // boundary indices hide behind lazy `when` branches, never behind `||`.
    val merged = bind(col("toks")) { t =>
      bind(when(size(t) > 1,
          transform(sequence(lit(1), size(t) - 1), j =>
            element_at(t, j) === col("pa") && element_at(t, j + 1) === col("pb")))
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
                  concat(col("pa"), col("pb"))).otherwise(ti))),
            x => x.isNotNull)
        }
      }
    }
    words.crossJoin(broadcast(top))
      .select(col(words.columns.head), col("wpos"), merged.as("toks"))
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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to rounds) w = mergeRound(w)
    pairCounts(w)
  }
}
