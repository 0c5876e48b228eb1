package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * merge, 1 and 3 are consumed): gaps-and-islands run ids + run-relative
  * parity, all plain windows, replayable in any engine.
  *
  * Scale shape: token rows are (doc, word, pos, token) — the windows
  * partition on (doc, word), high-cardinality and word-length-bounded;
  * the argmax pair is a pair-space aggregate attached back as a ONE-ROW
  * broadcast (never a driver literal, so the whole round is one lazy
  * plan); pair counts are map-combined hash aggs onto ≤ |vocab|² keys.
  */
object Bpe {

  /** `(id, wpos, tpos, tok)` single-char token rows of each word.
    * Char extraction is substring-based (`split(w, "")` has engine-varying
    * empty-element behavior); `sequence(1, 0)` DESCENDS, hence the
    * non-empty-word guard.
    */
  def charTokens(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id),
      posexplode(split(col(text), " ")).as(Seq("wpos", "w")))
      .filter(length(col("w")) > 0)
      .select(col(id), col("wpos"),
        posexplode(transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1)))).as(Seq("tpos", "tok")))

  /** Adjacent pair counts over token rows. */
  def pairCounts(toks: DataFrame, id: String): DataFrame = {
    val w = Window.partitionBy(col(id), col("wpos")).orderBy(col("tpos"))
    toks.withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("tok").as("a"), col("nxt").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Apply one merge round of the argmax pair; returns the new token
    * rows (tpos re-numbered).
    */
  def mergeRound(toks: DataFrame, id: String): DataFrame = {
    val top = pairCounts(toks, id)
      .orderBy(desc("cnt"), asc("a"), asc("b")).limit(1)
      .select(col("a").as("pa"), col("b").as("pb"))

    val w = Window.partitionBy(col(id), col("wpos")).orderBy(col("tpos"))
    val m = toks.crossJoin(broadcast(top))
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .withColumn("mtch",
        col("nxt").isNotNull && col("tok") === col("pa") && col("nxt") === col("pb"))
    // gaps-and-islands: run id for consecutive match positions, then
    // run-relative parity — even offsets merge, odd ones are consumed
    val wm = Window.partitionBy(col(id), col("wpos"), col("mtch")).orderBy(col("tpos"))
    val runs = m.withColumn("grp",
        when(col("mtch"), col("tpos") - row_number().over(wm)))
      .withColumn("run_start",
        min(col("tpos")).over(
          Window.partitionBy(col(id), col("wpos"), col("mtch"), col("grp"))))
      .withColumn("merged",
        col("mtch") && (col("tpos") - col("run_start")) % 2 === 0)
      .withColumn("consumed", coalesce(lag(col("merged"), 1).over(w), lit(false)))
    runs.filter(!col("consumed"))
      .select(col(id), col("wpos"),
        row_number().over(w).as("tpos"),
        when(col("merged"), concat(col("pa"), col("pb"))).otherwise(col("tok")).as("tok"))
  }

  /** `rounds` merge rounds, then the post-merge pair counts — the
    * relation a trainer would argmax for the NEXT merge.
    */
  def trainRound(docs: DataFrame, id: String, text: String,
                 rounds: Int = 1): DataFrame = {
    var toks = charTokens(docs, id, text)
    for (_ <- 1 to rounds) toks = mergeRound(toks, id)
    pairCounts(toks, id)
  }
}
