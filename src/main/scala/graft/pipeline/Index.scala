package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index construction — the IR/search-side complement of the
  * [[Relevance]] scoring ops: term → document frequency + posting list.
  */
object Index {

  /** Build a term → (df, postings) index over a document table. Postings
    * are the numerically-sorted doc ids, capped at `maxPostings` and
    * string-joined (the cap bounds row width; `df` always counts the FULL
    * posting set, so truncation is observable downstream).
    *
    * Plan shape: explode → distinct (term,doc) → one groupBy(term). The
    * 100 TB concern is posting-list skew — stopword terms collect a huge
    * share of the corpus — which is why the cap exists: `slice` bounds the
    * aggregated array, and real deployments shard hot terms' postings into
    * blocks keyed by (term, block_no). `minDf` prunes the hapax tail (the
    * vast majority of terms) before it ever hits the sink.
    */
  def inverted(docs: DataFrame, id: String, text: String,
               minDf: Long = 1L, maxPostings: Int = 100): DataFrame =
    docs.select(col(id).as("did"), explode(Text.words(col(text))).as("term"))
      .distinct()
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        array_join(
          transform(slice(array_sort(collect_list(col("did"))), 1, maxPostings),
            d => d.cast("string")),
          ",").as("postings"))
      .filter(col("df") >= minDf)

  /** Positional phrase search — the serving-side twin of [[inverted]]:
    * a k-word phrase is k-1 EQUI-joins of positional posting lists on
    * `(doc, alignedPos)`, the classic positional-index intersection. Each
    * arm filters to ONE term before joining, so the join inputs are that
    * term's postings, never the corpus; word `i` joins at `pos - i` so
    * every arm aligns on the phrase's start offset. Returns
    * `(id, n_matches)` for documents containing the exact consecutive
    * phrase, with occurrence counts.
    */
  def phraseSearch(docs: DataFrame, id: String, text: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val toks = docs.select(col(id),
      posexplode(Text.words(col(text))).as(Seq("pos", "term")))
    val first = toks.filter(col("term") === phrase.head).select(col(id), col("pos"))
    phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (w, i)) =>
      acc.join(toks.filter(col("term") === w)
        .select(col(id), (col("pos") - i).as("pos")), Seq(id, "pos"))
    }.groupBy(col(id)).agg(count(lit(1)).as("n_matches"))
  }

  /** Bitmap index over a LOW-cardinality column — the OLAP-side complement
    * of [[inverted]]: per distinct value, a bitset of the rows holding it,
    * packed 64 rows per long. Positions come from [[Ids.contiguous]]
    * (md5-ordered dense ids), so the SAME `tieCol` key gives the SAME
    * position in every index built over the table — which is what makes
    * cross-index bit operations ([[bitmapIntersect]]) meaningful, and what
    * makes the whole structure a pure function of the data (retry /
    * repartition / engine-invariant, hence oracle-hashable).
    *
    * Output: `(value, word, bits)` — one row per NON-ZERO 32-row word, a
    * sparse layout (dense runs of absent values cost nothing, the roaring-
    * bitmap observation). 32 rows per long, not 64: bit 63 of a SIGNED
    * long is engine-divergent (`1 << 63` overflows in DuckDB where Spark
    * wraps), so the top half stays unused and every engine agrees on
    * every word. Plan: the id pass, then ONE `bit_or` hash aggregate;
    * `bit_or`/`bit_and`/`bit_count` are map-side-combining integer aggs,
    * so only (value, word, long) partials shuffle — the index is
    * ~|values|·|rows|/32 longs regardless of row width.
    */
  def bitmap(df: DataFrame, valueCol: String, tieCol: String): DataFrame =
    Ids.contiguous(df, tieCol)
      .select(col(valueCol).as("value"),
        expr("gid DIV 32").as("word"),
        expr("shiftleft(1L, CAST(gid % 32 AS INT))").as("bit"))
      .groupBy("value", "word")
      .agg(bit_or(col("bit")).as("bits"))

  /** Intersect two bitmap indexes (e.g. over different columns of the same
    * table, built with the same `tieCol`): per (valueA, valueB), the count
    * of rows holding BOTH — `Σ_word popcount(bitsA & bitsB)`, the classic
    * bitmap-AND count that answers multi-predicate cardinality without
    * touching the table. Equi-join on `word` (never a cross join of rows),
    * then one hash agg; rows with an empty intersection are dropped.
    */
  def bitmapIntersect(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("value").as("value_a"), col("word"), col("bits").as("bits_a"))
      .join(b.select(col("value").as("value_b"), col("word"), col("bits").as("bits_b")),
        Seq("word"))
      .groupBy("value_a", "value_b")
      .agg(sum(bit_count(col("bits_a").bitwiseAND(col("bits_b"))).cast("long")).as("n_rows"))
      .filter(col("n_rows") > 0L)
}
