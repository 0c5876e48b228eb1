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
}
