package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — pairwise support / confidence / lift,
  * the first (and in practice usually last) level of frequent-itemset
  * mining: which items co-occur in a basket more than chance predicts.
  * In an LLM-data pipeline the same shape scores tag/domain/source
  * co-occurrence; in classic OLAP it's products per order.
  *
  * Every metric is derived from four exact integer counts
  * (`n_ab`, `n_a`, `n_b`, `n_baskets`) by a SINGLE IEEE division of
  * exact-long products — bit-identical in any engine, no float
  * accumulation anywhere.
  *
  * Scale shape: the expensive step is the within-basket self-equi-join on
  * the HIGH-cardinality basket key — pairs per basket are O(size²), so
  * cost is Σ sizes², bounded by the largest basket, not the corpus (cap
  * giant baskets upstream if the domain allows them; a retail order or a
  * doc's tag set is tens of items). Item counts and the basket total are
  * sketch-sized aggregates broadcast back; nothing wide ever shuffles.
  */
object Assoc {

  /** Pair rules over `(basket, item)` rows (duplicates within a basket
    * collapse first). Output per unordered pair `item_a < item_b` with
    * `n_ab >= minPairs`:
    * `support = n_ab/n_baskets`, `conf_a_b = n_ab/n_a` (a→b),
    * `conf_b_a = n_ab/n_b`, `lift = n_ab·n_baskets/(n_a·n_b)` — lift > 1
    * means the pair co-occurs above independence.
    */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
                minPairs: Long = 1L): DataFrame = {
    val items = baskets.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    // 1-row total + per-item counts, both broadcast back — never a
    // driver-side count() (the Relevance corpus-stats pattern)
    val total = items.select(countDistinct(col("b")).as("n_baskets"))
    val counts = items.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = items.as("x")
      .join(items.as("y"), col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("item_a"), col("y.i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairs)
    pairs
      .join(broadcast(counts.withColumnsRenamed(Map("i" -> "item_a", "n_i" -> "n_a"))), Seq("item_a"))
      .join(broadcast(counts.withColumnsRenamed(Map("i" -> "item_b", "n_i" -> "n_b"))), Seq("item_b"))
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") / col("n_baskets").cast("double")).as("support"),
        (col("n_ab").cast("double") / col("n_a").cast("double")).as("conf_a_b"),
        (col("n_ab").cast("double") / col("n_b").cast("double")).as("conf_b_a"),
        ((col("n_ab") * col("n_baskets")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
  }
}
