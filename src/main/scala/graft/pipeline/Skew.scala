package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-salting for aggregations whose key distribution is
  * power-law (the tweet corpus's celebrity users, a web corpus's
  * boilerplate shingles). AQE splits skewed JOIN partitions on its own,
  * but a skewed AGGREGATION key still lands every row on one reducer
  * before the partial-agg kicks in for high-cardinality payloads like
  * `collect_set`. Two-stage salting bounds any single task at
  * ~1/`salts` of the hottest key.
  *
  * The salt is derived from a hash of the whole row's key + a bucket of a
  * secondary column (NOT a random number — deterministic retries, and the
  * driver oracle stays exact).
  */
object Skew {

  /** Two-stage count: groupBy(key, salt) partial → groupBy(key) final sum.
    * Result is exactly `df.groupBy(key).count()` — the salt only reshapes
    * the shuffle.
    */
  def saltedCount(df: DataFrame, key: Column, saltSource: Column,
                  salts: Int = 32): DataFrame = {
    val salt = pmod(hash(saltSource), lit(salts))
    df.groupBy(key.as("key"), salt.as("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy("key")
      .agg(sum("partial").as("cnt"))
  }

  /** Two-stage top-k over a LOW-CARDINALITY key: stage 1 ranks within
    * (key, salt) shards — `salts`× more, `salts`× smaller sort tasks — and
    * keeps each shard's top-k; stage 2 ranks the ≤ `salts`·k survivors per
    * key. Equal to the single-window top-k under the same total order
    * (the global top-k is contained in the union of shard top-ks), but no
    * task ever sorts a whole key's rows — the straggler
    * `Window.partitionBy(hot_key)` creates at 100× scale.
    *
    * `order` must be a TOTAL order (include a tiebreaker column) — it
    * decides ranks in both stages, and the salt is hashed from
    * `saltSource`, not random, so retries are deterministic.
    * Output = input columns + `rank` (1-based, ≤ k).
    */
  def saltedTopK(df: DataFrame, key: Column, saltSource: Column, k: Int,
                 order: Seq[Column], salts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shard = Window.partitionBy(key, pmod(hash(saltSource), lit(salts)))
      .orderBy(order: _*)
    val partial = df.withColumn("__r", row_number().over(shard))
      .filter(col("__r") <= k).drop("__r")
    val merged = Window.partitionBy(key).orderBy(order: _*)
    partial.withColumn("rank", row_number().over(merged).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Skew-mitigating equi-join — the JOIN twin of [[saltedCount]]. The
    * fact side gets a deterministic salt hashed from `saltSource` (pick a
    * row-unique column); the dim side is replicated ×`salts` so the join
    * key becomes (key, salt) and a hot key's rows spread over `salts`
    * reducers instead of one straggler task. Result is exactly the plain
    * equi-join: each fact row matches the one dim replica carrying its
    * salt.
    *
    * Reach for this when the dim is too big to broadcast AND AQE's
    * runtime skew split can't apply (the join's partitioning is pinned by
    * a downstream operator, or the skew is in a sort-merge side AQE won't
    * touch). Cost: the dim shuffle grows ×`salts` — size `salts` to the
    * hot key's multiple of a healthy partition, not higher.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltSource: Column, salts: Int = 32): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val replicated = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-stage distinct-collect: per-salt collect_set partial → flatten +
    * dedup final. Result set equals the unsalted `collect_set` (order is
    * canonicalized by `array_sort`). Bounds the per-task set size.
    */
  def saltedTagSet(df: DataFrame, key: Column, value: Column,
                   salts: Int = 32): DataFrame = {
    val salt = pmod(hash(value), lit(salts))
    df.groupBy(key.as("key"), salt.as("__salt"))
      .agg(collect_set(value).as("partial"))
      .groupBy("key")
      .agg(array_sort(array_distinct(flatten(collect_list(col("partial"))))).as("values"))
  }
}
