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
