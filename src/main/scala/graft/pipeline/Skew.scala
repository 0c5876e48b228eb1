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

  /** Top-k per (possibly HOT) key without ever sorting a whole key's rows
    * in one task. Since r14 this runs on [[graft.plans.TopKPerKey]] —
    * per-partition bounded heaps BEFORE the exchange, then a final heap
    * pass per key — instead of the former two-window salted shape: the
    * shuffle now carries ≤ k rows per (key, input partition) where the
    * salted stage 1 exchanged EVERY row into (key, salt) shards and fully
    * sorted each shard (the heap partial needs no salt — every input
    * partition already is its own shard, and no partition-wide sort
    * buffer exists on either side). The rank window that re-attaches
    * `rank` runs over ≤ k-per-key survivors and reuses the Final pass's
    * exchange. Results are identical to the single-window top-k
    * (PropertySpec pins it): a heap-dropped row has ≥ k same-key rows
    * ordering before it in its own partition, hence ≥ k globally.
    *
    * `order` must be a TOTAL order (include a tiebreaker column).
    * `saltSource`/`salts` are retained for source compatibility and
    * ignored — determinism no longer needs a salt.
    * Output = input columns + `rank` (1-based, ≤ k).
    */
  def saltedTopK(df: DataFrame, key: Column, saltSource: Column, k: Int,
                 order: Seq[Column], salts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    locally { val _ = (saltSource, salts) } // kept for source compatibility
    val pruned = graft.plans.TopKPerKey.byCols(df, Seq(key), order, k)
    val merged = Window.partitionBy(key).orderBy(order: _*)
    pruned.withColumn("rank", row_number().over(merged).cast("long"))
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
