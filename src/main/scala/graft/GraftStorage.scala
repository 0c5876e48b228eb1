package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Owning-session registry for every intermediate relation the library
  * `persist()`s (ranked shingle hubs, LSH keys, BPE vocab, k-means cell
  * assignments, …).
  *
  * Those relations are referenced by the LAZY DataFrames the entry points
  * return, so the library cannot unpersist them eagerly — the caller
  * hasn't consumed the result yet. Before this registry, the blocks
  * simply accumulated for the life of the session (executor memory
  * pinned across jobs; Bench worked around it with a manual
  * `cacheManager.clearCache()` sweep). The contract now is:
  *
  *   1. library code persists through [[persisted]], which records the
  *      exact Dataset handle it cached;
  *   2. the session owner calls [[clear]] after CONSUMING each result —
  *      between queries in a harness, per job in production.
  *
  * [[clear]] unpersists precisely what graft pinned — each tracked
  * handle's `unpersist()` drops both its CacheManager entry and its
  * blocks — and then sweeps `sc.getPersistentRDDs` for the RDD-level
  * local checkpoints the iterative graph/clustering loops leave behind
  * (those never enter the CacheManager, so the handle walk cannot see
  * them). The RDD sweep makes `clear` an OWNING-session hook by
  * contract: don't interleave it with foreign code that persists its
  * own RDDs on the same SparkContext.
  */
object GraftStorage {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** `df.persist(MEMORY_AND_DISK)`, recorded for a later [[clear]]. */
  private[graft] def persisted(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.add(p)
    p
  }

  /** How many persisted handles are currently tracked (spec/debug aid). */
  def trackedCount: Int = tracked.size()

  /** Postfix form: `df.persistTracked()` ≡ [[persisted]] — keeps the
    * call sites chainable where `.persist(level)` used to sit.
    */
  implicit class Syntax(private val df: DataFrame) extends AnyVal {
    private[graft] def persistTracked(): DataFrame = GraftStorage.persisted(df)
  }

  /** Release every block graft pinned. Call once the returned DataFrames
    * have been consumed; results not yet materialized recompute from
    * source afterwards (correct, just uncached).
    */
  def clear(spark: SparkSession): Unit = {
    var d = tracked.poll()
    while (d != null) { d.unpersist(blocking = false); d = tracked.poll() }
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
