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
  *      exact Dataset handle it cached UNDER ITS OWNING SparkSession;
  *   2. the session owner calls [[clear]] after CONSUMING each result —
  *      between queries in a harness, per job in production.
  *
  * Tracking is scoped PER SESSION: `clear(a)` unpersists only handles
  * created through session `a`, so two sessions of the same context
  * (`spark.newSession()`, or a streaming query beside a batch query)
  * can interleave persists without cross-releasing each other's tracked
  * caches.
  *
  * The checkpoint sweep is the one deliberately CONTEXT-wide step:
  * after the handle walk, [[clear]] sweeps `sc.getPersistentRDDs` for
  * the RDD-level local checkpoints the iterative graph/clustering loops
  * leave behind (those never enter the CacheManager, so the handle walk
  * cannot see them — and Spark does not attribute RDDs to sessions).
  * In a multi-session deployment pass `sweepCheckpoints = false` from
  * all but the context-owning caller, or accept that checkpointed
  * loop state (which is consumed within each library call anyway)
  * recomputes if another session races the sweep.
  */
object GraftStorage {
  private val tracked = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]]()

  /** `df.persist(MEMORY_AND_DISK)`, recorded for a later [[clear]]. */
  private[graft] def persisted(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    tracked.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()).add(p)
    p
  }

  /** How many persisted handles are currently tracked across all
    * sessions (spec/debug aid).
    */
  def trackedCount: Int = {
    var n = 0
    tracked.forEach((_, q) => n += q.size())
    n
  }

  /** Tracked handles owned by one session. */
  def trackedCount(spark: SparkSession): Int = {
    val q = tracked.get(spark)
    if (q == null) 0 else q.size()
  }

  /** Postfix form: `df.persistTracked()` ≡ [[persisted]] — keeps the
    * call sites chainable where `.persist(level)` used to sit.
    */
  implicit class Syntax(private val df: DataFrame) extends AnyVal {
    private[graft] def persistTracked(): DataFrame = GraftStorage.persisted(df)
  }

  /** Release every block graft pinned through `spark`. Call once the
    * returned DataFrames have been consumed; results not yet
    * materialized recompute from source afterwards (correct, just
    * uncached). Handles tracked by OTHER sessions are untouched;
    * `sweepCheckpoints` additionally drops the context-wide local
    * checkpoints (see class doc for the multi-session contract).
    */
  def clear(spark: SparkSession, sweepCheckpoints: Boolean = true): Unit = {
    val q = tracked.remove(spark)
    if (q != null) {
      var d = q.poll()
      while (d != null) { d.unpersist(blocking = false); d = q.poll() }
    }
    if (sweepCheckpoints)
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
  }
}
