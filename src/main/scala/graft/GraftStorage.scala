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
  * Because the sweep cannot distinguish sessions, [[clear]] SKIPS it
  * automatically whenever another session still holds tracked handles —
  * a multi-session deployment never cross-releases by default; the last
  * session to clear performs the sweep. Abandoned sessions don't leak:
  * keys are weak (an unreferenced session with an EMPTY queue collects),
  * and every [[persisted]] call prunes entries whose SparkContext has
  * stopped — necessary because a queued Dataset strongly references its
  * session through the queue, so weak keys alone cannot collect a
  * session that still holds tracked handles.
  */
object GraftStorage {
  // weak keys: the registry must never be the thing keeping a forgotten
  // SparkSession (and its queued Dataset handles) reachable.
  // Collections.synchronizedMap covers the default-method compute* too
  // (overridden in SynchronizedMap since Java 8); iteration synchronizes
  // on the map per its contract.
  private val tracked = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[
      SparkSession, java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]]())

  /** `df.persist(MEMORY_AND_DISK)`, recorded for a later [[clear]]. */
  private[graft] def persisted(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    pruneStopped()
    tracked.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()).add(p)
    p
  }

  /** Drop entries whose SparkContext has stopped: their blocks are gone
    * with the executors, and a queued Dataset strongly references its
    * session THROUGH the queue (value→key), so the weak keys alone can't
    * collect a session that still has tracked handles — this prune is
    * what actually releases an abandoned-and-stopped session's queue.
    */
  private def pruneStopped(): Unit = tracked.synchronized {
    val it = tracked.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey != null && e.getKey.sparkContext.isStopped) it.remove()
    }
  }

  /** How many persisted handles are currently tracked across all
    * sessions (spec/debug aid).
    */
  def trackedCount: Int = tracked.synchronized {
    var n = 0
    tracked.forEach((_, q) => n += q.size())
    n
  }

  /** Tracked handles owned by one session. */
  def trackedCount(spark: SparkSession): Int = {
    val q = tracked.get(spark)
    if (q == null) 0 else q.size()
  }

  /** Does any session OTHER than `spark` currently hold tracked handles?
    * (The context-wide checkpoint sweep defers to them — see [[clear]].)
    */
  private def othersTracking(spark: SparkSession): Boolean = tracked.synchronized {
    var found = false
    tracked.forEach((s, q) => if (!(s eq spark) && !q.isEmpty) found = true)
    found
  }

  /** Postfix form: `df.persistTracked()` ≡ [[persisted]] — keeps the
    * call sites chainable where `.persist(level)` used to sit.
    */
  implicit class Syntax(private val df: DataFrame) extends AnyVal {
    private[graft] def persistTracked(): DataFrame = GraftStorage.persisted(df)
  }

  /** Release the RDD blocks behind an eagerly `localCheckpoint`ed
    * Dataset the moment its round is superseded, instead of letting
    * every round of an iterative loop stay pinned until the next
    * [[clear]] sweep (a library caller that never clears would
    * accumulate one checkpoint per round per invocation). GUARDED to
    * the checkpoint shape: it unpersists ONLY when the plan is exactly
    * one `LogicalRDD` leaf (what `localCheckpoint(true)` returns) — a
    * derived DataFrame whose plan merely EMBEDS a still-live checkpoint
    * leaf is a no-op, because local checkpoints truncate lineage and
    * unpersisting a live one behind its consumers would fail them with
    * "checkpoint block not found" (ADVICE r9 #3). Non-checkpoint plans
    * are a safe no-op.
    */
  private[graft] def releaseCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Run `f` and release every block graft pinned through `spark` on
    * exit (normal OR exceptional) — the SCOPED form of the [[clear]]
    * contract, for library callers composing graft entry points
    * (`candidatePairs`/`topK`/`earliestArrival`/… pin relations their
    * lazy results reference): forgetting the manual `clear` leaks pinned
    * blocks for the session; this helper cannot forget. The returned
    * value must be CONSUMED (collected / written / aggregated) inside
    * `f` — a lazy DataFrame escaping the scope recomputes its pinned
    * inputs from source (correct, just uncached). Scopes on one session
    * should nest, not interleave: exit releases whatever the session
    * tracks at that moment.
    */
  def withTracked[T](spark: SparkSession)(f: => T): T =
    try f finally clear(spark)

  /** Release every block graft pinned through `spark`. Call once the
    * returned DataFrames have been consumed; results not yet
    * materialized recompute from source afterwards (correct, just
    * uncached). Handles tracked by OTHER sessions are untouched;
    * `sweepCheckpoints` additionally drops the context-wide local
    * checkpoints — but the sweep AUTO-SKIPS while any other session
    * still holds tracked handles (it cannot tell whose RDDs are whose,
    * and unpersisting a sibling session's live cache behind its back is
    * worse than letting loop checkpoints wait for the last clear).
    */
  def clear(spark: SparkSession, sweepCheckpoints: Boolean = true): Unit = {
    val q = tracked.remove(spark)
    if (q != null) {
      var d = q.poll()
      while (d != null) { d.unpersist(blocking = false); d = q.poll() }
    }
    if (sweepCheckpoints && !othersTracking(spark))
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
  }
}
