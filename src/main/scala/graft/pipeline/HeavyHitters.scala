package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact φ-heavy hitters in two bounded-memory scans — the scalable
  * answer to "which items exceed 1/k of the corpus?" when the item
  * domain is too large to groupBy.
  *
  * The naive plan (`groupBy(item).count.having(cnt·k > n)`) shuffles the
  * ENTIRE distinct item domain — at 100 TB of tokens that is the
  * vocabulary of the web, most of which is hapax noise that can never be
  * a heavy hitter. The two-phase plan shuffles only CANDIDATES:
  *
  *   1. one scan runs Misra–Gries with `k-1` counters per partition
  *      (`O(k)` memory, no shuffle) and emits each partition's surviving
  *      keys — at most `k-1` rows per partition;
  *   2. one scan recounts exactly, map-side-filtered to the broadcast
  *      candidate set, so the aggregate's shuffle is ≤ candidates ×
  *      partitions rows regardless of domain size.
  *
  * No false negatives, provably: if `count(x) > n/k` globally then by
  * ratio-pigeonhole some partition has `count_p(x) > n_p/k`, and
  * Misra–Gries with `k-1` counters undercounts by at most `n_p/k`, so
  * `x` survives phase 1 there (Misra & Gries 1982; merged-summary view in
  * Agarwal et al., "Mergeable Summaries", PODS'12). False positives are
  * killed by the exact phase-2 recount, so the OUTPUT is exact and
  * deterministic under any partitioning / retry / input order — asserted
  * against the one-shuffle naive plan in `HeavyHittersSpec`.
  */
object HeavyHitters {

  /** Phase 1: per-partition Misra–Gries survivor keys (see object doc).
    * Deterministic as a SET for a fixed partitioning; the downstream
    * exact recount makes the final result partitioning-independent.
    */
  def candidates(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(k >= 2, s"k must be >= 2, got $k")
    df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull).as[String]
      .mapPartitions { it =>
        val m = k - 1
        val ctr = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { x =>
          ctr.get(x) match {
            case Some(c)                 => ctr(x) = c + 1
            case None if ctr.size < m    => ctr(x) = 1L
            case None                    => // full: decrement-all, drop zeros
              ctr.keys.toArray.foreach { y =>
                val c = ctr(y) - 1
                if (c == 0L) ctr.remove(y) else ctr(y) = c
              }
          }
        }
        ctr.keysIterator
      }.toDF("item").distinct()
  }

  /** Exact heavy hitters: `(item, cnt, share)` for every item with
    * `count > n/k` (strict), `share = cnt/n` as an exact-integer-ratio
    * IEEE divide. Null items are excluded from both the items and `n`.
    */
  def exact(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val items = df.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
    val total = items.agg(count(lit(1)).as("__n"))
    items
      .join(broadcast(candidates(df, itemCol, k)), Seq("item"), "left_semi")
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(total))              // 1-row corpus-total broadcast
      .filter(col("cnt") * k > col("__n")) // exact integer compare
      .select(col("item"), col("cnt"),
        (col("cnt").cast("double") / col("__n").cast("double")).as("share"))
  }
}
