package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** STREAMING threshold counters — the streaming twin of
  * [[graft.pipeline.HeavyHitters]]: items arrive on a stream, and an
  * item is announced the MOMENT its cumulative count crosses the
  * threshold, exactly once, with its exact count at the crossing.
  *
  * The batch operator answers "which items exceed n/k?" after two scans;
  * the stream answers the operational version — "tell me WHEN any item
  * gets hot" (trending tokens, hot shuffle keys, abusive senders) —
  * without re-scanning history. State is one 8-byte counter per distinct
  * item key, partitioned by the shuffle like any keyed aggregation and
  * RocksDB-backed ([[StatefulOps.withRocksDbStateStore]]), so memory is
  * bounded per executor regardless of item cardinality; re-delivered
  * batches are absorbed by the state store's exactly-once semantics.
  *
  * Emission contract (asserted in `StreamingCountsSpec`): a crossing row
  * `(item, cnt)` is emitted exactly once per item — on the micro-batch
  * where `cnt` first reaches `threshold` — and never again, no matter
  * how much further the count grows. The changelog is append-mode.
  */
object StreamingCounts {

  final case class ItemRow(item: String)

  /** The crossing announcement: exact cumulative count at the batch
    * where it first reached the threshold.
    */
  final case class Crossing(item: String, cnt: Long)

  private final class ThresholdProcessor(threshold: Long)
      extends StatefulProcessor[String, ItemRow, Crossing] {
    @transient private var cnt: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[ItemRow],
                                 timerValues: TimerValues): Iterator[Crossing] = {
      val before = if (cnt.exists()) cnt.get() else 0L
      val after = before + rows.size
      cnt.update(after)
      if (before < threshold && after >= threshold) Iterator.single(Crossing(key, after))
      else Iterator.empty
    }
  }

  /** Append-mode changelog of items crossing `threshold`, from any
    * streaming (or batch) relation with a string-castable `itemCol`.
    */
  def thresholdCrossings(items: DataFrame, itemCol: String,
                         threshold: Long): Dataset[Crossing] = {
    import items.sparkSession.implicits._
    items.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .as[ItemRow]
      .groupByKey(_.item)
      .transformWithState(new ThresholdProcessor(threshold),
        TimeMode.None(), OutputMode.Append())
  }
}
