package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape
  * (`event_id, ts, user_id, event_type, value, props`). The reference is
  * pure batch (SURVEY.md §2.9) — this is the additive streaming path:
  * watermarked windowed aggregation and stateful sessionization, plus the
  * batch-equivalent transforms so the same logic is oracle-verifiable in
  * batch mode.
  */
object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based stream source over a directory of event parquet files.
    * `readStream` needs an explicit schema, and the harness events parquet
    * has shipped `ts` as both TIMESTAMP(NANOS) and plain `timestamp[us]`
    * across testdata generations — so probe the physical type with a batch
    * footer read, stream with that type, then normalize to session-TZ
    * TIMESTAMP via [[graft.Tables.normalizeTs]] (shared logic + rationale
    * there). The `nanosAsLong` conf is only set when the footer probe
    * rejects a NANOS column — current-format data avoids the documented
    * session-wide side effect.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val tsType =
      try spark.read.parquet(dir).schema("ts").dataType
      catch {
        // three distinct probe outcomes, handled separately (conflating
        // them set nanosAsLong session-wide on a merely-empty directory):
        //  1. NANOS footer rejection → legacy long read, conf flip licensed
        //  2. empty / not-yet-populated dir (normal for a file stream
        //     before the first file lands) → assume the current testdata
        //     encoding, timestamp[us]/NTZ; NO session conf side effect.
        //     If NANOS files later arrive the scan fails loudly rather
        //     than silently reading values 1000x off.
        //  3. anything else (corrupt footer, permissions) → propagate
        case e: Throwable if graft.Tables.isNanosRejection(e) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          LongType
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getMessage).exists(m =>
              m.contains("UNABLE_TO_INFER_SCHEMA") ||
                m.contains("PATH_NOT_FOUND") || m.contains("Path does not exist")) =>
          TimestampNTZType
      }
    val physSchema = StructType(eventSchema.map {
      case f if f.name == "ts" => f.copy(dataType = tsType)
      case f => f
    })
    graft.Tables.normalizeTs(spark.readStream.schema(physSchema).parquet(dir))
  }

  /** Tumbling/sliding windowed counts + sums with a watermark for state
    * eviction — the canonical streaming aggregation. Works on both a
    * streaming and a batch DataFrame (identical plan semantics).
    */
  def windowedAgg(events: DataFrame, windowLen: String = "10 minutes",
                  slide: Option[String] = None,
                  watermark: String = "1 hour"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    val win = slide.fold(window(col("ts"), windowLen))(s => window(col("ts"), windowLen, s))
    src.groupBy(win.as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("cnt"), col("sum_value"))
  }

  /** Stream-stream interval join: each left event pairs with right events
    * of the same user within `(left.ts, left.ts + maxGapMs]`. In streaming
    * mode both sides carry watermarks and the time bound lets Spark evict
    * join state (unbounded state otherwise); in batch mode the same
    * equi-join + range predicate plans as a sort-merge join with a
    * post-join filter — no nested loop.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   maxGapMs: Long = 30L * 60 * 1000,
                   watermark: String = "1 hour",
                   joinType: String = "inner"): DataFrame = {
    val l0 = left.select(col("event_id").as("l_id"), col("ts").as("l_ts"),
      col("user_id").as("l_user"), col("value").as("l_value"))
    val r0 = right.select(col("event_id").as("r_id"), col("ts").as("r_ts"),
      col("user_id").as("r_user"), col("value").as("r_value"))
    val (l, r) =
      if (left.isStreaming) (l0.withWatermark("l_ts", watermark),
        r0.withWatermark("r_ts", watermark))
      else (l0, r0)
    // leftOuter: unmatched left rows emit with null r_id/r_value ONCE the
    // watermark passes their join window (the engine must prove no future
    // right row can match before releasing the null) — so outer results
    // trail the watermark by design; inner results emit immediately
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGapMs MILLISECOND"),
      joinType)
      .select(col("l_id"), col("r_id"), col("l_user").as("user_id"),
        col("l_value"), col("r_value"))
  }

  /** Windowed funnel conversion counts: (click, later-in-gap purchase)
    * pairs per tumbling window of the CLICK time — the streaming form of
    * the batch funnel (`q_funnel`). On streams this CHAINS two stateful
    * operators (stream-stream interval join → windowed aggregate) in one
    * query; the watermark propagates through the join, so downstream
    * windows close deterministically off event time. Batch input runs the
    * identical plan minus watermarks — the oracle-checked twin.
    */
  def funnelCounts(clicks: DataFrame, purchases: DataFrame,
                   maxGapMs: Long = 30L * 60 * 1000,
                   windowLen: String = "1 hour",
                   watermark: String = "1 hour"): DataFrame = {
    val l0 = clicks.select(col("event_id").as("l_id"), col("ts").as("l_ts"),
      col("user_id").as("l_user"))
    val r0 = purchases.select(col("event_id").as("r_id"), col("ts").as("r_ts"),
      col("user_id").as("r_user"))
    val (l, r) =
      if (clicks.isStreaming) (l0.withWatermark("l_ts", watermark),
        r0.withWatermark("r_ts", watermark))
      else (l0, r0)
    l.join(r,
        col("l_user") === col("r_user") &&
          col("r_ts") > col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxGapMs MILLISECOND"))
      .groupBy(window(col("l_ts"), windowLen))
      .agg(count(lit(1)).as("conversions"))
      .select(col("window.start").as("window_start"), col("conversions"))
  }

  /** Streaming exact-dedup on event id: watermarked
    * `dropDuplicatesWithinWatermark`, the training-pipeline ingest guard
    * (at-least-once sources replay events; state for ids older than the
    * watermark is evicted, so state size is bounded by the watermark
    * horizon instead of growing with the stream).
    */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: every streaming event picks up its
    * dimension row. The static side is stateless for the stream (no
    * watermark needed), re-planned each micro-batch (a refreshed dim
    * table is picked up on the next batch — the slowly-changing-dimension
    * idiom), and explicitly broadcast: the 100 TB event stream never
    * shuffles, each executor probes a local hash map.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String,
             joinType: String = "left"): DataFrame =
    events.join(broadcast(dim), Seq(key), joinType)

  /** Continuous CDC merge sink: apply each micro-batch as a latest-wins
    * upsert ([[graft.pipeline.Snapshot.upsert]]) into a generational
    * parquet snapshot — the `foreachBatch` pattern a lakehouse MERGE INTO
    * automates. The caller seeds `dir/gen0`; batch i reads `gen{i}` and
    * writes `gen{i+1}` (alternating generations keep the read and the
    * overwrite on disjoint paths — Spark cannot overwrite a path it is
    * reading). Returns the started query; the highest `gen*` dir is the
    * current snapshot.
    *
    * 100 TB honesty: this rewrites the WHOLE snapshot every batch — right
    * for small/medium dimension tables maintained off a CDC stream; for a
    * fact-sized snapshot, partition the table and rewrite only the
    * partitions a batch touches (or use a table format with real MERGE).
    * The generation counter lives on the driver: single-query ownership,
    * same as any foreachBatch accumulator.
    */
  def mergeStream(updates: DataFrame, dir: String, key: String,
                  version: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val fn: (Dataset[org.apache.spark.sql.Row], Long) => Unit = (batch, _) => {
      val i = gen.get
      val cur = batch.sparkSession.read.parquet(s"$dir/gen$i")
      graft.pipeline.Snapshot.upsert(cur, batch.toDF(), key, version)
        .write.mode("overwrite").parquet(s"$dir/gen${i + 1}")
      gen.incrementAndGet()
      ()
    }
    updates.writeStream
      .option("checkpointLocation", s"$dir/_checkpoint")
      .foreachBatch(fn)
      .start()
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sumValue: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Idle-flush policy for [[sessionize]] — how a user's FINAL session
    * (which no later event will ever close) gets emitted.
    */
  sealed trait IdleFlush extends Serializable
  /** No flush: final sessions stay in state forever. For synchronous test
    * harnesses only (with NO timeouts registered, `processAllAvailable()`
    * drains and returns).
    */
  case object NoIdleFlush extends IdleFlush
  /** DETERMINISTIC flush: a session closes when the WATERMARK passes
    * `session_end + gapMs` — pure event-time, so the same input stream
    * always emits the same sessions regardless of wall-clock scheduling,
    * and the batch twin ([[sessionizeBatch]]) agrees exactly on every
    * closed session. The stream must carry enough later traffic to advance
    * the watermark (true of any live pipeline).
    */
  case object EventTimeIdleFlush extends IdleFlush
  /** Legacy wall-clock flush: emits after `ms` of processing-time idleness
    * even if the watermark never advances (e.g. the topic goes silent
    * forever). Emission timing is wall-clock-dependent — prefer
    * [[EventTimeIdleFlush]] unless stalled-watermark flush is required.
    */
  final case class ProcessingTimeIdleFlush(ms: Long) extends IdleFlush

  /** Gap-based sessionization with `flatMapGroupsWithState` — custom
    * per-key state: a session closes when a later event of the same user
    * exceeds `gapMs`, or per the `idleFlush` policy (default: event-time,
    * watermark-driven — deterministic emission).
    *
    * `watermarkDelay` applies only to the event-time policy (how much
    * event-time disorder to tolerate before advancing the clock).
    *
    * BATCH CAVEAT: on a non-streaming Dataset there is no watermark, so
    * `EventTimeIdleFlush` degrades to `NoIdleFlush` — each user's still-open
    * FINAL session is never emitted (a warning is logged). For batch input
    * use [[sessionizeBatch]], which emits every session including the last.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30L * 60 * 1000,
                 idleFlush: IdleFlush = EventTimeIdleFlush,
                 watermarkDelay: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    if (idleFlush == EventTimeIdleFlush && !events.isStreaming)
      org.slf4j.LoggerFactory.getLogger("graft.EventStream")
        .warn("sessionize(EventTimeIdleFlush) on batch input: no watermark exists, " +
          "so final open sessions are NOT emitted — use sessionizeBatch for batch data")
    val timeoutConf = idleFlush match {
      case EventTimeIdleFlush => GroupStateTimeout.EventTimeTimeout()
      case ProcessingTimeIdleFlush(_) => GroupStateTimeout.ProcessingTimeTimeout()
      case NoIdleFlush => GroupStateTimeout.NoTimeout()
    }
    val src = idleFlush match {
      // event-time timeouts are fired by watermark advancement, so the
      // source must carry one (batch mode has no watermark: timeouts
      // simply never fire there, matching NoIdleFlush semantics)
      case EventTimeIdleFlush if events.isStreaming => events.withWatermark("ts", watermarkDelay)
      case _ => events
    }
    // captured as a plain boolean: batch runs expose no watermark, so the
    // state-function must not touch the event-time timeout APIs there
    val streaming = events.isStreaming
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle past the gap: flush the open session and clear state
            val st = state.get
            state.remove()
            Iterator.single(Session(userId, new java.sql.Timestamp(st.start),
              new java.sql.Timestamp(st.last), st.n, st.sumValue))
          } else {
            // batch-per-trigger events arrive unordered within the group
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var st = state.getOption.orNull
            for (e <- sorted) {
              val t = e.ts.getTime
              if (st == null) st = SessionState(t, t, 1, e.value)
              else if (t - st.last > gapMs) {
                out += Session(userId, new java.sql.Timestamp(st.start),
                  new java.sql.Timestamp(st.last), st.n, st.sumValue)
                st = SessionState(t, t, 1, e.value)
              } else st = st.copy(last = t, n = st.n + 1, sumValue = st.sumValue + e.value)
            }
            if (st != null) {
              state.update(st)
              idleFlush match {
                case EventTimeIdleFlush if streaming =>
                  // close when the event-time clock passes last + gap; the
                  // registered timestamp must sit above the current
                  // watermark (late groups would otherwise throw)
                  state.setTimeoutTimestamp(
                    math.max(st.last + gapMs, state.getCurrentWatermarkMs() + 1))
                case EventTimeIdleFlush => ()
                case ProcessingTimeIdleFlush(ms) => state.setTimeoutDuration(ms)
                case NoIdleFlush => ()
              }
            }
            out.iterator
          }
      }
  }

  /** Batch sessionization with a window function — same gap semantics,
    * oracle-verifiable (SQL window functions exist in DuckDB too).
    */
  def sessionizeBatch(events: DataFrame, gapMs: Long = 30L * 60 * 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val withGap = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts"))) > gapMs, 1L).otherwise(0L))
      .withColumn("session_no", sum(col("new_session")).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap.groupBy(col("user_id"), col("session_no"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
  }
}
