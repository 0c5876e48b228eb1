package graft

import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, Session}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int) = new java.sql.Timestamp(1704067200000L + minute * 60000L)

  private val events = Seq(
    Event(1L, ts(0), 10L, "click", 1.0),
    Event(2L, ts(5), 10L, "click", 2.0),
    Event(3L, ts(50), 10L, "view", 3.0),   // 45-min gap → new session
    Event(4L, ts(2), 20L, "purchase", 4.0))

  test("streaming windowed agg with watermark emits per-window counts") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val agg = EventStream.windowedAgg(
      mem.toDF().withColumn("props", lit("{}")), windowLen = "10 minutes")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_agg").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").getTime / 60000 % 1440,
        r.getAs[String]("event_type"), r.getAs[Long]("cnt"), r.getAs[Double]("sum_value")))
      .toSet
    val base = 1704067200000L / 60000 % 1440
    assert(rows === Set(
      (base, "click", 2L, 3.0),
      ((base + 50) % 1440, "view", 1L, 3.0),
      (base, "purchase", 1L, 4.0)))
  }

  test("streaming SLIDING windowed agg: each event lands in window/slide windows") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val agg = EventStream.windowedAgg(
      mem.toDF().withColumn("props", lit("{}")),
      windowLen = "10 minutes", slide = Some("5 minutes"))
    val q = agg.writeStream.format("memory").queryName("win_slide")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_slide").collect()
    // 10m/5m → every event is in exactly 2 windows: per-type cnt doubles
    val byType = rows.groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(_.getAs[Long]("cnt")).sum).toMap
    assert(byType === Map("click" -> 4L, "view" -> 2L, "purchase" -> 2L))
    // the two click events (minute 0 and 5) share exactly one window
    assert(rows.count(r => r.getAs[String]("event_type") == "click" &&
      r.getAs[Long]("cnt") == 2L) === 1)
  }

  test("stream-stream interval join pairs clicks with later in-window purchases") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    clicks.addData(Event(1L, ts(0), 10L, "click", 1.0), Event(2L, ts(40), 10L, "click", 2.0))
    purchases.addData(Event(9L, ts(3), 10L, "purchase", 9.0))
    val joined = EventStream.intervalJoin(
      clicks.toDF().withColumn("props", lit("{}")),
      purchases.toDF().withColumn("props", lit("{}")))
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("ij_out").collect()
      .map(r => (r.getAs[Long]("l_id"), r.getAs[Long]("r_id"))).toSet
    // click@0 pairs with purchase@3 (within 30 min); click@40 does not
    assert(pairs === Set((1L, 9L)))
  }

  test("LEFT OUTER interval join releases null-padded rows only after the watermark proves no match") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    clicks.addData(Event(1L, ts(0), 10L, "click", 1.0),   // will match purchase@3
      Event(2L, ts(1), 20L, "click", 2.0))                // never matches
    purchases.addData(Event(9L, ts(3), 10L, "purchase", 9.0))
    val joined = EventStream.intervalJoin(
      clicks.toDF().withColumn("props", lit("{}")),
      purchases.toDF().withColumn("props", lit("{}")),
      watermark = "10 minutes", joinType = "leftOuter")
    val q = joined.writeStream.format("memory").queryName("ij_outer")
      .outputMode("append").start()
    q.processAllAvailable()
    // inner match emits; the unmatched click@1 is still HELD — the
    // watermark hasn't passed its join window, a matching purchase could
    // still arrive
    val early = spark.table("ij_outer").collect()
      .map(r => (r.getAs[Long]("l_id"), Option(r.get(1)))).toSet
    assert(early === Set((1L, Some(9L))))
    // late traffic advances the watermark past click@1's window (1 + 30min
    // gap + 10min delay) → the engine can prove no-match and emits the
    // null-padded row
    purchases.addData(Event(99L, ts(120), 30L, "purchase", 1.0))
    clicks.addData(Event(98L, ts(120), 31L, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("ij_outer").collect()
      .map(r => (r.getAs[Long]("l_id"), Option(r.get(1)))).toSet
    assert(all === Set((1L, Some(9L)), (2L, None)))
  }

  test("funnelCounts chains stream-stream join into a windowed agg; matches its batch twin") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val cEvents = Seq(
      Event(1L, ts(0), 10L, "click", 1.0),   // converts (purchase@5)
      Event(2L, ts(2), 20L, "click", 1.0),   // converts (purchase@20)
      Event(3L, ts(65), 10L, "click", 1.0))  // hour 2, no purchase in gap
    val pEvents = Seq(
      Event(8L, ts(5), 10L, "purchase", 5.0),
      Event(9L, ts(20), 20L, "purchase", 5.0))
    clicks.addData(cEvents: _*)
    purchases.addData(pEvents: _*)
    val q = EventStream.funnelCounts(clicks.toDF(), purchases.toDF(),
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    // advance the watermark far past hour 1 so its window closes
    clicks.addData(Event(99L, ts(300), 30L, "click", 1.0))
    purchases.addData(Event(98L, ts(300), 31L, "purchase", 1.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("funnel_stream").collect()
      .map(r => r.getAs[java.sql.Timestamp](0).getTime -> r.getAs[Long](1)).toMap
    // hour-1 window: clicks 1 and 2 both converted
    assert(streamed === Map(1704067200000L -> 2L))
    // batch twin on the same data agrees
    val batch = EventStream.funnelCounts(
        cEvents.toDF(), pEvents.toDF())
      .collect().map(r => r.getAs[java.sql.Timestamp](0).getTime -> r.getAs[Long](1)).toMap
    assert(batch === Map(1704067200000L -> 2L))
  }

  test("streaming dedup drops watermark-window duplicate event ids") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    // event 1 replayed twice (at-least-once source), event 2 once
    mem.addData(events(0), events(0), events(1), events(0))
    val q = EventStream.dedupStream(mem.toDF().withColumn("props", lit("{}")))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_out").collect().map(_.getAs[Long]("event_id")).toSeq
    assert(ids.sorted === Seq(1L, 2L))
  }

  test("native session_window works on a stream and matches its batch run") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
      .select(col("user_id"), col("sw.start").as("s"), col("n"), col("sv"))
    val q = agg(mem.toDF()).writeStream.format("memory").queryName("sess_win")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    def toSet(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("s").getTime,
        r.getAs[Long]("n"), r.getAs[Double]("sv"))).toSet
    val streamed = toSet(spark.table("sess_win").collect())
    val batch = toSet(agg(events.toDF()).collect())
    assert(streamed === batch)
    // the 45-min gap split: user 10 has two sessions
    assert(streamed.count(_._1 == 10L) === 2)
  }

  test("stateful sessionize (flatMapGroupsWithState) matches batch sessionize") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    // idle flush off: this test pins the pure gap-close semantics
    // (processing-time timeouts would also hang processAllAvailable)
    val sessions = EventStream.sessionize(mem.toDS(), gapMs = 30L * 60 * 1000,
      idleFlush = EventStream.NoIdleFlush)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    // append mode emits only CLOSED sessions (user 10's first: events 1,2)
    val closed = spark.table("sessions").as[Session].collect()
    assert(closed.map(s => (s.user_id, s.n_events, s.sum_value)).toSet ===
      Set((10L, 2L, 3.0)))

    // batch variant sees everything: 3 sessions total
    val batch = EventStream.sessionizeBatch(
      events.toDF().withColumn("props", lit("{}")), gapMs = 30L * 60 * 1000)
    val b = batch.collect().map(r => (r.getAs[Long]("user_id"),
      r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(b === Set((10L, 2L, 3.0), (10L, 1L, 3.0), (20L, 1L, 4.0)))
  }

  test("sessionize(EventTimeIdleFlush) on BATCH input: final open sessions are NOT emitted (documented divergence)") {
    // batch Datasets have no watermark, so the event-time flush degrades to
    // NoIdleFlush — only gap-CLOSED sessions come out (the sessionize
    // scaladoc's BATCH CAVEAT; sessionizeBatch is the batch-correct twin)
    val out = EventStream.sessionize(events.toDS(),
        gapMs = 30L * 60 * 1000, idleFlush = EventStream.EventTimeIdleFlush)
      .collect().map(s => (s.user_id, s.n_events, s.sum_value)).toSet
    assert(out === Set((10L, 2L, 3.0))) // users' final sessions absent
    val batchTwin = EventStream.sessionizeBatch(
        events.toDF().withColumn("props", lit("{}")), gapMs = 30L * 60 * 1000)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
    assert(batchTwin === Set((10L, 2L, 3.0), (10L, 1L, 3.0), (20L, 1L, 4.0)))
  }

  test("event-time idle flush emits final sessions deterministically via the watermark") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val sessions = EventStream.sessionize(mem.toDS(), gapMs = 30L * 60 * 1000,
      idleFlush = EventStream.EventTimeIdleFlush)
    val q = sessions.writeStream.format("memory").queryName("sessions_et")
      .outputMode("append").start()
    q.processAllAvailable()
    // batch 1: user 10's first session closes by gap; watermark reaches 50min,
    // which already passes user 20's last+gap (2+30) → its session flushes on
    // the watermark-advance batch. user 10's open session (last=50) does not.
    val afterBatch1 = spark.table("sessions_et").as[Session].collect()
      .map(s => (s.user_id, s.n_events, s.sum_value)).toSet
    assert(afterBatch1 === Set((10L, 2L, 3.0), (20L, 1L, 4.0)))

    // a later event (any user) advances the watermark past 50+30 → user 10's
    // final session flushes; emission depends ONLY on event time, never on
    // wall-clock scheduling
    mem.addData(Event(5L, ts(120), 30L, "click", 7.0))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("sessions_et").as[Session].collect()
      .map(s => (s.user_id, s.n_events, s.sum_value)).toSet
    assert(all === Set((10L, 2L, 3.0), (20L, 1L, 4.0), (10L, 1L, 3.0)))
  }

  test("stream-static enrichment join broadcasts the dim; unmatched keys keep null") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val dim = Seq((10L, "gold"), (99L, "silver")).toDF("user_id", "segment")
    val q = EventStream.enrich(mem.toDF(), dim, "user_id")
      .select("event_id", "segment")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enriched").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows === Map(1L -> Some("gold"), 2L -> Some("gold"),
      3L -> Some("gold"), 4L -> None))
  }

  test("mergeStream: micro-batch CDC upserts converge to the batch upsert; stale rows lose") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_merge").toString
    Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "text", "version")
      .write.parquet(s"$dir/gen0")
    val mem = MemoryStream[(Long, String, Long)]
    val q = EventStream.mergeStream(
      mem.toDF().toDF("id", "text", "version"), dir, "id", "version")
    mem.addData((2L, "b2", 2L), (3L, "c", 1L))
    q.processAllAvailable()
    mem.addData((2L, "b3", 3L), (1L, "a0", 0L)) // a0 is STALE — must not clobber
    q.processAllAvailable()
    q.stop()
    val latest = new java.io.File(dir).list().filter(_.startsWith("gen"))
      .map(_.drop(3).toInt).max
    assert(latest === 2) // one generation per non-empty micro-batch
    val snap = spark.read.parquet(s"$dir/gen$latest").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(snap === Map(
      1L -> (("a", 1L)), 2L -> (("b3", 3L)), 3L -> (("c", 1L))))
  }

  test("read probes the harness events file's physical ts encoding and streams it") {
    // the REAL driver-generated file (currently timestamp[us]/NTZ; was
    // TIMESTAMP(NANOS) in earlier generations) — the streaming twin of the
    // TablesSpec guard for the schema-adaptive read
    // the file stream source requires a DIRECTORY — stage the single
    // harness file into one (copy, not symlink: globbing follows links
    // inconsistently across Hadoop FS versions)
    // skip (not error) when driver-generated testdata is absent
    assume(new java.io.File("/root/testdata/sf0.001/events.parquet").isFile)
    val dir = java.nio.file.Files.createTempDirectory("events_probe")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val df = EventStream.read(spark, dir.toString)
    assert(df.isStreaming)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val q = EventStream.windowedAgg(df, windowLen = "1 hour")
      .writeStream.format("memory").queryName("probe_agg")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("probe_agg").collect()
    assert(rows.nonEmpty)
    // sane event-time windows (a wrong unit conversion lands decades off)
    val yr = rows.map(_.getAs[java.sql.Timestamp]("window_start"))
      .map(_.toLocalDateTime.getYear)
    assert(yr.forall(y => y >= 2000 && y <= 2100))
  }

  test("read on an empty stream directory defaults to NTZ without touching the nanos conf") {
    // an empty (not-yet-populated) directory is NORMAL for a file stream;
    // the probe must neither fail nor flip the session-wide nanosAsLong
    val dir = java.nio.file.Files.createTempDirectory("events_empty")
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    val df = EventStream.read(spark, dir.toString)
    assert(df.isStreaming)
    // NTZ assumed, then normalized to session-TZ TIMESTAMP
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(spark.conf.getOption(key) == before)
  }
}
