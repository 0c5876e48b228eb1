package graft

import graft.pipeline.Dedup
import graft.streaming.{StatefulOps, StreamingCounts, StreamingDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BATCH-EQUIVALENCE gate for the streaming surface (r10 verdict
  * task 5): each streaming operator runs over the STATIC testdata
  * corpus through a real file-source stream (multi-microbatch — new
  * files discovered per trigger), drains, and the result is compared
  * EXACTLY against its batch twin. This upgrades the house convention
  * from "spec-gated" (MemoryStream toy corpora pin semantics) to
  * "equivalence-gated" (the streaming path provably computes what the
  * batch path computes on the same data):
  *
  *   - StreamingDedup.candidates      ≡ Dedup.lshCandidates
  *   - StreamingDedup.candidatesCdc   ≡ Dedup.lshCandidates(stored) ∪
  *       Dedup.incrementalLshCandidates(lshIndexAfterChanges(…), adds)
  *   - StreamingCounts.thresholdCrossings ≡ the batch count-threshold
  *       filter (item set exact; per-item cnt bounded by
  *       [threshold, total] — the crossing batch's cumulative count is
  *       the one legitimately batching-dependent field)
  */
class StreamingEquivalenceSpec extends SparkTestBase {
  import spark.implicits._

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    StatefulOps.withRocksDbStateStore(spark)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_seq_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("file-source streaming candidates ≡ batch lshCandidates on the sf0.001 corpus") {
    withRocksDb {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text"))
      val src = tmpDir("cand")
      // 4 parquet files + maxFilesPerTrigger=1 → ≥4 microbatches; add
      // order is irrelevant for the drained pair SET (each pair emits
      // when its later member arrives, whichever that is)
      docs.repartition(4).write.mode("overwrite").parquet(src)
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val q = StreamingDedup.candidates(stream)
        .writeStream.format("memory").queryName("seq_cand")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val streamed = pairSet(spark.table("seq_cand"))
        val batch = pairSet(Dedup.lshCandidates(Dedup.minhashSignatures(docs)))
        assert(batch.nonEmpty, "vacuous premise: the corpus must contain near-dups")
        assert(streamed === batch,
          s"stream ${streamed.size} pairs vs batch ${batch.size}")
      } finally q.stop()
    }
  }

  test("file-source streaming candidatesCdc ≡ batch index CDC (stored → deletes → adds)") {
    withRocksDb {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text"))
      val stored = docs.filter(col("doc_id") % 10 =!= 7)
      val adds = docs.filter(col("doc_id") % 10 === 7)
      val deleted = stored.filter(col("doc_id") % 10 === 8)

      val src = tmpDir("cdc")
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("is_delete",
          org.apache.spark.sql.types.BooleanType)))
      def emit(df: DataFrame, del: Boolean): Unit =
        df.select(col("doc_id"), col("text"), lit(del).as("is_delete"))
          .coalesce(1).write.mode("append").parquet(src)

      emit(stored, del = false)
      val stream = spark.readStream.schema(schema).parquet(src)
      val q = StreamingDedup.candidatesCdc(stream)
        .writeStream.format("memory").queryName("seq_cdc")
        .outputMode("append").start()
      try {
        q.processAllAvailable()             // b1: the stored corpus
        emit(deleted, del = true)           // b2: tombstones (before-image text)
        q.processAllAvailable()
        emit(adds, del = false)             // b3: the ingest delta
        q.processAllAvailable()
        val streamed = pairSet(spark.table("seq_cdc"))

        // batch twin: stored-corpus pairs ∪ delta pairs against the
        // post-CDC index (deletes applied, adds present)
        val storedIdx = Dedup.bandKeyIndex(Dedup.minhashSignatures(stored))
        val addsIdx = Dedup.bandKeyIndex(Dedup.minhashSignatures(adds))
        val after = Dedup.lshIndexAfterChanges(storedIdx, addsIdx,
          deleted.select(col("doc_id").as("id")))
        val expected =
          pairSet(Dedup.lshCandidates(Dedup.minhashSignatures(stored))) ++
            pairSet(Dedup.incrementalLshCandidates(after, addsIdx))
        assert(expected.nonEmpty, "vacuous premise: CDC scenario emits no pairs")
        // the erasure property, batch and stream alike: no post-delete
        // pair touches a deleted doc
        val deletedIds = deleted.select("doc_id").as[Long].collect().toSet
        val b1 = pairSet(Dedup.lshCandidates(Dedup.minhashSignatures(stored)))
        (streamed -- b1).foreach { case (a, b) =>
          assert(!deletedIds.contains(a) && !deletedIds.contains(b),
            s"pair ($a,$b) emitted after the tombstone batch touches a deleted doc")
        }
        assert(streamed === expected,
          s"stream ${streamed.size} pairs vs batch ${expected.size}")
      } finally q.stop()
    }
  }

  // ---- the event-time surface (r11 verdict task 7): every public
  // EventStream / StatefulOps op gets the same file-source-stream-vs-
  // batch-twin treatment. Events are emitted in TIME-SLICED files
  // (ntile over ts) with a drain between slices, so cross-batch arrival
  // is time-ordered — the realistic stream shape, and the one where a
  // watermark never drops data the batch twin saw.

  private lazy val batchEvents: DataFrame =
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value")

  private lazy val maxTsMs: Long = batchEvents
    .agg(max(unix_millis(col("ts")))).head().getLong(0)

  /** Write `df` into `src` as `slices` time-ordered files, calling
    * `drain()` after each so every slice is its own micro-batch wave.
    */
  private def emitTimeSliced(df: DataFrame, src: String, slices: Int)
                            (drain: () => Unit): Unit = {
    import org.apache.spark.sql.expressions.Window
    val sliced = df.withColumn("_sl",
      ntile(slices).over(Window.orderBy(col("ts"), col("event_id"))))
    (1 to slices).foreach { i =>
      sliced.filter(col("_sl") === i).drop("_sl")
        .coalesce(1).write.mode("append").parquet(src)
      drain()
    }
  }

  test("file-source streaming windowedAgg ≡ batch windows below the final watermark") {
    val src = tmpDir("wagg")
    batchEvents.limit(0).write.mode("overwrite").parquet(src) // seed schema
    val stream = graft.streaming.EventStream.read(spark, src)
    val q = graft.streaming.EventStream.windowedAgg(stream,
        windowLen = "1 day", watermark = "0 seconds")
      .writeStream.format("memory").queryName("seq_wagg")
      .outputMode("append").start()
    try {
      emitTimeSliced(batchEvents.withColumn("props", lit("{}")), src, 4)(
        () => q.processAllAvailable())
      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime,
          r.getString(2), r.getLong(3), r.getDouble(4))
      val streamed = spark.table("seq_wagg").collect().map(key).toSet
      // append mode emits exactly the windows the final watermark
      // (maxTs − 0s) closed; the in-flight last window stays open
      val batch = graft.streaming.EventStream.windowedAgg(
        batchEvents, windowLen = "1 day").collect().map(key).toSet
      val expected = batch.filter(_._2 <= maxTsMs)
      assert(expected.nonEmpty && expected.size < batch.size,
        "vacuous premise: the watermark must split closed from open windows")
      assert(streamed === expected,
        s"stream ${streamed.size} windows vs expected ${expected.size}")
    } finally q.stop()
  }

  test("file-source streaming sessionize ≡ sessionizeBatch on watermark-closed sessions (sum exact-tolerant)") {
    import spark.implicits._
    import graft.streaming.EventStream
    val gapMs = 6L * 3600 * 1000
    val src = tmpDir("sess")
    batchEvents.limit(0).write.mode("overwrite").parquet(src)
    val stream = EventStream.read(spark, src)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    val q = EventStream.sessionize(stream, gapMs = gapMs,
        idleFlush = EventStream.EventTimeIdleFlush,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("seq_sess")
      .outputMode("append").start()
    try {
      emitTimeSliced(batchEvents.withColumn("props", lit("{}")), src, 4)(
        () => q.processAllAvailable())
      def key(u: Long, s: java.sql.Timestamp, e: java.sql.Timestamp, n: Long) =
        (u, s.getTime, e.getTime, n)
      val streamed = spark.table("seq_sess").as[EventStream.Session].collect()
        .map(s => key(s.user_id, s.session_start, s.session_end, s.n_events) ->
          s.sum_value).toMap
      // the watermark (maxTs) closes every session with last + gap
      // below it — users still inside their final gap stay open
      val batch = EventStream.sessionizeBatch(
          batchEvents.withColumn("props", lit("{}")), gapMs = gapMs)
        .collect()
        .map(r => key(r.getAs[Long]("user_id"),
          r.getAs[java.sql.Timestamp]("session_start"),
          r.getAs[java.sql.Timestamp]("session_end"),
          r.getAs[Long]("n_events")) -> r.getAs[Double]("sum_value")).toMap
      val expected = batch.filter { case ((_, _, end, _), _) => end + gapMs < maxTsMs }
      assert(expected.nonEmpty && expected.size < batch.size,
        "vacuous premise: the watermark must split closed from open sessions")
      assert(streamed.keySet === expected.keySet,
        s"stream ${streamed.size} sessions vs expected ${expected.size}")
      // multi-event sessions must exist or the gap logic is untested
      assert(expected.keys.exists(_._4 > 1L), "vacuous premise: all sessions single-event")
      // sum_value: the stream folds doubles in time order, the batch
      // twin sums decimal-exact — identical up to the double fold's
      // last-ulp (the documented streaming determinism contract)
      streamed.foreach { case (k, sv) =>
        assert(math.abs(sv - expected(k)) <= 1e-9 * math.max(1.0, math.abs(expected(k))),
          s"session $k sum $sv vs batch ${expected(k)}")
      }
    } finally q.stop()
  }

  test("file-source stream-stream intervalJoin ≡ batch interval join (inner, exact)") {
    val src = tmpDir("ivj")
    batchEvents.limit(0).write.mode("overwrite").parquet(src)
    import graft.streaming.EventStream
    val gapMs = 6L * 3600 * 1000
    def sides(df: DataFrame) = (df.filter(col("event_type") === "click"),
      df.filter(col("event_type") === "purchase"))
    val (lc, rp) = sides(EventStream.read(spark, src))
    val q = EventStream.intervalJoin(lc, rp, maxGapMs = gapMs)
      .writeStream.format("memory").queryName("seq_ivj")
      .outputMode("append").start()
    try {
      emitTimeSliced(batchEvents.withColumn("props", lit("{}")), src, 4)(
        () => q.processAllAvailable())
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      val streamed = spark.table("seq_ivj").collect().map(key).toSet
      val (bl, br) = sides(batchEvents)
      val batch = EventStream.intervalJoin(bl, br, maxGapMs = gapMs)
        .collect().map(key).toSet
      assert(batch.nonEmpty, "vacuous premise: no click→purchase pairs in gap")
      assert(streamed === batch, s"stream ${streamed.size} vs batch ${batch.size}")
    } finally q.stop()
  }

  test("file-source streaming funnelCounts ⊆ batch funnel; watermark-closed windows all present") {
    val src = tmpDir("funl")
    batchEvents.limit(0).write.mode("overwrite").parquet(src)
    import graft.streaming.EventStream
    val gapMs = 6L * 3600 * 1000
    def sides(df: DataFrame) = (df.filter(col("event_type") === "click"),
      df.filter(col("event_type") === "purchase"))
    val (lc, rp) = sides(EventStream.read(spark, src))
    val q = EventStream.funnelCounts(lc, rp, maxGapMs = gapMs,
        windowLen = "1 day", watermark = "0 seconds")
      .writeStream.format("memory").queryName("seq_funl")
      .outputMode("append").start()
    try {
      emitTimeSliced(batchEvents.withColumn("props", lit("{}")), src, 4)(
        () => q.processAllAvailable())
      def key(r: org.apache.spark.sql.Row) = (r.getTimestamp(0).getTime, r.getLong(1))
      val streamed = spark.table("seq_funl").collect().map(key).toSet
      val (bl, br) = sides(batchEvents)
      val batch = EventStream.funnelCounts(bl, br, maxGapMs = gapMs,
        windowLen = "1 day").collect().map(key).toSet
      // every streamed window is EXACTLY its batch twin...
      assert(streamed.subsetOf(batch),
        s"streamed windows diverge: ${(streamed -- batch).take(3)}")
      // ...and the chained join+agg watermark (maxTs − maxGap) has
      // provably closed every window a day+gap behind the end
      val closed = batch.filter { case (start, _) =>
        start + 86400000L + gapMs < maxTsMs - gapMs }
      assert(closed.nonEmpty, "vacuous premise: no provably-closed funnel windows")
      assert(closed.subsetOf(streamed),
        s"closed windows missing from the stream: ${(closed -- streamed).take(3)}")
    } finally q.stop()
  }

  test("file-source streaming dedupStream ≡ batch distinct-on-id with in-slice duplicates") {
    val src = tmpDir("ddup")
    batchEvents.limit(0).write.mode("overwrite").parquet(src)
    import graft.streaming.EventStream
    val stream = EventStream.read(spark, src)
    val q = EventStream.dedupStream(stream, watermark = "1 hour")
      .select("event_id")
      .writeStream.format("memory").queryName("seq_ddup")
      .outputMode("append").start()
    try {
      // every slice carries duplicates of its own % 3 == 0 ids — the
      // at-least-once replay shape the guard exists for
      val dup = batchEvents.withColumn("props", lit("{}"))
      val doubled = dup.union(dup.filter(col("event_id") % 3 === 0))
      emitTimeSliced(doubled, src, 4)(() => q.processAllAvailable())
      val streamed = spark.table("seq_ddup").collect().map(_.getLong(0))
      assert(streamed.length === streamed.distinct.length,
        "dedupStream emitted an event_id twice")
      assert(streamed.toSet === batchEvents.select("event_id").collect()
        .map(_.getLong(0)).toSet)
    } finally q.stop()
  }

  test("file-source stream-static enrich ≡ batch broadcast join") {
    import spark.implicits._
    val src = tmpDir("enr")
    batchEvents.limit(0).write.mode("overwrite").parquet(src)
    import graft.streaming.EventStream
    val dim = Seq(("click", 1L), ("purchase", 2L), ("view", 3L))
      .toDF("event_type", "type_code") // signup/error unmatched → null
    val q = EventStream.enrich(EventStream.read(spark, src), dim, "event_type")
      .select("event_id", "type_code")
      .writeStream.format("memory").queryName("seq_enr")
      .outputMode("append").start()
    try {
      emitTimeSliced(batchEvents.withColumn("props", lit("{}")), src, 2)(
        () => q.processAllAvailable())
      def toMap(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val streamed = toMap(spark.table("seq_enr").collect())
      val batch = toMap(EventStream.enrich(batchEvents, dim, "event_type")
        .select("event_id", "type_code").collect())
      assert(batch.values.exists(_ == -1L) && batch.values.exists(_ > 0),
        "vacuous premise: the dim must match some types and miss others")
      assert(streamed === batch)
    } finally q.stop()
  }

  test("file-source streaming runningProfile: final changelog row per user ≡ batch profile") {
    import spark.implicits._
    import graft.streaming.EventStream
    withRocksDb {
      val src = tmpDir("prof")
      batchEvents.limit(0).write.mode("overwrite").parquet(src)
      val stream = EventStream.read(spark, src)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStream.Event]
      val q = StatefulOps.runningProfile(stream)
        .writeStream.format("memory").queryName("seq_prof")
        .outputMode("append").start()
      try {
        emitTimeSliced(batchEvents.withColumn("props", lit("{}")), src, 4)(
          () => q.processAllAvailable())
        // the changelog's final row per user (max n_events) is the profile
        val finals = spark.table("seq_prof").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
          .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
        val batch = batchEvents.groupBy("user_id")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,6)")).cast("double").as("sv"),
            countDistinct(col("event_type")).as("dt"))
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
          .toMap
        assert(finals.keySet === batch.keySet)
        finals.foreach { case (u, (_, n, sv, dt)) =>
          val (bn, bsv, bdt) = batch(u)
          assert(n === bn, s"user $u count $n vs $bn")
          assert(dt === bdt, s"user $u distinct types $dt vs $bdt")
          // arrival-order double fold vs decimal-exact batch sum — the
          // documented streaming determinism contract (last-ulp window)
          assert(math.abs(sv - bsv) <= 1e-9 * math.max(1.0, math.abs(bsv)),
            s"user $u sum $sv vs $bsv")
        }
      } finally q.stop()
    }
  }

  test("file-source mergeStream: generational CDC snapshot ≡ the batch upsert fold") {
    import graft.streaming.EventStream
    val src = tmpDir("mrg_src")
    val dir = tmpDir("mrg_out")
    // updates: (user_id, value, event_id) with event_id as the version —
    // latest-wins per user; ts rides along only for the time slicing
    val updates = batchEvents.select(col("user_id"), col("value"),
      col("event_id").as("version"), col("ts"), col("event_id"))
    updates.limit(0).drop("ts", "event_id").write.parquet(s"$dir/gen0")
    updates.limit(0).write.mode("overwrite").parquet(src)
    val schema = updates.schema
    val stream = spark.readStream.schema(schema).parquet(src)
      .drop("ts", "event_id")
    val q = EventStream.mergeStream(stream, dir, "user_id", "version")
    try {
      emitTimeSliced(updates, src, 3)(() => q.processAllAvailable())
      val latest = new java.io.File(dir).list().filter(_.startsWith("gen"))
        .map(_.drop(3).toInt).max
      val snap = spark.read.parquet(s"$dir/gen$latest").collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Double]("value"), r.getAs[Long]("version")))).toMap
      // latest-wins fold ≡ per-user max-version row
      val expected = batchEvents
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")
            .orderBy(col("event_id").desc)))
        .filter(col("rn") === 1)
        .collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Double]("value"), r.getAs[Long]("event_id")))).toMap
      assert(snap === expected,
        s"snapshot ${snap.size} users vs expected ${expected.size}")
    } finally q.stop()
  }

  test("file-source streaming thresholdCrossings ≡ batch count-threshold on documents.lang") {
    withRocksDb {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("lang"))
      val src = tmpDir("thr")
      docs.repartition(5).write.mode("overwrite").parquet(src)
      val threshold = 80L // sf0.001 langs: en 193, fr 82, es 80 cross; zh 74, de 71 don't
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val q = StreamingCounts.thresholdCrossings(stream, "lang", threshold)
        .writeStream.format("memory").queryName("seq_thr")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val crossed = spark.table("seq_thr").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val totals = docs.groupBy("lang").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val expected = totals.filter(_._2 >= threshold).keySet
        assert(expected.nonEmpty && expected.size < totals.size,
          "vacuous premise: threshold must split the sources")
        // exactly the batch-threshold item set, each announced once
        assert(crossed.keySet === expected)
        // cnt is the crossing batch's cumulative count — the one
        // batching-dependent field; bounded, never the final total by
        // accident of a single batch unless the totals say so
        crossed.foreach { case (item, cnt) =>
          assert(cnt >= threshold && cnt <= totals(item),
            s"$item crossed at $cnt outside [$threshold, ${totals(item)}]")
        }
      } finally q.stop()
    }
  }
}
