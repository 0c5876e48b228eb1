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
