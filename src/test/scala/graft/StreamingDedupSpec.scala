package graft

import graft.pipeline.Dedup
import graft.streaming.{StatefulOps, StreamingDedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  // the DedupSpec planted corpus: 1≡2 exact dup, 3 near-dup of 1, 4 unrelated
  private val base = "the quick brown fox jumps over the lazy dog and runs far away home"
  private val corpus = Seq(
    (1L, base),
    (2L, base),
    (3L, base.replace("lazy", "sleepy")),
    (4L, "completely different content with nothing shared at all here whatsoever today"))

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

  test("per-row streaming signatures band identically to the batch aggregate") {
    val docs = corpus.toDF("doc_id", "text")
    val streamKeys = StreamingDedup.bandKeyRows(docs, rowsPerBand = 1).collect()
      .map(r => (r.band_key, r.doc_id)).toSet
    val batchKeys = Dedup.bandKeyIndex(Dedup.minhashSignatures(docs), rowsPerBand = 1)
      .collect()
      .map(r => (s"${r.getInt(1)}|${r.getStruct(2).getLong(0)}", r.getLong(0))).toSet
    assert(streamKeys === batchKeys)
  }

  test("streaming candidates across micro-batches equal batch LSH candidates") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val q = StreamingDedup.candidates(mem.toDF().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName("sdedup")
        .outputMode("append").start()
      try {
        mem.addData(corpus(0), corpus(1))
        q.processAllAvailable()
        val afterB1 = spark.table("sdedup").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(afterB1 === Set((1L, 2L))) // the exact dup, found immediately
        mem.addData(corpus(2), corpus(3))
        q.processAllAvailable()
        val streamed = spark.table("sdedup").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val batch = Dedup.lshCandidates(
            Dedup.minhashSignatures(corpus.toDF("doc_id", "text")))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(streamed === batch)
      } finally q.stop()
    }
  }

  test("re-delivered documents are idempotent; the bucket cap stops pair emission") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val q = StreamingDedup.candidates(mem.toDF().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName("sdedup_dup")
        .outputMode("append").start()
      try {
        mem.addData(corpus(0), corpus(1))
        q.processAllAvailable()
        val afterB1 = spark.table("sdedup_dup").count()
        mem.addData(corpus(0)) // replayed doc 1 — already a member everywhere
        q.processAllAvailable()
        val rows = spark.table("sdedup_dup").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        assert(rows.toSet === Set((1L, 2L)))
        assert(rows.length.toLong === afterB1) // no growth on replay
      } finally q.stop()
    }
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val q = StreamingDedup.candidates(mem.toDF().toDF("doc_id", "text"),
          maxBucketSize = 1)
        .writeStream.format("memory").queryName("sdedup_cap")
        .outputMode("append").start()
      try {
        mem.addData(corpus(0), corpus(1), corpus(2), corpus(3))
        q.processAllAvailable()
        // every bucket holds one member; nothing can pair
        assert(spark.table("sdedup_cap").isEmpty)
      } finally q.stop()
    }
  }

  test("CDC tombstones erase a doc from the live index: no later pair touches it") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[(Long, String, Boolean)]
      val q = StreamingDedup.candidatesCdc(
          mem.toDF().toDF("doc_id", "text", "is_delete"))
        .writeStream.format("memory").queryName("sdedup_cdc")
        .outputMode("append").start()
      try {
        // b1: docs 1 and 2 (exact dups) arrive → pair (1,2) emitted
        mem.addData((1L, base, false), (2L, base, false))
        q.processAllAvailable()
        assert(spark.table("sdedup_cdc").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
        // b2: tombstone for doc 2 (before-image text routes the delete)
        mem.addData((2L, base, true))
        q.processAllAvailable()
        // b3: doc 5, an exact dup of both — must pair ONLY with 1, never
        // with the erased 2 (the GDPR/takedown property)
        mem.addData((5L, base, false))
        q.processAllAvailable()
        val rows = spark.table("sdedup_cdc").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        assert(rows.toSet === Set((1L, 2L), (1L, 5L)))
        // b4: deleting an unknown id is a no-op; re-adding 2 pairs with
        // the CURRENT members (1 and 5) — the bucket reopened
        mem.addData((99L, base, true))
        mem.addData((2L, base, false))
        q.processAllAvailable()
        val all = spark.table("sdedup_cdc").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(all === Set((1L, 2L), (1L, 5L), (2L, 5L)))
      } finally q.stop()
    }
  }

  test("CDC same-batch add+tombstone of one doc resolves to ERASED (deterministic, no seq)") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[(Long, String, Boolean)]
      val q = StreamingDedup.candidatesCdc(
          mem.toDF().toDF("doc_id", "text", "is_delete"))
        .writeStream.format("memory").queryName("sdedup_cdc_tie")
        .outputMode("append").start()
      try {
        mem.addData((1L, base, false))
        q.processAllAvailable()
        // one batch carries BOTH the add and the tombstone for doc 5 —
        // shuffle order is arbitrary, but the adds-before-deletes tie
        // rule makes the outcome deterministic: 5 ends the batch erased
        mem.addData((5L, base, false), (5L, base, true))
        q.processAllAvailable()
        // doc 6 must pair ONLY with 1 — 5 resident would emit (5, 6)
        mem.addData((6L, base, false))
        q.processAllAvailable()
        val all = spark.table("sdedup_cdc_tie").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(all === Set((1L, 5L), (1L, 6L)),
          "same-batch add+tombstone must leave the doc erased " +
            "(the (1,5) pair is the documented within-batch residue)")
      } finally q.stop()
    }
  }

  test("CDC seqCol fixes within-batch order: delete-then-add by offset leaves the doc resident") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[(Long, String, Boolean, Long)]
      val q = StreamingDedup.candidatesCdc(
          mem.toDF().toDF("doc_id", "text", "is_delete", "off"),
          seqCol = Some("off"))
        .writeStream.format("memory").queryName("sdedup_cdc_seq")
        .outputMode("append").start()
      try {
        mem.addData((1L, base, false, 1L))
        q.processAllAvailable()
        // offsets say: tombstone (no-op, 5 unknown) THEN add → resident.
        // The no-seq tie rule would order the add first and the delete
        // last (erased) — the offset must override it.
        mem.addData((5L, base, true, 2L), (5L, base, false, 3L))
        q.processAllAvailable()
        mem.addData((6L, base, false, 4L))
        q.processAllAvailable()
        val all = spark.table("sdedup_cdc_seq").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(all === Set((1L, 5L), (1L, 6L), (5L, 6L)),
          "seq order says 5 is resident — it must pair with 6")
      } finally q.stop()
    }
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[(Long, String, Boolean, Long)]
      val q = StreamingDedup.candidatesCdc(
          mem.toDF().toDF("doc_id", "text", "is_delete", "off"),
          seqCol = Some("off"))
        .writeStream.format("memory").queryName("sdedup_cdc_seq2")
        .outputMode("append").start()
      try {
        mem.addData((1L, base, false, 1L))
        q.processAllAvailable()
        // offsets say: add THEN tombstone → erased
        mem.addData((5L, base, false, 2L), (5L, base, true, 3L))
        q.processAllAvailable()
        mem.addData((7L, base, false, 4L))
        q.processAllAvailable()
        val all = spark.table("sdedup_cdc_seq2").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(all === Set((1L, 5L), (1L, 7L)),
          "seq order says 5 was erased — 7 pairs only with 1")
      } finally q.stop()
    }
  }
}
