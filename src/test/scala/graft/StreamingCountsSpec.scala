package graft

import graft.streaming.{StatefulOps, StreamingCounts}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingCountsSpec extends SparkTestBase {
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

  test("crossing emitted exactly once, at the batch where the count first reaches T") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[String]
      val q = StreamingCounts.thresholdCrossings(mem.toDF().withColumnRenamed("value", "item"), "item", 3L)
        .writeStream.format("memory").queryName("hh_stream")
        .outputMode("append").start()
      try {
        mem.addData("a", "a", "b")          // a=2, b=1 — nobody crosses
        q.processAllAvailable()
        assert(spark.table("hh_stream").count() === 0)

        mem.addData("a", "b", "c")          // a=3 crosses; b=2, c=1
        q.processAllAvailable()
        val after2 = spark.table("hh_stream").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toSet
        assert(after2 === Set("a" -> 3L))

        mem.addData("a", "a", "b", "b", "b", "b") // a grows past T: NO re-emit; b=6 crosses
        q.processAllAvailable()
        val all = spark.table("hh_stream").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toSet
        assert(all === Set("a" -> 3L, "b" -> 6L))
      } finally q.stop()
    }
  }

  test("a within-batch burst crosses once with the exact post-batch count") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[String]
      val q = StreamingCounts.thresholdCrossings(mem.toDF().withColumnRenamed("value", "item"), "item", 2L)
        .writeStream.format("memory").queryName("hh_burst")
        .outputMode("append").start()
      try {
        mem.addData("x", "x", "x", "x", "x") // 0 -> 5 in one batch
        q.processAllAvailable()
        val got = spark.table("hh_burst").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toSet
        assert(got === Set("x" -> 5L))
      } finally q.stop()
    }
  }
}
