package graft

import graft.streaming.EventStream.Event
import graft.streaming.StatefulOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StatefulOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int) = new java.sql.Timestamp(1704067200000L + minute * 60000L)

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

  test("transformWithState running profile accumulates across micro-batches") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[Event]
      val q = StatefulOps.runningProfile(mem.toDS())
        .writeStream.format("memory").queryName("profile_tws")
        .outputMode("append").start()
      try {
        mem.addData(
          Event(1L, ts(0), 10L, "click", 1.0),
          Event(2L, ts(1), 10L, "click", 2.0),
          Event(3L, ts(2), 20L, "view", 4.0))
        q.processAllAvailable()
        val batch1 = spark.table("profile_tws").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
        // one changelog row per user in the batch
        assert(batch1 === Set((10L, 2L, 3.0, 1L), (20L, 1L, 4.0, 1L)))

        // second batch: user 10's state carries over (count continues,
        // new type joins the seen-set); user 30 starts fresh
        mem.addData(
          Event(4L, ts(3), 10L, "purchase", 10.0),
          Event(5L, ts(4), 30L, "error", 0.5))
        q.processAllAvailable()
        val all = spark.table("profile_tws").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
        assert(all === batch1 ++ Set((10L, 3L, 13.0, 2L), (30L, 1L, 0.5, 1L)))
      } finally q.stop()
    }
  }

  test("repeated event types don't inflate the distinct-type state") {
    withRocksDb {
      implicit val sc = spark.sqlContext
      val mem = MemoryStream[Event]
      val q = StatefulOps.runningProfile(mem.toDS())
        .writeStream.format("memory").queryName("profile_tws_dup")
        .outputMode("append").start()
      try {
        mem.addData(
          Event(1L, ts(0), 7L, "click", 1.0),
          Event(2L, ts(1), 7L, "click", 1.0),
          Event(3L, ts(2), 7L, "click", 1.0))
        q.processAllAvailable()
        mem.addData(Event(4L, ts(3), 7L, "click", 1.0))
        q.processAllAvailable()
        val last = spark.table("profile_tws_dup").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
          .maxBy(_._2)
        assert(last === ((7L, 4L, 4.0, 1L)))
      } finally q.stop()
    }
  }
}
