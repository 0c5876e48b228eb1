package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch per-query job/task profiler: wall time, job count, task count,
  * summed executor task time — separates "few heavy stages" queries from
  * "many tiny jobs" queries. Local investigation only.
  * Usage: QueryProfile <substr,substr,...>
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wanted = args.headOption.map(_.split(',').toSeq).getOrElse(Seq())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // atomics + a bus flush before each read/reset (r13 advice): the
    // listener bus delivers events asynchronously, so non-atomic `+=`
    // could drop updates and unflushed events could bleed into the next
    // query's counters
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val stageInfo = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    val perStage = sys.env.get("QPROF_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          if (perStage) stageInfo.merge(t.stageId, ("", t.taskMetrics.executorRunTime, 1),
            (a, b) => (a._1, a._2 + b._2, a._3 + b._3))
        }
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (perStage) {
          val name = s.stageInfo.details.linesIterator.take(1).mkString
          stageInfo.merge(s.stageInfo.stageId, (s.stageInfo.name, 0L, 0),
            (a, b) => (if (b._1.nonEmpty) b._1 else a._1, a._2, a._3))
        }
    })
    val qs = graft.SparkEntry.queries
      .filter(e => wanted.isEmpty || wanted.exists(e._1.contains))
      .toSeq.sortBy(_._1)
    // warmup pass at sf0.001 (JIT/codegen), same as Bench
    val warmDir = {
      val sib = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sib.isDirectory) sib.getPath else sfDir
    }
    qs.foreach { case (_, fn) =>
      try graft.GraftStorage.withTracked(spark) {
        fn(spark, warmDir).agg(count(xxhash64(struct(col("*"))))).head(); ()
      } catch { case _: Throwable => () }
    }
    // listenerBus is private[spark] (public bytecode) — reflection is
    // fine for a scratch tool
    def flushBus(): Unit = {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      ()
    }
    // drain queued listener events so warmup counts don't bleed in
    flushBus()
    qs.foreach { case (name, fn) =>
      jobs.set(0); tasks.set(0); taskMs.set(0L)
      val t0 = System.nanoTime()
      try graft.GraftStorage.withTracked(spark) {
        fn(spark, sfDir).agg(count(xxhash64(struct(col("*"))))).head(); ()
      } catch { case e: Throwable => println(s"$name FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      // flush before reading: events for this query may still be queued
      flushBus()
      println(f"QPROF $name%-40s wall=$wall%7.2f jobs=${jobs.get}%4d tasks=${tasks.get}%6d taskSec=${taskMs.get / 1e3}%8.2f")
      if (perStage) {
        import scala.jdk.CollectionConverters._
        stageInfo.asScala.toSeq.sortBy(-_._2._2).take(12).foreach {
          case (sid, (nm, ms, nt)) =>
            println(f"  STAGE $sid%5d ${ms / 1e3}%8.2fs tasks=$nt%5d  ${nm.take(110)}")
        }
        stageInfo.clear()
      }
    }
    spark.stop()
  }
}
