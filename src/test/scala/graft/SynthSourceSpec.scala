package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.{SynthScan, SynthSource}

/** The custom DataSource V2 connector ([[graft.sources.SynthSource]]):
  * generation correctness, filter pushdown (including partition-range
  * clamping), and column pruning — each asserted against the actual
  * physical scan, not just result values.
  */
class SynthSourceSpec extends SparkTestBase {

  // the service-loader short name — exercises the DataSourceRegister path
  private def read(rows: Int) = spark.read
    .format("graft-synth")
    .option("rows", rows.toString).option("numPartitions", "3").load()

  private def collectAll(p: SparkPlan): Seq[SparkPlan] =
    p +: (p.children ++ p.subqueries).flatMap {
      case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
      case c => collectAll(c)
    }

  private def synthScan(df: org.apache.spark.sql.DataFrame): SynthScan =
    collectAll(df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).collect { case b: BatchScanExec => b.scan }
      .collectFirst { case s: SynthScan => s }
      .getOrElse(fail("no SynthScan in plan"))

  test("generates id / id%20 / md5-prefix rows exactly") {
    val got = read(50).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.length === 50)
    got.foreach { case (id, grp, v) =>
      assert(grp === id % 20)
      assert(v === SynthSource.mdPrefix(id))
    }
  }

  test("comparison and IN filters are pushed; others stay residual") {
    val df = read(200).filter(col("grp").isin(3L, 7L) && col("id") >= 20L)
    val scan = synthScan(df)
    assert(scan.pushed.length === 2, scan.description())
    // results match a Spark-side filter over the unfiltered read
    val expect = read(200).collect()
      .filter(r => Set(3L, 7L).contains(r.getLong(1)) && r.getLong(0) >= 20L)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === expect)
    // a non-pushable predicate is NOT claimed by the source
    val residual = read(200).filter(col("v") % 2 === 0)
    assert(synthScan(residual).pushed.isEmpty)
    assert(residual.count() > 0)
  }

  test("id bounds clamp the generated partitions (partition pruning analogue)") {
    val df = read(300).filter(col("id") >= 290L)
    val scan = synthScan(df)
    val parts = scan.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.SynthRange])
    // the clamp re-splits ONLY the surviving [290, 300) range — no
    // planned partition may touch the 290 pruned ids
    assert(parts.nonEmpty && parts.forall(p => p.lo >= 290L && p.hi <= 300L),
      parts.mkString(","))
    assert(parts.map(p => p.hi - p.lo).sum === 10L)
    assert(df.count() === 10L)
    // a contradictory bound plans zero partitions, zero tasks
    assert(synthScan(read(300).filter(col("id") >= 300L))
      .planInputPartitions().isEmpty)
  }

  test("column pruning reaches the reader (v not computed when unused)") {
    val df = read(100).select("id", "grp")
    assert(synthScan(df).readSchema().fieldNames.toSeq === Seq("id", "grp"))
    assert(df.count() === 100L)
  }

  test("aggregate pushdown: grouped COUNT/MIN/MAX answered inside the generator") {
    val df = read(200).groupBy("grp")
      .agg(count(lit(1)).as("n"), min("v").as("mn"), max("id").as("mx"))
    val scan = synthScan(df)
    assert(scan.pushedAgg.isDefined, s"aggregation not pushed: ${scan.description()}")
    assert(scan.pushedAgg.get._1, "GROUP BY grp not pushed")
    // the scan's output is the partial-aggregate schema, not raw rows
    assert(scan.readSchema().fieldNames.length === 4)
    val got = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expected = (0L until 200L).groupBy(_ % 20).map { case (g, ids) =>
      g -> ((ids.size.toLong, ids.map(SynthSource.mdPrefix).min, ids.max))
    }
    assert(got === expected)
  }

  test("aggregate pushdown: global aggregate with pushed filters; empty result contract") {
    val df = read(100).filter(col("id") >= 40L && col("id") < 60L)
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("v").as("mx"))
    val scan = synthScan(df)
    assert(scan.pushedAgg.isDefined && !scan.pushedAgg.get._1)
    val r = df.head()
    assert(r.getLong(0) === 20L)
    assert(r.getLong(1) === 40L)
    assert(r.getLong(2) === (40L until 60L).map(SynthSource.mdPrefix).max)
    // every row filtered out: COUNT 0, MIN/MAX null (the SQL/JDBC contract)
    val empty = read(100).filter(col("id") > 1000L)
      .agg(count(lit(1)).as("n"), min("id").as("mn"))
    assert(synthScan(empty).pushedAgg.isDefined)
    val er = empty.head()
    assert(er.getLong(0) === 0L && er.isNullAt(1))
  }

  test("COMPLETE pushdown at one partition: Spark plans no aggregate node at all") {
    val single = spark.read.format("graft-synth")
      .option("rows", "300").option("numPartitions", "1").load()
      .groupBy("grp").agg(count(lit(1)).as("n"), max("id").as("mx"))
    assert(synthScan(single).pushedAgg.isDefined)
    val aggNodes = collectAll(single.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).count(_.nodeName.toLowerCase.contains("aggregate"))
    assert(aggNodes === 0, "complete pushdown must eliminate the Spark-side aggregate")
    val got = single.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expected = (0L until 300L).groupBy(_ % 20)
      .map { case (g, ids) => g -> ((ids.size.toLong, ids.max)) }
    assert(got === expected)
    // multi-partition keeps the merge aggregate (partial contract)
    val multi = read(300).groupBy("grp").agg(count(lit(1)).as("n"))
    val multiAgg = collectAll(multi.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).count(_.nodeName.toLowerCase.contains("aggregate"))
    assert(multiAgg > 0)
  }

  test("unsupported aggregates are NOT pushed and still compute correctly") {
    // SUM is outside the supported set — Spark must keep the raw scan
    val df = read(100).groupBy("grp").agg(sum("id").as("s"))
    assert(synthScan(df).pushedAgg.isEmpty)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (0L until 100L).groupBy(_ % 20)
      .map { case (g, ids) => g -> ids.sum }
    assert(got === expected)
  }
}
