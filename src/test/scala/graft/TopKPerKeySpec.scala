package graft

import graft.plans.{TopKPerKey, TopKPerKeyExec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkTestBase {
  import spark.implicits._

  private def data: DataFrame =
    (1 to 500).map(i => (s"g${i % 7}", i.toLong, (i * 37 % 101).toDouble))
      .toDF("grp", "id", "score")
      .repartition(8)

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: collectAll(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: collectAll(s.plan)
    case _ => p +: p.children.flatMap(collectAll)
  }

  test("matches the rank-window formulation on a total order") {
    val got = TopKPerKey(data, Seq("grp"), Seq($"score".desc, $"id".asc), k = 5)
      .select("grp", "id").as[(String, Long)].collect().toSet
    val w = Window.partitionBy("grp").orderBy($"score".desc, $"id".asc)
    val ref = data.withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(got === ref)
  }

  test("plans as Partial -> exchange -> Final, not a full-sort window") {
    val df = TopKPerKey(data, Seq("grp"), Seq($"score".desc, $"id".asc), k = 3)
    df.collect()   // materialize so AQE finalizes the plan
    val nodes = collectAll(df.queryExecution.executedPlan)
    val topks = nodes.collect { case t: TopKPerKeyExec => t }
    assert(topks.map(_.partial).sorted === Seq(false, true), nodes.map(_.nodeName))
    assert(nodes.exists(_.isInstanceOf[ShuffleExchangeLike]), nodes.map(_.nodeName))
    assert(!nodes.exists(_.nodeName.contains("Window")))
  }

  test("result is invariant under input partitioning") {
    val a = TopKPerKey(data.repartition(3), Seq("grp"),
      Seq($"score".desc, $"id".asc), k = 4)
      .select("grp", "id").as[(String, Long)].collect().toSet
    val b = TopKPerKey(data.repartition(17), Seq("grp"),
      Seq($"score".desc, $"id".asc), k = 4)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(a === b)
  }

  test("k larger than the group returns the whole group") {
    val tiny = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("grp", "id")
    val got = TopKPerKey(tiny, Seq("grp"), Seq($"id".asc), k = 10)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(got === Set(("a", 1L), ("a", 2L), ("b", 3L)))
  }

  test("ascending order keeps the smallest rows") {
    val df = Seq(("a", 5L), ("a", 1L), ("a", 9L), ("a", 3L)).toDF("grp", "v")
    val got = TopKPerKey(df, Seq("grp"), Seq($"v".asc), k = 2)
      .select("v").as[Long].collect().toSet
    assert(got === Set(1L, 3L))
  }
}
