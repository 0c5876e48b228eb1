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

  test("r14 bounded partial state: a tiny flush threshold changes nothing") {
    // maxPartialKeys=2 forces a flush every third distinct key — segment
    // boundaries land mid-key constantly, and the result must not move
    System.setProperty("spark.graft.topk.maxPartialKeys", "2")
    try {
      val df = (1 to 900).map(i => (s"g${i % 31}", i.toLong, (i * 37 % 101).toDouble))
        .toDF("grp", "id", "score").repartition(5)
      val got = TopKPerKey(df, Seq("grp"), Seq($"score".desc, $"id".asc), k = 4)
        .select("grp", "id").as[(String, Long)].collect().toSet
      val w = Window.partitionBy("grp").orderBy($"score".desc, $"id".asc)
      val ref = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 4)
        .select("grp", "id").as[(String, Long)].collect().toSet
      assert(got === ref)
    } finally System.clearProperty("spark.graft.topk.maxPartialKeys")
  }

  // ——— r14: the rank-window-over-prune shape (rankPrunedTopK / saltedTopK)

  test("r14 rankPrunedTopK: bit-identical rows AND ranks vs the bare rank window") {
    import graft.pipeline.SimilarityLsh
    // dense per-key candidates across many partitions, adversarial ties:
    // repeated cos values so the n_id tiebreak decides ranks
    // n_id = i·17 mod 4001 (prime) is injective over 1..4000, so
    // (q_id, n_id) rows are unique and the window order is total per key
    val sym = (1 to 4000).map { i =>
      (i % 37L, (i * 17 % 4001).toLong, (i * 13 % 23).toDouble / 23.0)
    }.toDF("q_id", "n_id", "cos").repartition(11)
    val got = SimilarityLsh.rankPrunedTopK(sym, 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    val w = Window.partitionBy("q_id").orderBy($"cos".desc, $"n_id".asc)
    val ref = sym.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5).as[(Long, Long, Double, Long)].collect().toSet
    assert(got === ref)
  }

  test("r14 exchange reuse: the rank window runs on the Final pass's shuffle") {
    import graft.pipeline.Skew
    // spark.range gives 7 input partitions WITHOUT an exchange, so the
    // only shuffle in the plan is the partial→final one
    val df = spark.range(0, 2000, 1, 7)
      .select(concat(lit("k"), ($"id" % 5).cast("string")).as("grp"),
        $"id", ($"id" * 31 % 97).cast("double").as("score"))
    val topk = Skew.saltedTopK(df, col("grp"), col("id"), 4,
      order = Seq($"score".desc, $"id".asc))
    topk.collect() // finalize AQE
    val nodes = collectAll(topk.queryExecution.executedPlan)
    // partial + final heap pair present, exactly ONE exchange in the whole
    // plan (the window re-uses the Final pass's hash(grp) partitioning),
    // and no partition-wide sort below the exchange (the heap needs none)
    assert(nodes.collect { case t: TopKPerKeyExec => t.partial }.sorted ===
      Seq(false, true), nodes.map(_.nodeName))
    assert(nodes.count(_.isInstanceOf[ShuffleExchangeLike]) === 1,
      nodes.map(_.nodeName))
  }
}
