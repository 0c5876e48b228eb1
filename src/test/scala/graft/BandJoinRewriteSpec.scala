package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The optimizer rewrite (naive `abs(l.x − r.x) <= w` theta join → bucketed
  * cell equi-join) — plan shape AND result equivalence. The rule is active
  * in this session via VectorFunctions.register (SparkTestBase).
  */
class BandJoinRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private def l: DataFrame =
    Seq((1L, 0.95), (2L, 3.00), (3L, 7.50)).toDF("lid", "lx")
  private def r: DataFrame =
    Seq((10L, 1.05), (20L, 3.80), (30L, 9.00)).toDF("rid", "rx")

  private def hasNestedLoop(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("NestedLoop") ||
      df.queryExecution.executedPlan.toString.contains("Cartesian")

  test("naive band join plans a hash/merge join, not a nested loop") {
    val j = l.join(r, abs($"lx" - $"rx") <= 1.0)
    assert(!hasNestedLoop(j), j.queryExecution.executedPlan.toString)
    // cross-cell pair (0.95, 1.05), same-cell (3.0, 3.8); (7.5, 9.0) gap 1.5 out
    val got = j.select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 20L)))
  }

  test("strict < bands rewrite too, and the residual stays strict") {
    val a = Seq((1L, 0.0)).toDF("lid", "lx")
    val b = Seq((10L, 1.0), (20L, 0.5)).toDF("rid", "rx")
    val j = a.join(b, abs($"lx" - $"rx") < 1.0)
    assert(!hasNestedLoop(j))
    assert(j.select("rid").as[Long].collect().toSet === Set(20L))
  }

  test("band + equi conjuncts: both keys drive the join, results exact") {
    val a = Seq(("t", 1L, 1.0), ("u", 2L, 1.0)).toDF("typ", "lid", "lx")
    val b = Seq(("t", 10L, 1.4), ("u", 20L, 9.0)).toDF("typ2", "rid", "rx")
    val j = a.join(b, $"typ" === $"typ2" && abs($"lx" - $"rx") <= 0.5)
    assert(!hasNestedLoop(j))
    assert(j.select("lid", "rid").as[(Long, Long)].collect().toSet === Set((1L, 10L)))
  }

  test("null x on either side never matches (semantics preserved)") {
    val a = Seq((1L, Some(1.0)), (2L, None)).toDF("lid", "lx")
    val b = Seq((10L, Some(1.2)), (20L, None)).toDF("rid", "rx")
    val j = a.join(b, abs($"lx" - $"rx") <= 0.5)
    assert(j.select("lid", "rid").as[(Long, Long)].collect().toSet === Set((1L, 10L)))
  }

  test("rewrite result matches the un-rewritten nested loop bit-for-bit") {
    val big = (0 until 500).map(i => (i.toLong, i * 0.37 % 13)).toDF("lid", "lx")
    val big2 = (0 until 500).map(i => (i.toLong + 1000, i * 0.53 % 13)).toDF("rid", "rx")
    val rewritten = big.join(big2, abs($"lx" - $"rx") <= 0.25)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val naive = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = Nil   // rule off → true BNLJ
      val reference = big.join(big2, abs($"lx" - $"rx") <= 0.25)
      assert(hasNestedLoop(reference))
      assert(reference.select("lid", "rid").as[(Long, Long)].collect().toSet === rewritten)
    } finally spark.experimental.extraOptimizations = naive
  }
}
