package graft

import graft.pipeline.Stats
import graft.ops.{BandJoin, Skyline}
import org.apache.spark.sql.functions._

class StatsRegressionSpec extends SparkTestBase {
  import spark.implicits._

  test("madOutliers: lower medians, all-integer 3.5-MAD verdict, MAD=0 degeneracy") {
    // group g: values 10,12,14,16,100 → lower median (n=5 → pos 3) = 14;
    // deviations 4,2,0,2,86 → MAD (pos 3 of 0,2,2,4,86) = 2;
    // outliers: 10·dev > 35·2 = 70 → only 86 (the planted wild row)
    val df = (Seq(10, 12, 14, 16, 100).zipWithIndex.map { case (v, i) => ("g", i.toLong, v) } ++
      // group z: all identical → med 7, MAD 0 → ANY deviation flags (the 9)
      Seq(("z", 10L, 7), ("z", 11L, 7), ("z", 12L, 9)))
      .toDF("grp", "id", "x")
    val got = graft.pipeline.Stats.madOutliers(df, "grp", "x", "id").collect()
      .map(r => r.getAs[String]("grp") ->
        ((r.getAs[Long]("med"), r.getAs[Long]("mad"),
          r.getAs[Long]("n"), r.getAs[Long]("n_outliers")))).toMap
    assert(got("g") === ((14L, 2L, 5L, 1L)))
    assert(got("z") === ((7L, 0L, 3L, 1L)))
  }

  test("ols recovers an exact linear relationship (slope 2, intercept 1, r2 1)") {
    val df = Seq(("g", 1.0, 3.0), ("g", 2.0, 5.0), ("g", 3.0, 7.0), ("g", 4.0, 9.0))
      .toDF("grp", "x", "y")
    val r = Stats.ols(df, "grp", "x", "y").collect().head
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("intercept") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-12)
  }

  test("ols groups independently and n counts rows per group") {
    val df = Seq(("a", 1.0, 1.0), ("a", 2.0, 2.0),
      ("b", 1.0, 2.0), ("b", 2.0, 1.0), ("b", 3.0, 3.0)).toDF("grp", "x", "y")
    val got = Stats.ols(df, "grp", "x", "y").collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Long]("n")).toMap
    assert(got === Map("a" -> 2L, "b" -> 3L))
  }

  test("lagCorr of a perfectly alternating series is -1") {
    // series 0, 10, 0, 10 … lag-1 pairs are (0,10),(10,0),… → corr −1
    val df = (0 until 10).map(i => ("s", i, if (i % 2 == 0) 0L else 10L))
      .toDF("grp", "t", "v")
    val r = Stats.lagCorr(df, "grp", "t", "v").collect().head
    assert(r.getAs[Long]("n_pairs") === 9L)
    assert(math.abs(r.getAs[Double]("autocorr") + 1.0) < 1e-12)
  }

  test("band selfPairs finds exactly the within-width pairs, once each") {
    val df = Seq((1L, "t", 1.0), (2L, "t", 1.8), (3L, "t", 3.5), (4L, "u", 1.2))
      .toDF("id", "typ", "x")
    // width 1.0: (1,2) in band; (2,3) gap 1.7 out; (1,4) different type
    val got = BandJoin.selfPairs(df, "id", "x", 1.0, Seq("typ"))
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("band pairs straddling a cell boundary are found exactly once") {
    // width 1.0 cells: 0.95 in cell 0, 1.05 in cell 1 — adjacent-cell match
    val df = Seq((1L, "t", 0.95), (2L, "t", 1.05)).toDF("id", "typ", "x")
    val got = BandJoin.selfPairs(df, "id", "x", 1.0, Seq("typ"))
      .select("a", "b").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L)))
  }

  test("skyline keeps exactly the non-dominated (min x, max y) points") {
    val df = Seq(
      (1.0, 5), (2.0, 7),   // (2,7) not dominated (bigger y), (1,5) frontier
      (3.0, 6),             // dominated by (2,7)
      (1.0, 4),             // same x as (1,5): only max y per x survives
      (5.0, 9)).toDF("price", "size")
    val got = Skyline.frontier2d(df, "price", "size", bucketWidth = 2.0)
      .as[(Double, Int)].collect().toSet
    assert(got === Set((1.0, 5), (2.0, 7), (5.0, 9)))
  }

  test("skyline drops equal-y points at larger x (strict dominance in x)") {
    val df = Seq((1.0, 5), (2.0, 5)).toDF("x", "y")
    val got = Skyline.frontier2d(df, "x", "y", bucketWidth = 10.0)
      .as[(Double, Int)].collect().toSet
    assert(got === Set((1.0, 5)))
  }

  test("temperature audit: uniform strata get equal rates; budget bounds the expectation") {
    val df = (0 until 400).map(i => (s"s${i % 4}", i.toLong)).toDF("src", "id")
    val audit = graft.pipeline.Mix.temperatureAudit(df, "src", col("id"), budget = 200L)
      .collect()
    val rates = audit.map(_.getAs[Double]("rate")).distinct
    assert(rates.length === 1)            // equal counts → equal rates
    assert(math.abs(rates.head - 0.5) < 1e-9)  // 200 / 400
    val sampled = audit.map(_.getAs[Long]("n_sampled")).sum
    assert(sampled > 120 && sampled < 280)     // hash-uniform ≈ budget
  }

  test("temperature rates cap at 1.0 for tiny strata") {
    val df = ((0 until 300).map(i => ("big", i.toLong)) ++ Seq(("tiny", 1000L)))
      .toDF("src", "id")
    val rates = graft.pipeline.Mix.temperatureAudit(df, "src", col("id"), budget = 200L)
      .collect().map(r => r.getAs[String]("src") -> r.getAs[Double]("rate")).toMap
    // tiny stratum: budget·(1/(√300+1))/1 >> 1 → capped
    assert(rates.get("tiny").forall(_ == 1.0))
  }

  test("moments matches the naive formulas on 2-decimal data") {
    val xs = Seq(1.25, 2.50, 3.75, 4.00, 5.10)
    val ys = Seq(2.00, 4.10, 5.90, 8.30, 9.75)
    val df = xs.zip(ys).map { case (x, y) => ("g", x, y) }.toDF("grp", "x", "y")
    val r = Stats.moments(df, "grp", "x", "y").collect().head
    val n = xs.size.toDouble
    val mean = xs.sum / n
    val sd = math.sqrt(xs.map(v => (v - mean) * (v - mean)).sum / n)
    val my = ys.sum / n
    val cov = xs.zip(ys).map { case (x, y) => (x - mean) * (y - my) }.sum
    val corr = cov / math.sqrt(
      xs.map(v => (v - mean) * (v - mean)).sum * ys.map(v => (v - my) * (v - my)).sum)
    assert(r.getAs[Long]("n") === 5L)
    assert(math.abs(r.getAs[Double]("mean_x") - mean) < 1e-12)
    assert(math.abs(r.getAs[Double]("stddev_x") - sd) < 1e-12)
    assert(math.abs(r.getAs[Double]("corr_xy") - corr) < 1e-12)
  }

  test("moments is bit-identical across partition layouts") {
    // the determinism contract: exact integer-unit sums + a fixed IEEE
    // finish tree ⇒ the doubles cannot depend on partition order
    val df = (0 until 500).map { i =>
      (s"g${i % 3}", (i * 7919 % 1000) / 100.0, (i * 104729 % 10000) / 100.0)
    }.toDF("grp", "x", "y")
    def run(parts: Int) = Stats.moments(df.repartition(parts), "grp", "x", "y")
      .collect().map(r => (r.getAs[String]("grp"),
        java.lang.Double.doubleToRawLongBits(r.getAs[Double]("mean_x")),
        java.lang.Double.doubleToRawLongBits(r.getAs[Double]("stddev_x")),
        java.lang.Double.doubleToRawLongBits(r.getAs[Double]("corr_xy"))))
      .sortBy(_._1).toSeq
    assert(run(1) === run(7))
  }
}
