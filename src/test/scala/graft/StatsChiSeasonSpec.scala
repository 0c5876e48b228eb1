package graft

import graft.ops.Smooth
import graft.pipeline.Stats

class StatsChiSeasonSpec extends SparkTestBase {
  import spark.implicits._

  test("chiSquare matches the hand-computed 2x2 table") {
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val r = Stats.chiSquare(rows.toDF("r", "c"), "r", "c").collect().head
    val expected = 4.0 / 12 + 4.0 / 18 + 4.0 / 28 + 4.0 / 42
    assert(math.abs(r.getAs[Double]("chi2") - expected) < 1e-6)
    assert(r.getAs[Long]("df") === 1L)
    assert(r.getAs[Long]("n") === 100L)
  }

  test("chiSquare is ~0 for a perfectly independent table") {
    // uniform 2x2: O = E everywhere
    val rows = for { r <- Seq("a", "b"); c <- Seq("x", "y"); _ <- 1 to 5 } yield (r, c)
    val r = Stats.chiSquare(rows.toDF("r", "c"), "r", "c").collect().head
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-9)
  }

  test("seasonalDow components sum to ~0 across dows for a flat series") {
    // constant series: trend = value, detrended = 0 → every seasonal = 0
    val days = (1 to 21).map(i =>
      ("k", java.sql.Date.valueOf(f"2024-01-${i}%02d"), 100L))
    val out = Smooth.seasonalDow(days.toDF("k", "day", "v"), "k", "day", "v")
      .collect()
    assert(out.length === 7)
    out.foreach(r => assert(math.abs(r.getAs[Double]("seasonal")) < 1e-9))
  }

  test("seasonalDow isolates a weekly spike as one dow's positive component") {
    // 100 every day, 800 on Sundays: Sunday's seasonal is strongly positive
    val days = (1 to 28).map { i =>
      val d = java.sql.Date.valueOf(f"2024-01-${i}%02d")
      val isSunday = d.toLocalDate.getDayOfWeek.getValue == 7
      ("k", d, if (isSunday) 800L else 100L)
    }
    val out = Smooth.seasonalDow(days.toDF("k", "day", "v"), "k", "day", "v")
      .collect().map(r => r.getAs[Long]("dow") -> r.getAs[Double]("seasonal")).toMap
    // Spark dayofweek: 1 = Sunday
    assert(out(1L) > 300.0)
    assert(out.filterNot(_._1 == 1L).values.forall(_ < 100.0))
  }
}
