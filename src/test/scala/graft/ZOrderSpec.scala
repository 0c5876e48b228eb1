package graft

import graft.sources.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def m(a: Int, b: Int, bits: Int): Long =
    Seq((a, b)).toDF("a", "b")
      .select(ZOrder.morton($"a", $"b", bits)).collect()(0).getLong(0)

  test("morton: hand-computed interleaves") {
    assert(m(0, 0, 4) === 0L)
    assert(m(1, 0, 1) === 1L)          // a → even bit 0
    assert(m(0, 1, 1) === 2L)          // b → odd bit 1
    assert(m(3, 1, 2) === 7L)          // b1 a1 b0 a0 = 0111
    assert(m(1023, 1023, 10) === (1L << 20) - 1)
  }

  test("layout: contiguous z-ranges bound BOTH dimensions (locality)") {
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y)).toDF("x", "y")
    val parts = ZOrder.layout(grid, "x", "y", bits = 6, numFiles = 16)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"))
      .collect()
    // 16 contiguous z-ranges over a 64×64 grid ≈ 16×16 boxes (range
    // sampling blurs boundaries a little); a row-major or random layout
    // would leave one dimension's range at ~63 in every partition
    val avgBox = parts.map(r => (r.getInt(1) + r.getInt(2)) / 2.0).sum / parts.length
    assert(parts.length === 16)
    assert(avgBox < 32.0, s"avg per-partition box side $avgBox — no 2-D locality")
  }
}
