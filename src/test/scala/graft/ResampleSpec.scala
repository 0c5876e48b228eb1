package graft

import graft.ops.Resample
import org.apache.spark.sql.functions._

class ResampleSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = new java.sql.Timestamp(1704067200000L + m * 60000L)
  private val step = 10 * 60000L // 10-minute buckets

  test("forward fill: empty buckets inherit, last-in-bucket wins, ranges per key") {
    val df = Seq(
      (1L, ts(0), 1L, Some(1.0)),
      (2L, ts(5), 1L, Some(5.0)),   // same bucket as minute 0 — later wins
      (3L, ts(35), 1L, Some(35.0)), // buckets 1 and 2 are empty → fill 5.0
      (4L, ts(12), 2L, Some(12.0))) // key 2: single bucket, no fill needed
      .toDF("event_id", "ts", "user_id", "value")
    val got = Resample.forwardFill(df, "user_id", "ts", "event_id", "value", step)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("bucket") % 100000,
        r.getAs[Double]("filled"))).toSet
    val b0 = 1704067200000L / step % 100000
    assert(got === Set(
      (1L, b0, 5.0), (1L, b0 + 1, 5.0), (1L, b0 + 2, 5.0), (1L, b0 + 3, 35.0),
      (2L, b0 + 1, 12.0)))
  }

  test("a genuinely-null observation forward-fills as null, not an older value") {
    val df = Seq(
      (1L, ts(0), 1L, Some(1.0)),
      (2L, ts(15), 1L, None),      // bucket 1's latest value IS null
      (3L, ts(35), 1L, Some(3.0)))
      .toDF("event_id", "ts", "user_id", "value")
    val rows = Resample.forwardFill(df, "user_id", "ts", "event_id", "value", step)
      .orderBy("bucket").collect()
    assert(rows.length === 4)
    assert(rows(0).getDouble(2) === 1.0)
    assert(rows(1).isNullAt(2)) // null observed — not resurrected 1.0
    assert(rows(2).isNullAt(2)) // empty bucket inherits the null
    assert(rows(3).getDouble(2) === 3.0)
  }
}
