package graft

import graft.ops.Smooth

class SmoothSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = new java.sql.Timestamp(1704067200000L + m * 60000L)

  test("ewmaPow2 matches the hand-computed truncated alpha=0.5 EWMA") {
    val df = Seq(
      (1L, ts(1), 1L, 8.0),
      (2L, ts(2), 1L, 4.0),
      (3L, ts(3), 1L, 2.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Smooth.ewmaPow2(df, "user_id", "ts", "event_id", "value", depth = 8)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // row 1: 8/1; row 2: (4 + 8*0.5)/(1.5); row 3: (2 + 4*0.5 + 8*0.25)/(1.75)
    assert(got(1L) === 8.0)
    assert(got(2L) === 8.0 / 1.5)
    assert(got(3L) === 6.0 / 1.75)
  }

  test("short histories renormalize over the weights actually present") {
    val df = Seq((1L, ts(1), 9L, 5.0)).toDF("event_id", "ts", "user_id", "value")
    val got = Smooth.ewmaPow2(df, "user_id", "ts", "event_id", "value").collect()
    assert(got.head.getDouble(2) === 5.0) // single row → ewma is the value itself
  }

  test("window is bounded: rows beyond depth stop contributing") {
    val df = (1 to 10).map(i => (i.toLong, ts(i), 1L, if (i == 1) 1024.0 else 0.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = Smooth.ewmaPow2(df, "user_id", "ts", "event_id", "value", depth = 4)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got(4L) > 0.0)   // row 1 still inside the 4-row window
    assert(got(5L) === 0.0) // row 1 aged out exactly at depth
  }
}
