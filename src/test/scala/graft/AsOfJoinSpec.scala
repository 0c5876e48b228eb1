package graft

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(m: Int) = new java.sql.Timestamp(1704067200000L + m * 60000L)

  test("asOf attaches the latest right payload at or before each left ts") {
    val left = Seq(
      (10L, ts(5), 1L),   // equal-ts right row must be visible
      (11L, ts(10), 1L),  // latest of two earlier rights wins
      (12L, ts(1), 2L))   // no right rows for this key → null
      .toDF("event_id", "ts", "user_id")
    val right = Seq(
      (100L, ts(5), 1L, 5.0),
      (101L, ts(8), 1L, 8.0),
      (102L, ts(3), 3L, 3.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id", "value")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("asof_value"))) None else Some(r.getAs[Double]("asof_value"))))
      .toMap
    assert(got === Map(10L -> Some(5.0), 11L -> Some(8.0), 12L -> None))
  }

  test("a genuinely-null latest payload yields null, not an older value") {
    val left = Seq((1L, ts(5), 7L)).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (50L, ts(1), 7L, Some(5.0)),
      (51L, ts(3), 7L, None))  // latest payload is NULL — must win
      .toDF("event_id", "ts", "user_id", "value")
    val rows = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id", "value").collect()
    assert(rows.length === 1)
    assert(rows.head.isNullAt(rows.head.fieldIndex("asof_value")))
  }

  test("equal-ts right rows: largest seq wins; left rows pass through unchanged") {
    val left = Seq((1L, ts(2), 7L)).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (50L, ts(2), 7L, 1.0),
      (51L, ts(2), 7L, 2.0))  // same ts, higher seq → wins
      .toDF("event_id", "ts", "user_id", "value")
    val rows = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id", "value").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Double]("asof_value") === 2.0)
    assert(rows.head.getAs[Long]("event_id") === 1L)
  }

  test("asOfForward: earliest right at/after each left ts; equal ts visible") {
    val left = Seq(
      (10L, ts(5), 1L),   // equal-ts right must be visible
      (11L, ts(6), 1L),   // next future right (ts 8) wins over past (ts 5)
      (12L, ts(9), 1L))   // nothing after → null
      .toDF("event_id", "ts", "user_id")
    val right = Seq(
      (100L, ts(5), 1L, 5.0),
      (101L, ts(8), 1L, 8.0))
      .toDF("event_id", "ts", "user_id", "value")
    val got = AsOfJoin.asOfForward(left, right, "user_id", "ts", "event_id", "value")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("asof_value"))) None else Some(r.getAs[Double]("asof_value"))))
      .toMap
    assert(got === Map(10L -> Some(5.0), 11L -> Some(8.0), 12L -> None))
  }

  test("asOfForward equal-ts ties: smallest right seq wins") {
    val left = Seq((1L, ts(2), 7L)).toDF("event_id", "ts", "user_id")
    val right = Seq(
      (50L, ts(2), 7L, 1.0),
      (51L, ts(2), 7L, 2.0))
      .toDF("event_id", "ts", "user_id", "value")
    val rows = AsOfJoin.asOfForward(left, right, "user_id", "ts", "event_id", "value").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Double]("asof_value") === 1.0)
  }

  test("asOfWithin: stale matches (older than tolerance) become null") {
    val left = Seq(
      (10L, ts(5), 1L),   // match at ts 4 → 1 min old, inside 2-min tolerance
      (11L, ts(10), 1L))  // same match now 6 min old → null
      .toDF("event_id", "ts", "user_id")
    val right = Seq((100L, ts(4), 1L, 4.0)).toDF("event_id", "ts", "user_id", "value")
    val got = AsOfJoin.asOfWithin(left, right, "user_id", "ts", "event_id", "value",
        toleranceMs = 2 * 60 * 1000L)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(r.fieldIndex("asof_value"))) None else Some(r.getAs[Double]("asof_value"))))
      .toMap
    assert(got === Map(10L -> Some(4.0), 11L -> None))
  }
}
