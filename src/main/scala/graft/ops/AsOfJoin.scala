package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal as-of join — for each left row, the most recent right payload
  * with `right.ts <= left.ts` in the same key group. Spark has no native
  * as-of join; the naive formulation is a range join (`l.ts >= r.ts`
  * theta-join → BroadcastNestedLoop, quadratic per key). This is the
  * union+window rewrite: tag both sides, union, one shuffle on the key,
  * and a running `last(payload, ignoreNulls)` over a ROWS frame — O(n log n)
  * per key, shuffle-partitioned, AQE-friendly.
  *
  * Determinism: the window order `(ts, side, seq)` is total (seq must be
  * unique per side within a key, e.g. an event id). Right rows sort before
  * left rows at equal `ts`, so a same-timestamp payload IS visible; among
  * equal-ts right rows the largest `seq` wins.
  *
  * The payload rides in a single-field struct, so the left-row marker
  * (null STRUCT, skipped by `last(_, ignoreNulls)`) stays distinguishable
  * from a genuinely-null payload value (non-null struct wrapping null) —
  * a right row whose latest payload is NULL correctly yields NULL instead
  * of resurrecting an older non-null one.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame,
           key: String, ts: String, seq: String,
           payload: String, asofCol: String = "asof_value"): DataFrame = {
    val leftCols = left.columns.toSeq
    val pType = right.schema(payload).dataType
    val boxType = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("v", pType)))
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(boxType))
    val r = right.select(
      col(key), col(ts), col(seq),
      lit(0).as("__side"), struct(col(payload).cast(pType).as("v")).as("__p"))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("__side"), col(seq))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__asof_box", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) :+ col("__asof_box.v").as(asofCol): _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right payload with
    * `right.ts >= left.ts` in the key group — the "next event after"
    * lookup (e.g. first purchase after a click). Same union+window rewrite
    * mirrored: right rows sort AFTER left rows at equal ts (so an
    * equal-timestamp payload is visible), the frame runs current-row →
    * unbounded FOLLOWING, and `first(_, ignoreNulls)` picks the nearest
    * future payload; among equal-ts right rows the SMALLEST seq wins.
    */
  def asOfForward(left: DataFrame, right: DataFrame,
                  key: String, ts: String, seq: String,
                  payload: String, asofCol: String = "asof_value"): DataFrame = {
    val leftCols = left.columns.toSeq
    val pType = right.schema(payload).dataType
    val boxType = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("v", pType)))
    val l = left
      .withColumn("__side", lit(0))
      .withColumn("__p", lit(null).cast(boxType))
    val r = right.select(
      col(key), col(ts), col(seq),
      lit(1).as("__side"), struct(col(payload).cast(pType).as("v")).as("__p"))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("__side"), col(seq))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u.withColumn("__asof_box", first(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select(leftCols.map(col) :+ col("__asof_box.v").as(asofCol): _*)
  }

  /** Backward as-of with a TOLERANCE: like [[asOf]] but a match older than
    * `toleranceMs` yields null — the standard time-series guard against
    * joining against stale state (`ts` must be a timestamp column). The
    * matched right row's ts rides in the box next to the payload, so the
    * staleness test happens after the single window pass.
    */
  def asOfWithin(left: DataFrame, right: DataFrame,
                 key: String, ts: String, seq: String,
                 payload: String, toleranceMs: Long,
                 asofCol: String = "asof_value"): DataFrame = {
    val leftCols = left.columns.toSeq
    val pType = right.schema(payload).dataType
    val boxType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", pType),
      org.apache.spark.sql.types.StructField("t", right.schema(ts).dataType)))
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(boxType))
    val r = right.select(
      col(key), col(ts), col(seq),
      lit(0).as("__side"),
      struct(col(payload).cast(pType).as("v"), col(ts).as("t")).as("__p"))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("__side"), col(seq))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__asof_box", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) :+
        when(unix_millis(col(ts)) - unix_millis(col("__asof_box.t")) <= toleranceMs,
          col("__asof_box.v")).as(asofCol): _*)
  }
}
