package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema guard over the driver-generated testdata (TESTDATA.md): the
  * driver regenerates /root/testdata between rounds and has changed
  * physical types before (events.ts went TIMESTAMP(NANOS) →
  * timestamp[us] between r4 and r5, silently breaking 66 queries). Open
  * every table through [[Tables.apply]] and pin the ANALYZED schema so
  * drift fails here with a readable message instead of 66 downstream
  * query errors.
  */
class TablesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def tbl(name: String) = Tables(spark, dir, name)

  test("every testdata table loads and is non-empty") {
    for (n <- Tables.names) {
      val df = tbl(n)
      assert(df.limit(1).count() == 1L, s"table $n is empty or unreadable")
    }
  }

  test("events: ts normalizes to session-TZ TIMESTAMP, keys are long") {
    val s = tbl("events").schema
    assert(s("ts").dataType == TimestampType,
      s"events.ts must normalize to TIMESTAMP, got ${s("ts").dataType}")
    assert(s("event_id").dataType == LongType)
    assert(s("user_id").dataType == LongType)
    assert(s("value").dataType == DoubleType)
    assert(s("event_type").dataType == StringType)
    // values are sane: micro-aligned 2020s timestamps, not 1970 (a wrong
    // div-factor or a nanos-as-micros misread lands decades away)
    val yr = tbl("events").select(year(col("ts"))).head().getInt(0)
    assert(yr >= 2000 && yr <= 2100, s"events.ts year out of range: $yr")
  }

  test("fact/dim key and measure types hold") {
    assert(tbl("lineitem").schema("l_orderkey").dataType == LongType)
    assert(tbl("lineitem").schema("l_quantity").dataType == DoubleType)
    assert(tbl("orders").schema("o_orderkey").dataType == LongType)
    assert(tbl("customer").schema("c_custkey").dataType == LongType)
    assert(tbl("documents").schema("doc_id").dataType == LongType)
    assert(tbl("documents").schema("text").dataType == StringType)
    assert(tbl("embeddings").schema("embedding").dataType ==
      ArrayType(FloatType, containsNull = true))
  }

  test("normalizeTs covers both historical physical encodings") {
    import spark.implicits._
    // long-typed nanos (the r1-r4 TIMESTAMP(NANOS)-as-long form)
    val nanos = Seq((1L, 1700000000123456000L)).toDF("event_id", "ts")
    val fromNanos = Tables.normalizeTs(nanos)
    assert(fromNanos.schema("ts").dataType == TimestampType)
    assert(fromNanos.select(unix_micros(col("ts"))).head().getLong(0) ==
      1700000000123456L)
    // NTZ (the current timestamp[us] form) — cast is exact under UTC
    val ntz = Seq((1L, 1700000000123456L)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us"))
        .cast(TimestampNTZType).as("ts"))
    val fromNtz = Tables.normalizeTs(ntz)
    assert(fromNtz.schema("ts").dataType == TimestampType)
    assert(fromNtz.select(unix_micros(col("ts"))).head().getLong(0) ==
      1700000000123456L)
    // already-TIMESTAMP passes through untouched
    val tz = Seq((1L, new java.sql.Timestamp(1700000000123L))).toDF("event_id", "ts")
    assert(Tables.normalizeTs(tz).schema("ts").dataType == TimestampType)
  }
}
