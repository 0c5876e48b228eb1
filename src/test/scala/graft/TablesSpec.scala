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

  test("every other column the catalog reads keeps its analyzed type") {
    // one assertion per (table, column) the 198-query catalog touches —
    // a silent regeneration with a changed physical type fails HERE
    val expect: Seq[(String, String, DataType)] = Seq(
      ("orders", "o_custkey", LongType),
      ("orders", "o_orderstatus", StringType),
      ("orders", "o_totalprice", DoubleType),
      // timestamp[us] with isAdjustedToUTC=false → NTZ under Spark 4
      // inference; the catalog's date arithmetic and the DuckDB oracle
      // are hash-green against THIS type — a TZ-bearing regeneration
      // would change grouping-boundary semantics, so pin NTZ
      ("orders", "o_orderdate", TimestampNTZType),
      ("orders", "o_orderpriority", StringType),
      ("part", "p_partkey", LongType),
      ("part", "p_name", StringType),
      ("part", "p_brand", StringType),
      ("part", "p_type", StringType),
      ("part", "p_size", IntegerType),
      ("part", "p_retailprice", DoubleType),
      ("supplier", "s_suppkey", LongType),
      ("supplier", "s_name", StringType),
      ("supplier", "s_nationkey", IntegerType),
      ("supplier", "s_acctbal", DoubleType),
      ("nation", "n_nationkey", IntegerType),
      ("nation", "n_name", StringType),
      ("nation", "n_regionkey", IntegerType),
      ("region", "r_regionkey", IntegerType),
      ("region", "r_name", StringType),
      ("customer", "c_name", StringType),
      ("customer", "c_nationkey", IntegerType),
      ("customer", "c_acctbal", DoubleType),
      ("customer", "c_mktsegment", StringType),
      ("documents", "lang", StringType),
      ("documents", "source", StringType),
      ("documents", "n_chars", LongType),
      ("embeddings", "vec_id", LongType),
      ("embeddings", "label", IntegerType))
    for ((t, c, dt) <- expect)
      assert(tbl(t).schema(c).dataType == dt,
        s"$t.$c drifted: expected $dt, got ${tbl(t).schema(c).dataType}")
  }

  test("documents value domains the catalog branches on hold") {
    // lang is a closed 5-language set (lang-id oracle + stratified mixes
    // key on it); source is srcN (per-stratum sampling parses the suffix)
    val langs = tbl("documents").select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs == Set("de", "en", "es", "fr", "zh"),
      s"documents.lang domain drifted: $langs")
    val badSrc = tbl("documents").select("source").distinct()
      .filter(!col("source").rlike("^src[0-9]+$")).count()
    assert(badSrc == 0L, "documents.source no longer matches src[0-9]+")
  }

  test("implicit value-domain contracts: embedding dim, events.ts range, ASCII text") {
    // embeddings are fixed 64-dim — the ANN/PQ/k-means queries assume a
    // constant dimension (PQ subspace split, cosine fold order); a
    // ragged or re-dimensioned regeneration fails here, not 30 rows deep
    val dims = tbl("embeddings")
      .select(size(col("embedding")).as("d")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(dims == Set(64), s"embeddings dim drifted: $dims")
    // events live in a single month (Jan 2024) — the walk/funnel/
    // attribution rows and hourly windows implicitly bucket within it
    val mm = tbl("events").agg(
      min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    val (lo, hi) = (mm.getTimestamp(0), mm.getTimestamp(1))
    assert(lo.toInstant.isAfter(java.time.Instant.parse("2023-12-31T00:00:00Z")) &&
      hi.toInstant.isBefore(java.time.Instant.parse("2024-02-01T00:00:00Z")),
      s"events.ts range drifted: [$lo, $hi]")
    // documents.text is pure ASCII — the phash oracle mixes DuckDB's
    // byte-based strlen with character-based substr/ascii, and
    // StubCodec.phash64 windows UTF-8 BYTES; both are only equivalent
    // on ASCII, so the assumption is CHECKED, not implicit (r7 advice)
    val nonAscii = tbl("documents")
      .filter(octet_length(col("text")) =!= length(col("text"))).count()
    assert(nonAscii == 0L,
      s"$nonAscii documents contain non-ASCII text — the byte/char " +
        "equivalence the phash oracle depends on no longer holds")
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

  test("normalizeTs refuses the NTZ cast under a non-UTC session") {
    import spark.implicits._
    val ntz = Seq((1L, 1700000000123456L)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us"))
        .cast(TimestampNTZType).as("ts"))
    val key = "spark.sql.session.timeZone"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "America/New_York")
      val e = intercept[IllegalArgumentException](Tables.normalizeTs(ntz))
      assert(e.getMessage.contains("UTC"))
    } finally spark.conf.set(key, saved)
  }

  test("isNanosRejection matches only the NANOS footer error class") {
    def ex(msg: String) = new org.apache.spark.SparkException(msg)
    assert(Tables.isNanosRejection(ex(
      "[PARQUET_TYPE_ILLEGAL] Illegal Parquet type: INT64 (TIMESTAMP(NANOS,false)).")))
    // wrapped one level down (scan-task wrapping)
    assert(Tables.isNanosRejection(new RuntimeException("task failed", ex(
      "Illegal Parquet type: INT64 (TIMESTAMP(NANOS,true))"))))
    assert(!Tables.isNanosRejection(ex("[PATH_NOT_FOUND] Path does not exist")))
    assert(!Tables.isNanosRejection(ex("[UNABLE_TO_INFER_SCHEMA] ...")))
    assert(!Tables.isNanosRejection(new RuntimeException(null: String)))
  }

  test("events: a missing file propagates instead of flipping nanosAsLong") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    intercept[Exception](
      Tables.events(spark, "/tmp/does_not_exist_graft").limit(1).count())
    assert(spark.conf.getOption(key) == before,
      "a mere read failure must not set the session-wide nanos conf")
  }
}
