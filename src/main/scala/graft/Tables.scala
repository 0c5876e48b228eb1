package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the harness testdata tables (TESTDATA.md): one parquet per
  * table under the per-scale-factor testdata dirs. Explicit-path parquet
  * reads keep partition pruning / column pruning / filter pushdown
  * available to Catalyst at any scale.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * 4 rejects outright. Read it as a long (nanos) and convert to a
    * microsecond timestamp — the data is micro-aligned, so `div 1000` is
    * exact and matches what DuckDB (which reads the same column as a
    * microsecond TIMESTAMP) sees.
    *
    * SESSION-WIDE SIDE EFFECT, by design: `nanosAsLong` is a SQL conf, not
    * a per-read datasource option, and it is consulted again at execution
    * time (scan planning captures the session's Hadoop conf lazily), so a
    * set-then-restore around the lazy `read` would break the query it just
    * configured. Consequence: after the first `Tables.events` call, any
    * OTHER TIMESTAMP(NANOS) parquet read in the same session silently
    * yields nanosecond longs instead of failing loudly — convert such
    * columns explicitly, as done here. Same pattern (and same caveat) in
    * [[graft.streaming.EventStream.read]].
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
