package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned parquet layout — the PARTITION PRUNING
  * primitive: lay data out as `.../part_col=value/` directories once, and
  * every query filtering on the partition column reads only the matching
  * directories. At 100 TB with daily partitions, a one-day query scans
  * 1/365th of the files — before any row is decoded.
  *
  * Partition columns should be LOW cardinality (dates, regions, event
  * types): each value is a directory, and millions of tiny partitions
  * drown the driver in file listing — the opposite failure mode from
  * bucketing (which handles high-cardinality join keys).
  */
object PartitionedTables {

  /** Write `df` partitioned by `partCol` (derived columns welcome — e.g.
    * `to_date(ts)` — pass the materialized column name).
    */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Number of partition directories the plan will actually read — the
    * observable pruning contract (equals total partitions when the filter
    * does not reach the partition column).
    */
  def partitionsRead(df: DataFrame): Long = {
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    scans.map(_.relation.location.listFiles(
      scans.head.partitionFilters, scans.head.dataFilters).size.toLong).sum
  }

  /** Events table partitioned by event_type then filtered to one type —
    * the canonical prune: the filter never touches row data.
    */
  def demo(spark: SparkSession, events: DataFrame, path: String,
           eventType: String): DataFrame = {
    writePartitioned(events, path, "event_type")
    read(spark, path).filter(col("event_type") === eventType)
  }
}
