package graft

import graft.sources.PartitionedTables
import org.apache.spark.sql.functions._

class PartitionedTablesSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = new java.io.File(
    System.getProperty("java.io.tmpdir"), "graft_part_spec").getPath

  private val events = Seq(
    (1L, "click", 1.0), (2L, "click", 2.0),
    (3L, "view", 3.0), (4L, "purchase", 4.0))
    .toDF("event_id", "event_type", "value")

  test("partition-column filter prunes directories before reading rows") {
    PartitionedTables.writePartitioned(events, dir, "event_type")
    val all = PartitionedTables.read(spark, dir)
    assert(PartitionedTables.partitionsRead(all) === 3L) // click, view, purchase

    val clicks = all.filter(col("event_type") === "click")
    assert(PartitionedTables.partitionsRead(clicks) === 1L) // pruned to one dir
    assert(clicks.collect().map(_.getAs[Long]("event_id")).toSet === Set(1L, 2L))

    // non-partition filters don't prune (they push down into the scan instead)
    val byValue = all.filter(col("value") > 2.5)
    assert(PartitionedTables.partitionsRead(byValue) === 3L)
    assert(byValue.count() === 2L)
  }

  test("partition column round-trips values and stays queryable") {
    PartitionedTables.writePartitioned(events, dir, "event_type")
    val back = PartitionedTables.read(spark, dir)
    assert(back.count() === 4L)
    assert(back.select("event_type").distinct().count() === 3L)
    // partition pruning composes with aggregation
    val agg = back.filter(col("event_type") === "view")
      .agg(sum("value")).head().getDouble(0)
    assert(agg === 3.0)
  }
}
