package graft

import graft.sources.BucketedTables
import org.apache.spark.sql.functions._

class BucketedTablesSpec extends SparkTestBase {
  import spark.implicits._

  private def cleanup(tables: String*): Unit =
    tables.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a crashed previous run can leave the managed location behind with
      // no catalog entry (fresh in-memory catalog per JVM) — remove it or
      // saveAsTable fails with LOCATION_ALREADY_EXISTS
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (loc.isDirectory) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(); ()
        }
        rm(loc)
      }
    }

  test("same-key same-bucket-count tables join with zero exchanges") {
    cleanup("bk_users", "bk_orders")
    val users = (1L to 200L).map(i => (i, s"u$i")).toDF("uid", "name")
    val orders = (1L to 600L).map(i => (i % 200 + 1, i * 1.5)).toDF("uid", "amount")
    BucketedTables.writeBucketed(users, "bk_users", "uid", 4)
    BucketedTables.writeBucketed(orders, "bk_orders", "uid", 4)

    val joined = BucketedTables.colocatedJoin(spark, "bk_users", "bk_orders", "uid")
    assert(joined.count() === 600L)
    assert(!BucketedTables.hasExchange(joined),
      "bucketed join must not shuffle:\n" + joined.queryExecution.executedPlan)

    // identical result to the plain (shuffled) join
    val plain = users.join(orders, Seq("uid"))
    assert(plain.count() === 600L)
    assert(BucketedTables.hasExchange(plain)) // the contrast case
    cleanup("bk_users", "bk_orders")
  }

  test("bucket-count mismatch degrades to a shuffle — hasExchange catches it") {
    cleanup("bk_a", "bk_b")
    val df = (1L to 50L).map(i => (i, i.toDouble)).toDF("k", "v")
    BucketedTables.writeBucketed(df, "bk_a", "k", 4)
    BucketedTables.writeBucketed(df, "bk_b", "k", 3) // mismatched buckets
    val j = BucketedTables.colocatedJoin(spark, "bk_a", "bk_b", "k")
    assert(j.count() === 50L) // still correct, just not co-located
    assert(BucketedTables.hasExchange(j))
    cleanup("bk_a", "bk_b")
  }
}
