package graft

/** The determinism contract, asserted MECHANICALLY for every catalog row:
  * running a query under different shuffle-partition counts (and thus
  * different physical partitionings, aggregation orders, and task
  * boundaries) must produce the IDENTICAL result set. This is the
  * property the whole DuckDB-oracle scheme rests on — each query's
  * scaladoc argues it locally (decimal-exact sums, integer-ratio doubles,
  * md5 draws, total-order tie-breaks); this suite stops trusting the
  * argument and replays every row both ways at sf0.001.
  *
  * A failure here means a nondeterministic aggregate order leaked into a
  * float, a window lacks a total-order tie-break, or a limit rides an
  * unordered relation — exactly the bug class that passes a single-run
  * oracle compare by luck and then flips at 100 TB.
  */
class DeterminismAuditSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** Partition-order-free canonical form: sorted JSON rows. Same JVM,
    * same values → same JSON strings; sorting removes row order.
    */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.toJSON.collect().toSeq.sorted

  test("every catalog query is bit-identical under different shuffle partitionings") {
    assume(new java.io.File(sfDir).isDirectory)
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        spark.conf.set(key, "3")
        val a = canon(fn(spark, sfDir))
        GraftStorage.clear(spark)
        spark.conf.set(key, "7")
        val b = canon(fn(spark, sfDir))
        GraftStorage.clear(spark)
        if (a != b) bad += name
      }
    } finally {
      spark.conf.set(key, prev)
      GraftStorage.clear(spark)
    }
    assert(bad.isEmpty, s"shuffle-partitioning-sensitive results: $bad")
  }
}
