package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object SpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def consume(df: DataFrame): Long = { df.agg(count(xxhash64(struct(col("*"))))).head(); 0L }
    def time(name: String)(body: => DataFrame): Unit = {
      consume(body); GraftStorage.clear(spark)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); consume(body); GraftStorage.clear(spark)
        (System.nanoTime() - t0) / 1e9 }
      println(f"$name%-28s ${ts.sorted.apply(1)}%6.2f s")
    }
    val g = Queries.eventsGraph(spark, d)
    time("sp lazy 2lm 6hop")(g.shortestPathsEager(Seq("1","42"), 6, eager = false))
    time("sp eager 2lm 6hop")(g.shortestPathsEager(Seq("1","42"), 6, eager = true))
    val cl = (e: Boolean) => g.shortestPathsEager(Seq("1","42","77"), 6, eager = e)
      .groupBy(col("id")).agg(count(lit(1)).as("n_reached"), sum(col("distance")).as("dist_sum"))
      .withColumn("mean_dist", col("dist_sum").cast("double")/col("n_reached").cast("double"))
    time("closeness lazy")(cl(false))
    time("closeness eager")(cl(true))
    // hash identity check
    val h1 = g.shortestPathsEager(Seq("1","42","77"), 6, eager=false).agg(sum(xxhash64(struct(col("*"))))).head().getLong(0)
    val h2 = g.shortestPathsEager(Seq("1","42","77"), 6, eager=true).agg(sum(xxhash64(struct(col("*"))))).head().getLong(0)
    println(s"hash lazy=$h1 eager=$h2 equal=${h1==h2}")
    spark.stop()
  }
}
