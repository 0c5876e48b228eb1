package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B: common-neighbors wedge aggregation with string vs long
  * vertex keys, and with/without pre-exchange on the wedge side.
  */
object ScratchLp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCHLP $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    def run(e: DataFrame, label: String): Unit = {
      import graft.GraftStorage.Syntax
      val und = e.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
        .persistTracked()
      val nbr = und.union(und.select(col("b"), col("a"))).toDF("v", "n")
      val deg = nbr.groupBy(col("n").as("hub")).agg(count(lit(1)).as("d"))
        .filter(col("d") <= 200)
      val wedge = nbr.join(deg, nbr("n") === deg("hub")).select(col("v"), col("n"))
        .persistTracked()
      val pairs = wedge.as("l")
        .join(wedge.as("r"), col("l.n") === col("r.n") && col("l.v") < col("r.v"))
        .groupBy(col("l.v").as("a"), col("r.v").as("b"))
        .agg(count(lit(1)).as("common"))
        .filter(col("common") >= 2)
      val out = pairs.join(und, Seq("a", "b"), "left_anti")
      time(label)(out.agg(count(xxhash64(struct(col("*"))))).head())
      graft.GraftStorage.clear(spark)
    }
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val eStr = ev.select(col("user_id").cast("string").as("src"),
      ((col("event_id") % 2000) + 1).cast("string").as("dst"))
    val eLong = ev.select(col("user_id").as("src"),
      ((col("event_id") % 2000) + 1).as("dst"))
    // warmup both
    run(eStr, "warm string"); run(eLong, "warm long")
    run(eStr, "string keys"); run(eLong, "long keys")
    run(eStr, "string keys (2)"); run(eLong, "long keys (2)")
    spark.stop()
  }
}
