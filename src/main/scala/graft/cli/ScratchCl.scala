package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: isolate the clusteredVectors derivation cost. */
object ScratchCl {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCRATCHCL $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def clustered(e: org.apache.spark.sql.DataFrame) =
      e.select(col("vec_id"), array((0 until 64).map { d =>
        (pmod(pmod(col("vec_id"), lit(16)) * lit(37) + lit(d * 13), lit(17)) - lit(8))
          .cast("double") + col("embedding").getItem(d).cast("double")
      }: _*).as("embedding"))
    // alternative: one let-bound transform over a literal offsets array
    def clustered2(e: org.apache.spark.sql.DataFrame) = {
      val offs = (0 until 64).map(d =>
        ((((0L * 37 + d * 13) % 17) + 17) % 17 - 8).toDouble) // placeholder, per-row below
      e.select(col("vec_id"),
        zip_with(
          transform(sequence(lit(0), lit(63)),
            d => (pmod(pmod(col("vec_id"), lit(16)) * lit(37) + d * lit(13), lit(17)) - lit(8)).cast("double")),
          col("embedding").cast("array<double>"),
          (o, x) => o + x).as("embedding"))
    }
    for (r <- 1 to 3) {
      time(s"emb.count #$r")(emb.count())
      time(s"cl noop #$r") {
        clustered(emb).write.format("noop").mode("overwrite").save()
      }
      time(s"cl2 noop #$r") {
        clustered2(emb).write.format("noop").mode("overwrite").save()
      }
      time(s"cl count-only #$r")(clustered(emb).count())
      time(s"cl hash-consume #$r") {
        clustered(emb).agg(count(xxhash64(struct(col("*"))))).head()
      }
    }
    spark.stop()
  }
}
