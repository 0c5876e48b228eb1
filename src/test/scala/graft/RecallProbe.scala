package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall-vs-numTables probe for the self-sizing kNN graph (test scope,
  * not shipped): runs [[graft.pipeline.SimilarityLsh.knnRecallAudit]]
  * at each SF × table count and prints mean recall — the measurement
  * behind SCALE.md's "numTables is the recall knob" row. Run:
  *   sbt "Test/runMain graft.RecallProbe [sfDir ...]"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1", "/tmp/sfx1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    for (d <- dirs; tables <- Seq(6, 12, 24)) {
      val emb = Tables(spark, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val t0 = System.nanoTime()
      val r = GraftStorage.withTracked(spark) {
        graft.pipeline.SimilarityLsh.knnRecallAudit(emb, k = 3,
            nAnchors = 50, numTables = tables)
          .agg(avg(col("recall")).as("mean_recall")).head().getDouble(0)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"RECALL dir=$d tables=$tables mean_recall=$r%.3f sec=$dt%.1f")
    }
    spark.stop()
  }
}
