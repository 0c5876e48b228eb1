package graft.cli

import graft.GraftStorage
import graft.pipeline.SimilarityHier
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the two-level hierarchical IVF recall/cost surface (the
  * SCALE.md probe for r12 verdict task 1): mean top-3 recall of
  * [[SimilarityHier.knnGraphHierRecallAudit]] plus candidate-pair count
  * and wall time, per (capMult, nprobe) point.
  *
  * Usage: `sbt "runMain graft.cli.HierProbe <sfDir> [capMult:nprobe,...]
  * [table]"` — `table` defaults to `embeddings_clustered` (GenScale's
  * deterministic mixture corpus, the regime this index exists for).
  */
object HierProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val points = args.lift(1)
      .map(_.split(',').toSeq.map { s =>
        val Array(c, p) = s.split(':'); (c.toInt, p.toInt)
      })
      .getOrElse(Seq((1, 2), (1, 4), (4, 4)))
    val table = args.lift(2).getOrElse("embeddings_clustered")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"$dir/$table.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    points.foreach { case (capMult, nprobe) =>
      val t0 = System.nanoTime()
      val (mean, pairs) = GraftStorage.withTracked(spark) {
        val m = SimilarityHier.knnGraphHierRecallAudit(emb, k = 3,
            nAnchors = 50, capMult = capMult, nprobe = nprobe)
          .agg(sum(col("n_caught")).cast("double") /
            sum(col("n_truth")).cast("double")).head().getDouble(0)
        val p = SimilarityHier.hierPairs(emb, 8, 64, 42L, capMult, nprobe, n)
          .count()
        (m, p)
      }
      println(f"HIERPROBE dir=$dir table=$table n=$n capMult=$capMult " +
        f"nprobe=$nprobe recall=$mean%.3f pairs=$pairs " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
