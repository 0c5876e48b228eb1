package graft.cli

import graft.GraftStorage
import graft.pipeline.{SimilarityIvf, SimilarityLsh}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the IVF kNN-graph recall curve (the SCALE.md probe for the
  * saturation-escalation path): mean top-3 recall of
  * [[SimilarityIvf.knnGraphRecallAudit]] across 50 anchors at each
  * `nprobe`, plus wall time — the two numbers a run weighs when the
  * nprobe=1 audit reads too low. Cells sized by the production
  * [[SimilarityLsh.cellsFor]].
  *
  * Usage: `sbt "runMain graft.cli.IvfProbe <sfDir> [nprobe,...] [table]"`
  * — `table` defaults to `embeddings`; pass `embeddings_clustered`
  * (GenScale's deterministic mixture corpus) to read the curve in the
  * quantizer's FAVORABLE regime.
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val probes = args.lift(1).map(_.split(',').toSeq.map(_.toInt))
      .getOrElse(Seq(1, 2, 4))
    val table = args.lift(2).getOrElse("embeddings")
    // 4th arg: k-means refinement passes — >0 probes the TRAINED
    // quantizer (knnGraphTrainedRecallAudit) instead of multi-probe;
    // the lever that matters when a clustered corpus outgrows the
    // fixed first-k centroids (same-cluster centroids are near-ties,
    // so √n cells SPLIT clusters and fixed-quantizer recall decays)
    val iters = args.lift(3).map(_.toInt).getOrElse(0)
    // 5th arg: explicit cell count — overrides cellsFor(n). The probe
    // for the OTHER structural lever on clustered corpora: cells sized
    // to the mixture-component count instead of √n (√n subdivides
    // clusters across near-tied centroids and recall decays — the r12
    // SCALE.md finding)
    val cellsOverride = args.lift(4).map(_.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"$dir/$table.parquet")
      .select(col("vec_id"), col("embedding"))
    val cells = cellsOverride.getOrElse(SimilarityLsh.cellsFor(emb.count()))
    probes.foreach { np =>
      val t0 = System.nanoTime()
      val mean = GraftStorage.withTracked(spark) {
        (if (iters > 0)
          SimilarityIvf.knnGraphTrainedRecallAudit(emb, k = 3, nAnchors = 50,
            numCells = cells, iters = iters)
        else
          SimilarityIvf.knnGraphRecallAudit(emb, k = 3, nAnchors = 50,
            numCells = cells, nprobe = np))
          .agg(avg(col("recall"))).head().getDouble(0)
      }
      println(f"IVFPROBE dir=$dir table=$table cells=$cells nprobe=$np " +
        f"iters=$iters recall=$mean%.3f sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
