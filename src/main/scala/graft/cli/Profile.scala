package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch per-stage profiler for local plan investigation — times the
  * pieces of a catalog query independently so a regression can be
  * attributed to a stage instead of eyeballed from the whole-plan time.
  * Not part of the driver contract; run with
  * `sbt "runMain graft.cli.Profile <name>"`.
  */
object Profile {
  private def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"PROFILE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    args.headOption.getOrElse("containment") match {
      case "containment" => profileContainment(spark, docs)
      case "clusters" => profileClusters(spark, docs)
      case other => sys.error(s"unknown profile target: $other")
    }
    spark.stop()
  }

  private def profileClusters(spark: SparkSession, docs: DataFrame): Unit = {
    import graft.pipeline.Dedup
    docs.count()
    time("ngramJaccardPairs") {
      Dedup.ngramJaccardPairs(docs, minShared = 2L, minJaccard = 0.5).count()
    }
    graft.GraftStorage.clear(spark)
    time("components(full)") {
      Dedup.components(
        Dedup.ngramJaccardPairs(docs, minShared = 2L, minJaccard = 0.5)
          .select(col("id1"), col("id2"))).count()
    }
    graft.GraftStorage.clear(spark)
    time("dedupByClusters(full)") {
      Dedup.dedupByClusters(docs,
        Dedup.ngramJaccardPairs(docs, minShared = 2L, minJaccard = 0.5)
          .select(col("id1"), col("id2"))).count()
    }
    graft.GraftStorage.clear(spark)
  }

  private def profileContainment(spark: SparkSession, docs: DataFrame): Unit = {
    import graft.pipeline.Dedup
    // warm (parquet footers, codegen)
    docs.count()
    time("docShingles") {
      Dedup.docShingles(docs, "doc_id", "text", 3).count()
    }
    val docsets = Dedup.docShingleSets(docs, "doc_id", "text", 3)
    time("docShingleSets(materialize)") { docsets.count() }
    val ranked = Dedup.explodeRanked(docsets)
    time("explodeRanked") { ranked.count() }
    val pref = Dedup.explodePrefix(docsets,
      (col("nsh") - ceil(lit(0.6) * col("nsh")) + 2).cast("int"))
    time("explodePrefix") { pref.count() }
    val needed = ceil(lit(0.6) * col("a.nsh")) - 1
    val cand = pref.as("a").join(ranked.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") =!= col("b.id") &&
          col("a.nsh") <= col("b.nsh") &&
          lit(1) + least(col("a.nsh") - col("a.rnk"), col("b.nsh") - col("b.rnk")) >= needed)
      .select(least(col("a.id"), col("b.id")).as("id1"),
        greatest(col("a.id"), col("b.id")).as("id2"))
      .distinct()
    val candPre = pref.as("a").join(ranked.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") =!= col("b.id") &&
          col("a.nsh") <= col("b.nsh") &&
          lit(1) + least(col("a.nsh") - col("a.rnk"), col("b.nsh") - col("b.rnk")) >= needed)
    time("candidates(pre-distinct)") { candPre.count() }
    time("candidates(join+distinct)") { cand.count() }
    val verified = cand
      .join(docsets.as("s1"), col("id1") === col("s1.id"))
      .join(docsets.as("s2"), col("id2") === col("s2.id"))
      .select(col("id1"), col("id2"),
        graft.functions.VectorFunctions.sortedIntersectCount(
          col("s1.sorted"), col("s2.sorted")).as("shared"),
        col("s1.nsh").as("nsh1"), col("s2.nsh").as("nsh2"))
      .select(col("id1"), col("id2"), col("shared"),
        (col("shared").cast("double") / col("nsh1").cast("double")).as("c12"),
        (col("shared").cast("double") / col("nsh2").cast("double")).as("c21"))
      .filter(greatest(col("c12"), col("c21")) >= 0.6)
    val candP = cand.persist()
    time("candidates(materialize)") { candP.count() }
    val verifiedP = candP
      .join(docsets.as("s1"), col("id1") === col("s1.id"))
      .join(docsets.as("s2"), col("id2") === col("s2.id"))
      .select(col("id1"), col("id2"),
        graft.functions.VectorFunctions.sortedIntersectCount(
          col("s1.sorted"), col("s2.sorted")).as("shared"),
        col("s1.nsh").as("nsh1"), col("s2.nsh").as("nsh2"))
      .select(col("id1"), col("id2"), col("shared"),
        (col("shared").cast("double") / col("nsh1").cast("double")).as("c12"),
        (col("shared").cast("double") / col("nsh2").cast("double")).as("c21"))
      .filter(greatest(col("c12"), col("c21")) >= 0.6)
    time("verify(on cached cand)") { verifiedP.count() }
    println(verifiedP.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Aggregate"))
      .mkString("\n"))
    candP.unpersist()
    time("verify") { verified.count() }
    time("full containmentPairs") {
      graft.GraftStorage.clear(spark)
      Dedup.containmentPairs(docs, minContainment = 0.6).count()
    }
    graft.GraftStorage.clear(spark)
  }
}
