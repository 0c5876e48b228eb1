package graft.cli

import graft.GraftStorage
import graft.GraftStorage.Syntax
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch per-stage profiler for hierPairs — local investigation only. */
object ScratchHier {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCRATCH $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // clusteredVectors twin
    val cl = emb.select(col("vec_id"), array((0 until 64).map { d =>
      (pmod(pmod(col("vec_id"), lit(16)) * lit(37) + lit(d * 13), lit(17)) - lit(8))
        .cast("double") + col("embedding").getItem(d).cast("double")
    }: _*).as("embedding")).persistTracked()
    val n = time("cl.count")(cl.count())
    import graft.pipeline.{Similarity, SimilarityLsh}
    val numPlanes = 8; val dim = 64; val seed = 42L; val capMult = 1; val nprobe = 4
    val cap = capMult.toLong * math.ceil(math.sqrt(n.toDouble)).toLong
    val planes = SimilarityLsh.hyperplanes(numPlanes, dim, seed)
    val keyed = time("keyed build+persist") {
      val k = cl.select(col("vec_id"), col("embedding"),
        SimilarityLsh.bucketKey(col("embedding"), planes).as("cell")).persistTracked()
      k.count(); k
    }
    val sizes = time("sizes") {
      val s = keyed.groupBy("cell").agg(count(lit(1)).as("m")).persistTracked()
      s.count(); s
    }
    time("st stats head") {
      sizes.agg(count(lit(1)).as("cells"),
        coalesce(sum(when(col("m") > cap, 1L).otherwise(0L)), lit(0L)).as("big"),
        coalesce(sum(when(col("m") > cap, col("m"))), lit(0L)).as("bigm")).head()
    }
    val big = keyed.join(broadcast(sizes.filter(col("m") > cap)), Seq("cell"))
    val Scale = 1L << 20
    val means = big
      .select(col("cell"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
      .select(col("cell"), col("pos"),
        floor(col("v") * Scale).cast("long").as("sv"))
      .groupBy("cell", "pos")
      .agg(sum("sv").as("s"), count(lit(1)).as("cnt"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"),
          (col("s").cast("double") / col("cnt").cast("double") /
            lit(Scale.toDouble)).as("mv")))),
        x => x("mv")).as("mean"))
    val withRes = time("withRes persist+count") {
      val w = big.join(means, Seq("cell"))
        .select(col("vec_id"), col("embedding"), col("cell"), col("m"),
          zip_with(col("embedding").cast("array<double>"), col("mean"),
            (x, mv) => x - mv).as("res"))
        .persistTracked()
      w.count(); w
    }
    val numSub = expr(s"(m + ${cap - 1L}) div ${cap}L")
    val subCents = withRes
      .withColumn("rn", row_number().over(
        Window.partitionBy("cell").orderBy("vec_id")))
      .filter(col("rn") <= numSub)
      .select(col("cell"), col("vec_id").as("scid"), col("res").as("cres"))
    val scored = withRes.join(subCents, Seq("cell"))
      .select(col("vec_id"), col("embedding"), col("cell"), col("scid"),
        Similarity.dot(col("res"), col("cres")).as("sdot"))
    val ranked = time("ranked persist+count") {
      val r = scored.withColumn("pr", row_number().over(
          Window.partitionBy("cell", "vec_id").orderBy(col("sdot").desc, col("scid").asc)))
        .persistTracked()
      r.count(); r
    }
    val membership = ranked.filter(col("pr") === 1)
      .select(col("cell"), col("scid"), col("vec_id"), col("embedding"))
    val hardCap = 16L * cap
    val subSizes = membership.groupBy("cell", "scid").agg(count(lit(1)).as("sm"))
    time("droppedRow head") {
      subSizes.filter(col("sm") > hardCap)
        .agg(coalesce(sum(col("sm")), lit(0L))).head()
    }
    val guarded = membership.join(
      broadcast(subSizes.filter(col("sm") <= hardCap).select("cell", "scid")),
      Seq("cell", "scid"))
    val probes = ranked.filter(col("pr") <= nprobe)
      .select(col("cell"), col("scid"), col("vec_id").as("q_id"),
        col("embedding").as("qe"))
    val bigPairs = probes.join(guarded, Seq("cell", "scid"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(least(col("q_id"), col("vec_id")).as("id1"),
        greatest(col("q_id"), col("vec_id")).as("id2"),
        Similarity.cosine(col("qe"), col("embedding")).as("cos"))
      .distinct()
    time("bigPairs count")(println("  pairs=" + bigPairs.count()))
    val small = keyed.join(broadcast(sizes.filter(col("m") <= cap)), Seq("cell"))
    val smallPairs = small.as("a").hint("SHUFFLE_MERGE")
      .join(small.as("b").hint("SHUFFLE_MERGE"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
    time("smallPairs count")(println("  pairs=" + smallPairs.count()))
    // whole entry points for reference — cleared caches, job-counted
    @volatile var jobs = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks += 1
      }
    })
    def counted[T](label: String)(f: => T): T = {
      GraftStorage.clear(spark)
      jobs = 0; tasks = 0
      val r = time(label)(f)
      println(s"  jobs=$jobs tasks=$tasks")
      r
    }
    counted("hierPairs full consume") {
      val df = graft.pipeline.SimilarityHier.hierPairs(cl, 8, 64, 42L, 1, 4, n)
      df.agg(count(xxhash64(struct(col("*"))))).head()
    }
    counted("sampledHierRecall(0.25)") {
      graft.pipeline.SimilarityHier.sampledHierRecall(cl, 0.25, 50)
    }
    counted("hierPairs shard consume") {
      val shard = cl.filter(md5(concat(lit("shard:"), col("vec_id").cast("string"))) < lit("4000")).persistTracked()
      val sn = shard.count()
      val df = graft.pipeline.SimilarityHier.hierPairs(shard, 8, 64, 42L, 1, 4, sn)
      df.agg(count(xxhash64(struct(col("*"))))).head()
    }
    counted("rankTopK(shard hierPairs)") {
      val shard = cl.filter(md5(concat(lit("shard:"), col("vec_id").cast("string"))) < lit("4000")).persistTracked()
      val sn = shard.count()
      val df = graft.pipeline.SimilarityHier.knnGraphHier(shard, 3, capMult = 1,
        nprobe = 4, knownCount = sn)
      df.agg(count(xxhash64(struct(col("*"))))).head()
    }
    counted("sampledHierRecall(0.25) again") {
      graft.pipeline.SimilarityHier.sampledHierRecall(cl, 0.25, 50)
    }
    GraftStorage.clear(spark)
    spark.stop()
  }
}
