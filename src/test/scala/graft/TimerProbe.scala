package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch timing probe (test scope, not shipped): stage-by-stage cost of
  * the embedding dim-stats plan. Run:
  *   sbt "Test/runMain graft.TimerProbe /root/testdata/sf0.1"
  */
object TimerProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(df: => DataFrame): Unit = {
      // warm once, then 3 timed
      df.agg(count(xxhash64(struct(col("*"))))).head()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.agg(count(xxhash64(struct(col("*"))))).head()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${ts.sorted.apply(1)}%6.3f s  (${ts.map(t => f"$t%.2f").mkString(",")})")
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    time("scan")(emb)
    time("quantize")(graft.pipeline.Embeddings.quantize(emb))
    val q = graft.pipeline.Embeddings.quantize(emb)
      .select(col("vec_id").as("vid"), posexplode(col("q")))
    time("quantize+posexplode")(q)
    time("explode+agg(dim)")(
      q.select(col("pos").cast("long").as("dim"), col("col").cast("long").as("v"))
        .groupBy("dim").agg(count(lit(1)).as("n"), sum("v").as("s")))
    time("dimStats full")(graft.pipeline.Pca.dimStats(emb))
    val (sumsP, upperP) = graft.pipeline.Pca.covParts(emb, "vec_id", "embedding")
    time("cov sums")(sumsP)
    time("cov upper products")(upperP)
    // fix A: explode raw floats, quantize per exploded row (scalar codegen)
    val e2 = transform(col("embedding"), x => x.cast("double"))
    val scalarRows = emb.select(col("vec_id").as("vid"),
        array_max(transform(e2, x => abs(x))).as("maxabs"), posexplode(e2))
      .select(col("vid"), col("pos").cast("long").as("dim"),
        when(col("maxabs") > 0d,
          floor(col("col") * (lit(127.0) / col("maxabs")) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)).as("v"))
    time("A: scalar-explode rows")(scalarRows)
    time("A: scalar-explode agg")(
      scalarRows.groupBy("dim").agg(count(lit(1)).as("n"), sum("v").as("s"),
        sum(col("v") * col("v")).as("ss")))
    // fix B: persist the quantized arrays, explode from cache
    val qp = graft.pipeline.Embeddings.quantize(emb)
      .select(col("vec_id").as("vid"),
        transform(col("q"), x => x.cast("long")).as("q"))
      .persist()
    qp.count()
    time("B: cached q + posexplode")(qp.select(col("vid"), posexplode(col("q"))))
    val upperB = qp.select(col("q"), posexplode(col("q")))
      .select(col("pos").cast("long").as("i"), col("col").as("vi"),
        posexplode(slice(col("q"), col("pos") + 1, size(col("q")) - col("pos"))))
      .select(col("i"), (col("i") + col("pos")).as("j"), (col("vi") * col("col")).as("vp"))
      .groupBy("i", "j").agg(sum("vp").as("p"))
    time("B: cached upper products")(upperB)
    // shingle-explode paths (the dedup family's front door)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("docs scan")(docs)
    time("words explode")(docs.select(col("doc_id"),
      explode(graft.pipeline.Text.words(col("text"))).as("w")))
    time("shingles explode")(docs.select(col("doc_id"),
      explode(graft.pipeline.Text.shingles(col("text"), 3)).as("sh")))
    val wsCached = docs.select(col("doc_id"),
      graft.pipeline.Text.shingles(col("text"), 3).as("shs")).persist()
    wsCached.count()
    time("shingles cached explode")(wsCached.select(col("doc_id"),
      explode(col("shs")).as("sh")))
    wsCached.unpersist()
    spark.stop()
  }
}
