package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.Graph

/** Scaling probe for the ITERATIVE graph operators (test scope, not
  * shipped): per SF, record both seconds and ROUND COUNTS — rounds, not
  * seconds, are the 100× cost driver for a peel (each round is a full
  * shuffle of the surviving relation), so SCALE.md pins how round depth
  * moves with data size. Run:
  *   sbt "Test/runMain graft.RoundsProbe"
  */
object RoundsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

    def consume(df: DataFrame): Unit = {
      df.agg(count(xxhash64(struct(col("*"))))).head(); ()
    }
    def timed[A](name: String, sf: String)(body: => (DataFrame, Int)): Unit = {
      val t0 = System.nanoTime()
      val (df, rounds) = body
      consume(df)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$sf%-24s $name%-22s rounds=$rounds%2d  $sec%6.2f s")
      GraftStorage.clear(spark)
    }

    for (sf <- sfs) {
      val docs = Tables(spark, sf, "documents")
      // the q_graph_ktruss bigram graph (skip-1 bigrams, self-loop-free)
      val pairs = graft.pipeline.Text.bindArray(
        filter(split(lower(col("text")), "[^a-z]+"), w => length(w) > 0)) { ws =>
        filter(transform(ws, (x, i) =>
          when(i < size(ws) - 1, struct(x.as("src"), element_at(ws, i + 2).as("dst")))),
          p => p.isNotNull)
      }
      val bigramE = docs.select(explode(pairs).as("pr"))
        .select(col("pr.src").as("src"), col("pr.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
        .withColumn("w", lit(1.0)).withColumn("type", lit("B"))
      val bigramG = Graph(Graph.verticesOf(bigramE), bigramE)
      timed("kTruss(k=30)", sf)(bigramG.kTrussWithRounds(k = 30))

      val eventsG = Queries.eventsGraph(spark, sf)
      timed("kCore(k=4)", sf)(eventsG.kCoreWithRounds(k = 4))

      // NN-descent: exactly ONE round by construction — recorded so the
      // SCALE.md table states the bound rather than implying convergence
      val emb = Tables(spark, sf, "embeddings").select(col("vec_id"), col("embedding"))
      timed("nnDescent(1 round)", sf)((
        graft.pipeline.SimilarityLsh.nnDescentRound(emb,
          graft.pipeline.SimilarityLsh.topK(emb, k = 3, numPlanes = 8, numTables = 6),
          k = 3), 1))

      // walk family: rounds == maxLen by construction (one frontier
      // equi-join per step); timed to pin the per-step slope
      def docWordGraph: Graph = {
        val fw = docs.filter(col("doc_id") < 12)
          .select(col("doc_id").cast("string").as("src"),
            explode(array_distinct(
              filter(split(lower(col("text")), "[^a-z]+"), w => length(w) > 0))).as("dst"))
        val sym = fw.unionByName(fw.select(col("dst").as("src"), col("src").as("dst")))
          .withColumn("w", lit(1.0)).withColumn("type", lit("B"))
        Graph(Graph.verticesOf(sym), sym)
      }
      timed("walks(maxLen=4)", sf)((docWordGraph.deterministicWalks(4), 4))
      timed("walksCapped(deg<=3)", sf)((docWordGraph.deterministicWalks(4, maxDegree = 3), 4))
      timed("node2vec(maxLen=4)", sf)((docWordGraph.node2vecWalks(4), 4))
    }
    spark.stop()
  }
}
