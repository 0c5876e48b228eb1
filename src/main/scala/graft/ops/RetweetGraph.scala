package graft.ops

import graft.graph.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retweet graph (reference `RetweetTagsJaccardGraph.py:48-72`): edge
  * src→dst where `src` is the original author
  * (`retweeted_status.user.id`) and `dst` the retweeting user (`user.id`),
  * weighted by retweet count.
  *
  * Scale notes: filter + nested projection sit directly on the JSON scan
  * (Catalyst pushes the `IsNotNull` and prunes the nested schema); the one
  * shuffle is the groupBy on (src, dst) with map-side partial aggregation.
  */
object RetweetGraph {

  /** Edges `(src, dst, w, type="RT")`. Ids are cast to string up front —
    * the reference's heterogeneous vertex unions coerce them anyway
    * (SURVEY.md §1.2) and pinning the type early keeps every downstream
    * comparison (including Jaccard's `id1 > id2`) consistent.
    */
  def edges(tweets: DataFrame): DataFrame =
    tweets
      .filter(col("retweeted_status").isNotNull)
      .select(
        col("retweeted_status.user.id").cast("string").as("src"),
        col("user.id").cast("string").as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .select(col("src"), col("dst"), col("w").cast("double").as("w"),
        lit("RT").as("type"))

  def apply(tweets: DataFrame): Graph = {
    val e = edges(tweets)
    Graph(Graph.verticesOf(e), e)
  }
}
