package graft.ops

import graft.GraftStorage.Syntax
import graft.graph.Graph
import org.apache.spark.sql.DataFrame

/** The full reference pipeline (constructor,
  * `RetweetTagsJaccardGraph.py:13-46`): retweet graph + hashtag graph +
  * Jaccard graph unified over a heterogeneous vertex set.
  *
  * The per-user tag mapping feeds BOTH the Jaccard graph and the report;
  * the reference recomputes that subtree on every action (SURVEY.md §7.4
  * #6) — here it is cached once.
  */
final case class TweetGraphs(
    retweet: Graph,
    hashtag: Graph,
    userTags: DataFrame,
    jaccard: Graph,
    full: Graph) {

  def report: DataFrame = Report.build(userTags, retweet.edges, jaccard.edges)

  def neighbours(id: String): Graph = Neighbours.extract(full, id)
}

object TweetGraphPipeline {

  def build(tweets: DataFrame, jaccardThreshold: Double = 0.5,
            onlyTagsFromNotRetweetedPosts: Boolean = false): TweetGraphs = {
    val rt = RetweetGraph(tweets)
    val (ht, tags) = HashtagGraph(tweets, onlyTagsFromNotRetweetedPosts)
    val cachedTags = tags.persistTracked()
    val jc = JaccardGraph(cachedTags, jaccardThreshold)

    val v = rt.vertices.union(ht.vertices).union(jc.vertices).distinct()
    val e = rt.edges.union(ht.edges).union(jc.edges).distinct()
    TweetGraphs(rt, ht, cachedTags, jc, Graph(v, e))
  }
}
