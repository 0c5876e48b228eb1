package graft

import graft.ops._
import graft.tweets.TweetSchema
import org.apache.spark.sql.functions._

/** Golden end-to-end test of the reference pipeline on the hand-computable
  * fixture (FIXTURES.md §1): users 1, 2, 3, 8001112; a retweet pair; two
  * users sharing 2 normalized tags (accent/case variants) → JC edge; one
  * single-tag user with no JC edge.
  */
class TweetGraphSpec extends SparkTestBase {

  lazy val tweets = TweetSchema.read(spark, "src/test/resources/tweets.jsonl")
  lazy val graphs = TweetGraphPipeline.build(tweets)

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(String, String, Double, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet

  test("retweet graph: author→retweeter edges with counts") {
    assert(edgeSet(graphs.retweet.edges) ===
      Set(("1", "2", 1.0, "RT"), ("3", "8001112", 1.0, "RT")))
    assert(graphs.retweet.vertices.collect().map(_.getString(0)).toSet ===
      Set("1", "2", "3", "8001112"))
  }

  test("hashtag graph: normalized (lower/de-accent/dedup) user→tag edges") {
    assert(edgeSet(graphs.hashtag.edges) === Set(
      ("1", "spark", 1.0, "HT"), ("1", "bigdata", 1.0, "HT"),
      ("3", "spark", 1.0, "HT"), ("3", "bigdata", 1.0, "HT"),
      ("2", "solo", 1.0, "HT")))
  }

  test("jaccard graph: pair sharing 2 tags, string-ordered (src > dst)") {
    assert(edgeSet(graphs.jaccard.edges) === Set(("3", "1", 1.0, "JC")))
  }

  test("user tags mapping: retweeted originals credit the original author") {
    val tags = graphs.userTags.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    // user 1's tags come from own posts AND user 2's retweet of their post
    assert(tags("1") === List("bigdata", "spark"))
    assert(tags("3") === List("bigdata", "spark"))
    assert(tags("2") === List("solo"))
    assert(!tags.contains("8001112")) // no tags anywhere
  }

  test("salted tag-set aggregation produces identical user tags") {
    val plain = HashtagGraph.userTags(tweets).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val salted = HashtagGraph.userTags(tweets, saltedAgg = true).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(salted === plain)
    // and with the reference's not-retweeted-posts flag engaged
    val plainF = HashtagGraph.userTags(tweets, onlyTagsFromNotRetweetedPosts = true)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val saltedF = HashtagGraph.userTags(tweets, onlyTagsFromNotRetweetedPosts = true,
        saltedAgg = true)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(saltedF === plainF)
  }

  test("full graph: union of all edges, heterogeneous string vertex set") {
    assert(graphs.full.edges.count() === 8)
    val v = graphs.full.vertices.collect().map(_.getString(0)).toSet
    assert(v === Set("1", "2", "3", "8001112", "spark", "bigdata", "solo"))
  }

  test("report: tags | retweeted | be-retweeted | jaccard peers per user") {
    val rows = graphs.report.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
      .toMap
    assert(rows("1") === (("[bigdata,spark]", "[2]", "[]", "[3]")))
    assert(rows("3") === (("[bigdata,spark]", "[8001112]", "[]", "[1]")))
    assert(rows("2") === (("[solo]", "[]", "[1]", "[]")))
  }

  test("2-hop neighbours of 1: dst-only expansion, HT in final but not frontier") {
    val edges = edgeSet(graphs.neighbours("1").edges)
    assert(edges === Set(
      ("1", "2", 1.0, "RT"),          // 1-hop
      ("3", "1", 1.0, "JC"),          // 1-hop (1 as dst)
      ("1", "spark", 1.0, "HT"), ("1", "bigdata", 1.0, "HT"), // HT of seed
      ("2", "solo", 1.0, "HT")))      // HT of frontier user 2
      // note: 3's HT edges absent — 3 entered via src of a JC edge, and the
      // reference's frontier only expands through dst endpoints
  }

  test("onlyTagsFromNotRetweetedPosts drops own-post tags of retweeting posts") {
    val g2 = TweetGraphPipeline.build(tweets, onlyTagsFromNotRetweetedPosts = true)
    // fixture retweets carry no own-post tags, so mapping is unchanged here;
    // the flag's filter must still parse and run
    assert(g2.userTags.count() === 3)
  }

  test("wordcloud text prefers the retweeted original and strips non-alpha") {
    val txts = TextClean.wordcloudText(tweets).collect().map(_.getString(0)).sorted
    assert(txts === Array(
      "hello spark world", "hello spark world", // own post + rt of it (42 stripped)
      "my solo post", "second post",
      "unicode tëst", "unicode tëst"))          // \p{L} keeps the accented token (isalpha parity)
  }

  test("graph save + filterEdges round trip") {
    val out = java.nio.file.Files.createTempDirectory("graphsave").toString
    graphs.full.save(out, "g")
    val edges = spark.read.option("header", "true").csv(s"$out/g.edges.csv")
    assert(edges.count() === 8)
    assert(graphs.full.filterEdges("type = 'RT'").edges.count() === 2)
    assert(graphs.full.filterEdges(col("type") === "JC").withDerivedVertices
      .vertices.collect().map(_.getString(0)).toSet === Set("1", "3"))
  }
}
