package graft

import graft.ops.JaccardGraph
import org.apache.spark.sql.functions._

/** Property test for the motif rewrite (SURVEY.md §7.4 #2): the count-based
  * self-join pair generation must equal brute-force set arithmetic on
  * random tag assignments, including the string-ordered `id1 > id2`
  * subtlety.
  */
class JaccardGraphSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(userTags: Map[String, Set[String]], threshold: Double) = {
    val ids = userTags.keys.toSeq
    (for {
      a <- ids; b <- ids
      if a > b // string comparison, as the coerced reference ids
      inter = userTags(a).intersect(userTags(b)).size
      if inter >= 2
      jc = inter.toDouble / userTags(a).union(userTags(b)).size
      if jc > threshold
    } yield (a, b, jc)).toSet
  }

  test("pairs ≡ brute force on 30 random corpora") {
    val rng = new scala.util.Random(7)
    for (round <- 1 to 30) {
      val nUsers = 2 + rng.nextInt(12)
      val nTags = 1 + rng.nextInt(8)
      val corpus: Map[String, Set[String]] =
        (1 to nUsers).map { u =>
          u.toString -> (0 until (1 + rng.nextInt(5))).map(_ => s"t${rng.nextInt(nTags)}").toSet
        }.toMap
      val df = corpus.toSeq.map { case (id, ts) => (id, ts.toSeq) }.toDF("id", "hts")
      val threshold = rng.nextDouble() * 0.8
      val got = JaccardGraph.edges(df, threshold).collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      assert(got === brute(corpus, threshold), s"round $round corpus=$corpus thr=$threshold")
    }
  }

  test("detail carries stringified tag lists and exact counts") {
    val df = Seq(
      ("9", Seq("a", "b", "c")),
      ("10", Seq("a", "b", "d"))).toDF("id", "hts")
    val d = JaccardGraph.detail(df, threshold = 0.4).collect()
    assert(d.length === 1)
    val r = d.head
    // string compare: "9" > "10"
    assert(r.getAs[String]("id1") === "9" && r.getAs[String]("id2") === "10")
    assert(r.getAs[String]("hts1") === "a,b,c")
    assert(r.getAs[Long]("intersection") === 2L)
    assert(math.abs(r.getAs[Double]("jc") - 0.5) < 1e-15)
  }

  test("stop-tag cap drops pairs only reachable through hot tags") {
    val df = Seq(
      ("1", Seq("hot", "x")), ("2", Seq("hot", "x")),
      ("3", Seq("hot", "y")), ("4", Seq("hot", "z"))).toDF("id", "hts")
    val unfiltered = JaccardGraph.pairs(df).count()
    val capped = JaccardGraph.pairs(df, maxTagFrequency = Some(2)).count()
    assert(unfiltered === 1L) // only (2,1) share 2 tags
    // "hot" (freq 4) dropped → (2,1) share only "x" → below minShared
    assert(capped === 0L)
  }
}
