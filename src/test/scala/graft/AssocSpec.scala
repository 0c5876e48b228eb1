package graft

import graft.pipeline.Assoc

class AssocSpec extends SparkTestBase {
  import spark.implicits._

  test("pairRules: hand-computed support/confidence/lift on a tiny basket set") {
    // 4 baskets: {a,b}, {a,b,c}, {a,c}, {b} — duplicate 'a' in basket 1
    // must collapse
    val df = Seq(
      (1, "a"), (1, "a"), (1, "b"),
      (2, "a"), (2, "b"), (2, "c"),
      (3, "a"), (3, "c"),
      (4, "b")).toDF("bk", "item")
    val got = Assoc.pairRules(df, "bk", "item").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap // (item_a, item_b)
    assert(got.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))

    val ab = got(("a", "b"))
    assert(ab.getAs[Long]("n_ab") === 2L)
    assert(ab.getAs[Long]("n_a") === 3L)
    assert(ab.getAs[Long]("n_b") === 3L)
    assert(ab.getAs[Double]("support") === 2.0 / 4.0)
    assert(ab.getAs[Double]("conf_a_b") === 2.0 / 3.0)
    assert(ab.getAs[Double]("conf_b_a") === 2.0 / 3.0)
    assert(ab.getAs[Double]("lift") === 8.0 / 9.0)

    val ac = got(("a", "c"))
    assert(ac.getAs[Long]("n_ab") === 2L)
    assert(ac.getAs[Double]("lift") === (2.0 * 4.0) / (3.0 * 2.0))
  }

  test("pairRules: minPairs prunes, pairs are unordered with item_a < item_b") {
    val df = Seq((1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "z"))
      .toDF("bk", "item")
    val all = Assoc.pairRules(df, "bk", "item").collect()
    assert(all.forall(r => r.getString(0) < r.getString(1)))
    val pruned = Assoc.pairRules(df, "bk", "item", minPairs = 2L).collect()
    assert(pruned.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("x", "y")))
    assert(pruned.head.getAs[Long]("n_ab") === 2L)
  }
}
