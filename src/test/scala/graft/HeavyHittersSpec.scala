package graft

import graft.pipeline.HeavyHitters
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  /** Naive one-shuffle oracle: groupBy + having over the full domain. */
  private def naive(items: Seq[String], k: Int): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap
  }

  test("exact == naive groupBy-having on a skewed stream, any partitioning") {
    // Zipf-ish: item i appears ~ N/i times — a real heavy-hitter shape
    val items = (1 to 40).flatMap(i => Seq.fill(400 / i)(s"w$i"))
    for (k <- Seq(2, 5, 10, 50); parts <- Seq(1, 3, 7)) {
      val df = items.toDF("item").repartition(parts)
      val got = HeavyHitters.exact(df, "item", k).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === naive(items, k), s"k=$k parts=$parts")
    }
  }

  test("adversarial partitioning cannot lose a global heavy hitter") {
    // the heavy item is diluted evenly across partitions, below the
    // local majority in each — the ratio-pigeonhole case the per-
    // partition Misra-Gries guarantee must still catch
    val heavy = Seq.fill(120)("hot")
    val noise = (1 to 480).map(i => s"n$i") // all hapax
    val rows = (heavy ++ noise).zipWithIndex
      .map { case (w, i) => (w, i % 8) }.toDF("item", "p")
      .repartition(8, col("p")).select("item")
    val got = HeavyHitters.exact(rows, "item", 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // hot = 120/600 = 20% > 1/10; every noise word is 1/600
    assert(got === Map("hot" -> 120L))
  }

  test("strict threshold, null handling, and share arithmetic") {
    val df = (Seq.fill(25)("a") ++ Seq.fill(25)("b") ++ Seq.fill(50)("c"))
      .map(Option(_)).appended(None).toDF("item") // null must not count
    // n=100 (null excluded); k=4 -> threshold 25, strict: a,b (=25) are OUT
    val got = HeavyHitters.exact(df, "item", 4).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === Set("c"))
    assert(got("c") === ((50L, 0.5)))
  }

  test("k larger than the distinct domain degrades to exact groupBy-having") {
    val items = Seq("a", "a", "a", "b", "b", "c")
    val got = HeavyHitters.exact(items.toDF("item"), "item", 100).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === naive(items, 100))
  }

  test("candidate phase emits at most k-1 keys per partition") {
    val items = (1 to 1000).map(i => s"w${i % 200}")
    val cand = HeavyHitters.candidates(
      items.toDF("item").repartition(4), "item", 8)
    assert(cand.count() <= 4L * 7)
  }
}
