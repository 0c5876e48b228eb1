package graft

import graft.functions.{GraftExtensions, VectorFunctions}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("graft_dot resolves in SQL and computes the sequential fold") {
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r === 32.0)
  }

  test("graft_dot null semantics mirror the zip_with/aggregate fold") {
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(3.0, 4.0)),        // ok
      (2L, Seq(1.0, 2.0), Seq(3.0)),             // length mismatch → null
      (3L, Seq(1.0, 2.0), Seq(3.0, Double.NaN))  // NaN propagates, not null
    ).toDF("id", "a", "b")
    val got = df.select(col("id"), VectorFunctions.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getAs[Long]("id") -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L) === Some(11.0))
    assert(got(2L) === None)
    assert(got(3L).exists(_.isNaN))
    // null element poisons the sum (zip_with product is null)
    val withNullElem = spark.sql(
      "SELECT graft_dot(array(1.0d, cast(null as double)), array(1.0d, 1.0d)) AS d")
    assert(withNullElem.collect().head.isNullAt(0))
  }

  test("graft_dot is bit-identical to the higher-order-function fold") {
    val rng = new scala.util.Random(7)
    val vecs = (0 until 50).map(i => (i.toLong, Seq.fill(17)(rng.nextDouble() * 10 - 5),
      Seq.fill(17)(rng.nextDouble() * 10 - 5))).toDF("id", "a", "b")
    val both = vecs.select(
      VectorFunctions.dot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("hof"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("graft_cosine is bit-identical to the three-fold dot/norm formula") {
    val rng = new scala.util.Random(11)
    val vecs = (0 until 50).map(i => (i.toLong, Seq.fill(23)(rng.nextDouble() * 4 - 2),
      Seq.fill(23)(rng.nextDouble() * 4 - 2))).toDF("id", "a", "b")
    val both = vecs.select(
      VectorFunctions.cosine(col("a"), col("b")).as("fused"),
      (VectorFunctions.dot(col("a"), col("b")) /
        (sqrt(VectorFunctions.dot(col("a"), col("a"))) *
          sqrt(VectorFunctions.dot(col("b"), col("b"))))).as("threefold"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("rolling hash: O(len) rolling update equals per-window brute force") {
    val texts = Seq("the quick brown fox jumps over the lazy dog", "short", "",
      "aaaaaaaaaaaaaaaaaaaaaaaa")
    val w = 16
    def brute(s: String): Seq[Long] = {
      val bytes = s.getBytes("UTF-8")
      (0 to bytes.length - w).map { i =>
        bytes.slice(i, i + w).foldLeft(0L)((h, b) => (h * 257L + (b & 0xffL)) % 1000000007L)
      }
    }
    val got = texts.map(Tuple1(_)).toDF("text")
      .select(graft.functions.VectorFunctions.rollingHashes(col("text"), w).as("h"))
      .collect().map(_.getSeq[Long](0).toSeq)
    texts.zip(got).foreach { case (t, g) => assert(g === brute(t), s"text: '$t'") }
  }

  test("graft_sqdist equals the zip_with/aggregate integer fold, with its null semantics") {
    val df = Seq(
      (Seq(1L, -2L, 3L), Seq(4L, 5L, -6L)),
      (Seq(0L, 0L), Seq(0L, 0L))).toDF("a", "b")
    val got = df.select(VectorFunctions.sqDistL($"a", $"b")).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(9L + 49L + 81L, 0L))
    // length mismatch and null elements → null, like graft_dot
    val bad = Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
      .select(VectorFunctions.sqDistL($"a", $"b")).collect().head
    assert(bad.isNullAt(0))
    val withNull = Seq((Seq(Some(1L), None), Seq(Some(1L), Some(2L)))).toDF("a", "b")
      .select(VectorFunctions.sqDistL($"a", $"b")).collect().head
    assert(withNull.isNullAt(0))
  }

  test("graft_doti equals the zip_with/aggregate integer fold, with its null semantics") {
    import org.apache.spark.sql.functions._
    val df = Seq((Seq(1L, -2L, 3L), Seq(4L, 5L, -6L))).toDF("a", "b")
    val got = df.select(VectorFunctions.dotL($"a", $"b")).collect().head.getLong(0)
    val hof = df.select(aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)).collect().head.getLong(0)
    assert(got === hof && got === (4L - 10L - 18L))
    val bad = Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
      .select(VectorFunctions.dotL($"a", $"b")).collect().head
    assert(bad.isNullAt(0))
    val withNull = Seq((Seq(Some(1L), None), Seq(Some(1L), Some(2L)))).toDF("a", "b")
      .select(VectorFunctions.dotL($"a", $"b")).collect().head
    assert(withNull.isNullAt(0))
  }

  test("both registration paths share one function list, and it is complete") {
    // register() and GraftExtensions iterate VectorFunctions.allFunctions,
    // so checking the list checks both deployment paths
    val names = VectorFunctions.allFunctions.map(_._1)
    assert(names === Seq("graft_dot", "graft_cosine", "graft_sqdist", "graft_doti",
      "graft_sorted_intersect_count", "graft_rolling_hash_16", "graft_stem",
      "graft_bpe_merge_pair"))
    // applying the extensions must not throw (injection is deferred)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("sorted-intersect count equals size(array_intersect) on sorted distinct arrays") {
    val rng = new scala.util.Random(11)
    def randSet() = Seq.fill(rng.nextInt(60))(rng.nextInt(80).toString).distinct.sorted
    val df = (0 until 200).map(_ => (randSet(), randSet())).toDF("a", "b")
    val both = df.select(
      VectorFunctions.sortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // empties and null arrays
    val edge = spark.sql(
      "SELECT graft_sorted_intersect_count(array(), array('a')) AS e1, " +
        "graft_sorted_intersect_count(cast(null as array<string>), array('a')) AS e2")
      .collect().head
    assert(edge.getLong(0) === 0L)
    assert(edge.isNullAt(1))
    // Scala strings sort by UTF-16 code units; the kernel compares UTF-8
    // bytes. For the multi-byte range they agree except surrogates — pin a
    // multi-byte case explicitly through sort_array (the producer contract)
    val multi = Seq((Seq("z", "é", "a"), Seq("é", "a"))).toDF("a0", "b0")
      .select(sort_array(col("a0")).as("a"), sort_array(col("b0")).as("b"))
    val m = multi.select(
      VectorFunctions.sortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref")).collect().head
    assert(m.getLong(0) === m.getLong(1))
  }

  test("sorted-intersect count: long-array mode agrees with array_intersect, incl. negatives") {
    val rng = new scala.util.Random(12)
    // xxhash64 outputs span the full signed range — negatives included
    def randSet() = Seq.fill(rng.nextInt(60))(rng.nextLong() % 50).distinct.sorted
    val df = (0 until 200).map(_ => (randSet(), randSet())).toDF("a", "b")
    val both = df.select(
      VectorFunctions.sortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
      .collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // the SQL-registered form resolves the long mode too
    val viaSql = spark.sql(
      "SELECT graft_sorted_intersect_count(array(-3L, 1L, 9L), array(-3L, 2L, 9L)) AS c")
      .collect().head
    assert(viaSql.getLong(0) === 2L)
  }
}
