package graft

import graft.graph.Graph
import graft.ops.Smooth
import graft.pipeline.{Mix, Profile, Stats}
import org.apache.spark.sql.functions._

class Features2Spec extends SparkTestBase {
  import spark.implicits._

  test("commonNeighbors finds non-adjacent pairs sharing >= minCommon neighbors") {
    // u1–i1, u1–i2, u2–i1, u2–i2 (share 2), u3–i1 only (shares 1 with each)
    val e = Seq(("u1", "i1"), ("u1", "i2"), ("u2", "i1"), ("u2", "i2"), ("u3", "i1"))
      .toDF("src", "dst").withColumn("w", lit(1.0)).withColumn("type", lit("T"))
    val got = Graph(Graph.verticesOf(e), e).commonNeighbors(minCommon = 2L)
      .select("a", "b", "common").as[(String, String, Long)].collect().toSet
    // u1,u2 share items i1,i2 — and symmetrically i1,i2 share users u1,u2
    assert(got === Set(("u1", "u2", 2L), ("i1", "i2", 2L)))
  }

  test("commonNeighbors excludes adjacent pairs and capped hubs") {
    // a–b edge exists AND they share neighbor c → excluded (adjacent);
    // hub h has degree 3 > cap 2 → wedges through h dropped
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"),
      ("x", "h"), ("y", "h"), ("z", "h"))
      .toDF("src", "dst").withColumn("w", lit(1.0)).withColumn("type", lit("T"))
    val got = Graph(Graph.verticesOf(e), e)
      .commonNeighbors(minCommon = 1L, maxDegree = 2L)
      .select("a", "b").as[(String, String)].collect().toSet
    // b,c share a; a,c share b (all adjacent → dropped); x,y,z share only h (capped)
    assert(got === Set.empty[(String, String)])
  }

  test("minMaxScale maps group min to 0, max to 1, constant groups to 0") {
    val df = Seq(("g1", 1L, 10L), ("g1", 2L, 20L), ("g1", 3L, 15L),
      ("g2", 4L, 7L), ("g2", 5L, 7L)).toDF("src", "id", "x")
    val got = Stats.minMaxScale(df, "src", "x")
      .select("id", "scaled").as[(Long, Double)].collect().toMap
    assert(got(1L) === 0.0 && got(2L) === 1.0 && got(3L) === 0.5)
    assert(got(4L) === 0.0 && got(5L) === 0.0)
  }

  test("mode picks the most frequent value, ties to the smallest") {
    val df = Seq((1L, "b"), (1L, "b"), (1L, "a"),
      (2L, "c"), (2L, "a")).toDF("k", "v")   // user 2: tie a/c → a
    val got = Profile.mode(df, "k", "v")
      .select("k", "mode_value", "mode_count").as[(Long, String, Long)]
      .collect().toSet
    assert(got === Set((1L, "b", 2L), (2L, "a", 1L)))
  }

  test("split is exhaustive, deterministic, and respects the percent bands") {
    val df = (0L until 1000L).toDF("id")
    val counts = Mix.split(df, col("id")).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum === 1000L)
    assert(counts("train") > 700L && counts("train") < 900L)
    assert(counts.keySet === Set("train", "val", "test"))
    // same hash → same assignment on a second run
    val again = Mix.split(df, col("id")).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(again === counts)
  }

  test("cusum is 0 at the series end and ramps at a level shift") {
    // flat 10,10,10 then 40,40,40: mean 25; cusum dips most at the shift
    val df = Seq(("k", 1, 10L), ("k", 2, 10L), ("k", 3, 10L),
      ("k", 4, 40L), ("k", 5, 40L), ("k", 6, 40L)).toDF("k", "t", "v")
    val got = Smooth.cusum(df, "k", "t", "v")
      .select("t", "cusum").as[(Int, Double)].collect().toMap
    assert(got(6) === 0.0)                    // Σ(v−mean) over all = 0
    assert(got(3) === -45.0)                  // 3·(10−25)
    assert(got(1) === -15.0 && got(4) === -30.0)
  }
}
