package graft

import graft.graph.Graph
import graft.pipeline.Profile
import org.apache.spark.sql.functions._

class Features3Spec extends SparkTestBase {
  import spark.implicits._

  test("modularity matches the hand-computed triangle + pendant") {
    // triangle a-b-c plus pendant c-d: m = 4
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
      .toDF("src", "dst").withColumn("w", lit(1.0)).withColumn("type", lit("T"))
    val asg = Seq(("a", "g1"), ("b", "g1"), ("c", "g1"), ("d", "g2"))
      .toDF("id", "lbl")
    val got = Graph(Graph.verticesOf(e), e).modularity(asg)
      .collect().map(r => r.getAs[String]("community") ->
        ((r.getAs[Long]("intra_edges"), r.getAs[Long]("degree_sum"),
          r.getAs[Double]("modularity_term")))).toMap
    // g1: L=3, d=7 → 3/4 − (7/8)² = −0.015625; g2: L=0, d=1 → −(1/8)²
    assert(got("g1") === ((3L, 7L, 3.0 / 4 - (7.0 / 8) * (7.0 / 8))))
    assert(got("g2") === ((0L, 1L, 0.0 - (1.0 / 8) * (1.0 / 8))))
  }

  test("modularity terms sum to 0 for the trivial one-community partition") {
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
      .withColumn("w", lit(1.0)).withColumn("type", lit("T"))
    val asg = Seq(("a", "x"), ("b", "x"), ("c", "x")).toDF("id", "lbl")
    val total = Graph(Graph.verticesOf(e), e).modularity(asg)
      .agg(sum("modularity_term")).as[Double].collect().head
    assert(math.abs(total) < 1e-12)
  }

  test("checksum is invariant under repartitioning and row order") {
    val df = Seq((1L, "x", "s1"), (2L, "y", "s1"), (3L, "z", "s2"))
      .toDF("id", "v", "src")
    val a = Profile.checksum(df, "src", Seq("id", "v", "src"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val b = Profile.checksum(df.repartition(7).sortWithinPartitions(desc("id")),
        "src", Seq("id", "v", "src"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(a === b)
    assert(a("s1")._1 === 2L && a("s2")._1 === 1L)
  }

  test("checksum detects a single-row difference") {
    val df1 = Seq((1L, "x", "s")).toDF("id", "v", "src")
    val df2 = Seq((1L, "X", "s")).toDF("id", "v", "src")
    val c1 = Profile.checksum(df1, "src", Seq("id", "v", "src")).collect().head.getString(2)
    val c2 = Profile.checksum(df2, "src", Seq("id", "v", "src")).collect().head.getString(2)
    assert(c1 !== c2)
  }
}
