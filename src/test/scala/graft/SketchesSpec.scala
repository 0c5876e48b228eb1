package graft

import graft.pipeline.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  // 3 event types × overlapping user populations, plus a shard column
  private lazy val events = (1 to 3000).map { i =>
    (i % 5 match {
      case 0 | 1 => "click"
      case 2 | 3 => "view"
      case _ => "purchase"
    }, (i % 700).toLong, s"shard${i % 4}")
  }.toDF("event_type", "user_id", "shard")

  test("approx distinct lands within HLL error of the exact count") {
    val approx = Sketches.approxDistinct(events, Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, e) <- exact) {
      assert(math.abs(approx(k) - e).toDouble / e < 0.05,
        s"$k: approx ${approx(k)} vs exact $e")
    }
  }

  test("merging per-shard sketches equals sketching the union (mergeability)") {
    // ingest-time: sketch each (event_type, shard); query-time: union up
    val perShard = Sketches.distinctSketch(events, Seq("event_type", "shard"), "user_id")
    val merged = Sketches.mergeEstimate(perShard, Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Sketches.approxDistinct(events, Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // register-max merge: shard-merged and direct sketches see the same
    // registers → estimates agree EXACTLY, not just within tolerance
    assert(merged === direct)
  }

  test("estimates are deterministic under repartitioning") {
    val a = Sketches.approxDistinct(events.repartition(13), Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Sketches.approxDistinct(events.repartition(2), Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("replay HLL: shard merge equals direct sketch, bit-for-bit") {
    val perShard = Sketches.hllReplaySketch(events, Seq("event_type", "shard"), "user_id")
    val merged = Sketches.hllReplayEstimate(
      Sketches.hllReplayMerge(Seq("event_type"), perShard.drop("shard")),
      Seq("event_type"))
    val direct = Sketches.hllReplayEstimate(
      Sketches.hllReplaySketch(events, Seq("event_type"), "user_id"),
      Seq("event_type"))
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // register-wise max merge: identical registers → identical s_scaled →
    // the IEEE division yields the identical double, not just a close one
    assert(asMap(merged) === asMap(direct))
  }

  test("replay HLL: raw estimate lands within HLL error of the exact count") {
    val est = Sketches.hllReplayEstimate(
      Sketches.hllReplaySketch(events, Seq("event_type"), "user_id"),
      Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val exact = events.groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // raw estimator at m=64: std error 1.04/sqrt(64) = 13%; allow 3 sigma
    for ((k, e) <- exact)
      assert(math.abs(est(k) - e) / e < 0.4, s"$k: est ${est(k)} vs exact $e")
  }

  test("replay HLL: estimates are deterministic under repartitioning") {
    def run(parts: Int) = Sketches.hllReplayEstimate(
      Sketches.hllReplaySketch(events.repartition(parts), Seq("event_type"), "user_id"),
      Seq("event_type"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(run(13) === run(2))
  }

  private lazy val terms =
    (1 to 500).map(i => s"t${i % 37}").toDF("term")

  test("CMS: merging shard sketches equals sketching the union; cells sum to depth×n") {
    val whole = Sketches.cmsSketch(terms, "term", 4, 32)
    val merged = Sketches.cmsMerge(
      Sketches.cmsSketch(terms.limit(200), "term", 4, 32),
      Sketches.cmsSketch(terms.exceptAll(terms.limit(200)), "term", 4, 32))
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(asMap(whole) === asMap(merged))
    assert(whole.agg(sum("cnt")).collect()(0).getLong(0) === 4L * 500)
  }

  test("CMS maintained as a streaming aggregate equals the batch sketch") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[String]
    val q = Sketches.cmsSketch(mem.toDF().toDF("term"), "term", 3, 16)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    mem.addData((1 to 250).map(i => s"t${i % 11}"): _*)
    q.processAllAvailable()
    mem.addData((251 to 500).map(i => s"t${i % 11}"): _*)   // incremental update
    q.processAllAvailable()
    q.stop()
    def asMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val streamed = asMap(spark.table("cms_stream").collect())
    val batch = asMap(Sketches.cmsSketch(
      (1 to 500).map(i => s"t${i % 11}").toDF("term"), "term", 3, 16).collect())
    assert(streamed === batch)
  }

  test("histBucketize: buckets are monotone in value, near-even, and layout-invariant") {
    val df = (1L to 1000L).map(i => (i, (i * 37 % 500).toDouble)).toDF("id", "v")
    val out = Sketches.histBucketize(df, "v", 0.0, 500.0, 50, buckets = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // monotone: a larger value never lands in a smaller bucket
    val sorted = out.sortBy(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a._3 <= b._3 })
    // near-even: with 50 bins over 10 buckets each decile holds 10% ± one bin
    val perBucket = out.groupBy(_._3).view.mapValues(_.size)
    assert(perBucket.values.forall(n => n >= 60 && n <= 140), perBucket.toMap)
    assert(perBucket.keySet.forall(b => b >= 0 && b <= 9))
    // layout-invariant: same assignment after repartition
    val re = Sketches.histBucketize(df.repartition(7), "v", 0.0, 500.0, 50, buckets = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(re === out.map(r => (r._1, r._3)).toMap)
  }

  test("histogram sketch: shard merge equals whole; quantiles within one bin width of exact") {
    val vals = (1 to 1000).map(i => (i * 37 % 997).toDouble).toDF("v")
    val whole = Sketches.histSketch(vals, "v", 0.0, 1000.0, 100)
    val merged = Sketches.histSketch(vals.limit(400), "v", 0.0, 1000.0, 100)
      .unionByName(Sketches.histSketch(vals.exceptAll(vals.limit(400)), "v", 0.0, 1000.0, 100))
      .groupBy("bin").agg(sum("cnt").as("cnt"))   // additive merge, like CMS
    assert(whole.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      merged.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val est = Sketches.histQuantile(whole, Seq(0.5, 0.9), 0.0, 1000.0, 100)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exact = vals.stat.approxQuantile("v", Array(0.5, 0.9), 0.0)
    assert(math.abs(est(0.5) - exact(0)) <= 10.0, s"p50 ${est(0.5)} vs ${exact(0)}")
    assert(math.abs(est(0.9) - exact(1)) <= 10.0, s"p90 ${est(0.9)} vs ${exact(1)}")
  }

  test("grouped histogram: per-group quantiles within one bin width; cells merge additively") {
    val vals = (1 to 900).map(i => (s"g${i % 3}", (i * 37 % 997).toDouble)).toDF("g", "v")
    val sk = Sketches.histSketchBy(vals, "g", "v", 0.0, 1000.0, 100)
    // additive shard merge, like the global sketch
    val merged = Sketches.histSketchBy(vals.limit(300), "g", "v", 0.0, 1000.0, 100)
      .unionByName(Sketches.histSketchBy(vals.exceptAll(vals.limit(300)), "g", "v", 0.0, 1000.0, 100))
      .groupBy("g", "bin").agg(sum("cnt").as("cnt"))
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(asMap(sk) === asMap(merged))
    val est = Sketches.histQuantileBy(sk, "g", Seq(0.5, 0.9), 0.0, 1000.0, 100)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val exact = vals.filter($"g" === g).stat.approxQuantile("v", Array(0.5, 0.9), 0.0)
      assert(math.abs(est((g, 0.5)) - exact(0)) <= 10.0, s"$g p50 ${est((g, 0.5))} vs ${exact(0)}")
      assert(math.abs(est((g, 0.9)) - exact(1)) <= 10.0, s"$g p90 ${est((g, 0.9))} vs ${exact(1)}")
    }
  }

  test("CMS estimate never under-counts; absent item bounded by collision mass") {
    val sketch = Sketches.cmsSketch(terms, "term", 4, 32)
    val items = (0 until 37).map(i => s"t$i").toDF("term")
    val est = Sketches.cmsEstimate(sketch, items, "term", 4, 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = terms.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((t, e) <- exact) assert(est(t) >= e, s"$t: est ${est(t)} < exact $e")
    val absent = Sketches.cmsEstimate(sketch, Seq("nope").toDF("term"), "term", 4, 32)
      .collect()(0).getLong(1)
    assert(absent >= 0 && absent <= 500)
  }

  test("CMS join-size estimate never under-counts; exact when no bucket collides") {
    // skewed many-to-many: key i appears i times on side a, 11-i on side b
    val a = (1 to 10).flatMap(i => Seq.fill(i)(s"k$i")).toDF("key")
    val b = (1 to 10).flatMap(i => Seq.fill(11 - i)(s"k$i")).toDF("key")
    val exactSize = (1 to 10).map(i => i.toLong * (11 - i)).sum
    for (width <- Seq(4, 16, 64)) {
      val est = Sketches.cmsJoinSizeEstimate(a, "key", b, "key", 4, width)
        .collect()(0).getLong(0)
      assert(est >= exactSize, s"width=$width: est $est < exact $exactSize")
    }
    // 10 keys over 8192 buckets x 4 rows: collision-free (deterministic
    // md5 layout, asserted not assumed) -> the estimate IS the join size
    val wide = Sketches.cmsJoinSizeEstimate(a, "key", b, "key", 4, 8192)
      .collect()(0).getLong(0)
    assert(wide === exactSize)
    // disjoint key sets -> estimate may only carry collision mass at tiny
    // widths and must be 0 when nothing collides
    val c = Seq("x1", "x2", "x3").toDF("key")
    val disjoint = Sketches.cmsJoinSizeEstimate(a, "key", c, "key", 4, 8192)
      .collect()(0).getLong(0)
    assert(disjoint === 0L)
  }

  test("histDriftL1: 0 for identical shapes, 2 for disjoint support, symmetric") {
    val a = (1 to 100).map(i => ("g", (i % 10) * 10.0)).toDF("g", "v")
    val same = Sketches.histDriftL1(a, a, "g", "v", 0.0, 100.0, 10)
      .collect()(0).getAs[Double]("l1_drift")
    assert(same === 0.0)
    // same shape at double the count is still zero drift (scale-free)
    val a2 = a.union(a)
    assert(Sketches.histDriftL1(a, a2, "g", "v", 0.0, 100.0, 10)
      .collect()(0).getAs[Double]("l1_drift") === 0.0)
    val b = (1 to 50).map(_ => ("g", 95.0)).toDF("g", "v") // all in the last bin
    val lo = (1 to 50).map(_ => ("g", 5.0)).toDF("g", "v") // all in the first
    assert(Sketches.histDriftL1(lo, b, "g", "v", 0.0, 100.0, 10)
      .collect()(0).getAs[Double]("l1_drift") === 2.0)
    val d1 = Sketches.histDriftL1(a, b, "g", "v", 0.0, 100.0, 10)
      .collect()(0).getAs[Double]("l1_drift")
    val d2 = Sketches.histDriftL1(b, a, "g", "v", 0.0, 100.0, 10)
      .collect()(0).getAs[Double]("l1_drift")
    assert(d1 === d2 && d1 > 0.0 && d1 < 2.0)
  }

  // ------------------------------------------------------------- KMV

  private def kmvCorpus(nPerGroup: Int) =
    (1 to nPerGroup).flatMap(i => Seq(("a", s"key$i"), ("b", s"key${i + nPerGroup / 2}")))
      .toDF("g", "k") // groups a and b overlap on half their keys

  test("KMV: sketch is partitioning-invariant (k-min of distinct is a monoid)") {
    val df = kmvCorpus(500)
    def ks(parts: Int) = Sketches.kmvSketch(df.repartition(parts), "g", "k", k = 32)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val one = ks(1)
    assert(one === ks(7))
    assert(one("a").length === 32 && one("a") === one("a").sorted)
    // duplicates of a key never occupy extra slots
    val dup = Sketches.kmvSketch(df.unionAll(df), "g", "k", k = 32)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(dup === one)
  }

  test("KMV: under-full sketch estimates exactly; full sketch within 3 sigma") {
    val small = Seq.tabulate(10)(i => ("a", s"v$i")).toDF("g", "k")
    val exactEst = Sketches.kmvEstimate(
      Sketches.kmvSketch(small, "g", "k", k = 64), "g", k = 64).collect()(0)
    assert(exactEst.getLong(1) === 10L && exactEst.getDouble(2) === 10.0)
    // 750 distinct keys in group a, k=64 → stderr ≈ D/√(k-2) ≈ 9.5%
    val est = Sketches.kmvEstimate(
      Sketches.kmvSketch(kmvCorpus(750), "g", "k", k = 64), "g", k = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(est("a") - 750.0) < 750.0 * 0.30, s"est ${est("a")}")
  }

  test("KMV pair estimates: identical groups give Jaccard 1; overlap tracked") {
    val df = kmvCorpus(600)
    val same = df.union(df.filter($"g" === "a").withColumn("g", lit("c")))
    val pairs = Sketches.kmvPairEstimates(
        Sketches.kmvSketch(same, "g", "k", k = 64), "g", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    val (acShared, acJacc, _) = pairs(("a", "c"))
    assert(acShared === 64L && acJacc === 1.0) // identical key sets
    // a/b overlap half their keys: true J = 1/3 → estimate in (0.1, 0.6)
    val abJacc = pairs(("a", "b"))._2
    assert(abJacc > 0.1 && abJacc < 0.6, s"J(a,b)=$abJacc")
    // intersection estimate within a loose band of the true 300
    val abInter = pairs(("a", "b"))._3
    assert(abInter > 100 && abInter < 650, s"inter(a,b)=$abInter")
  }
}
