package graft

import graft.pipeline.Mix
import org.apache.spark.sql.functions._

class MixSpec extends SparkTestBase {
  import spark.implicits._

  private val df = (0L until 400L).map(i => (i, s"src${i % 4}")).toDF("id", "source")

  test("stratifiedSample: rate 100 keeps all, rate 0 keeps none, repartition-invariant") {
    val rates = Map("src0" -> 100, "src1" -> 0)
    val kept = Mix.stratifiedSample(df, "source", $"id", rates, default = 50)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("src0") === 100L)
    assert(!kept.contains("src1"))
    // default-rate strata land between the extremes (hash-uniform ±noise)
    assert(kept("src2") + kept("src3") > 50 && kept("src2") + kept("src3") < 150)
    // decision is a pure row function → identical survivors after reshuffle
    val a = Mix.stratifiedSample(df, "source", $"id", rates, 50).select("id")
      .collect().map(_.getLong(0)).toSet
    val b = Mix.stratifiedSample(df.repartition(13), "source", $"id", rates, 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("upsample: per-stratum copy counts with epoch tags") {
    val up = Mix.upsample(df, "source", Map("src0" -> 3, "src1" -> 2))
    val counts = up.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("src0" -> 300L, "src1" -> 200L, "src2" -> 100L, "src3" -> 100L))
    val epochs = up.filter($"source" === "src0" && $"id" === 0L)
      .select("epoch").collect().map(_.getInt(0)).sorted
    assert(epochs === Array(1, 2, 3))
  }

  test("samplePerStratum: exactly k per stratum, equals the unsalted window rank, repartition-invariant") {
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("source"), r.getAs[Long]("id"), r.getAs[Long]("sample_rank"))
    val sampled = Mix.samplePerStratum(df, "source", $"id", k = 7).collect().map(keyOf).toSet
    assert(sampled.groupBy(_._1).forall(_._2.size == 7))
    // ground truth: plain window rank under the same (md5, key) total order
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
      .orderBy(md5(concat(lit("mix:"), $"id".cast("string"))), $"id")
    val unsalted = df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter($"sample_rank" <= 7).collect().map(keyOf).toSet
    assert(sampled === unsalted)
    val reshuffled = Mix.samplePerStratum(df.repartition(13), "source", $"id", k = 7)
      .collect().map(keyOf).toSet
    assert(sampled === reshuffled)
  }

  test("prioritySample: exactly k per stratum, equals the window-rank formulation, weight-monotone") {
    val weighted = (0L until 400L).map(i => (i, s"src${i % 4}", 1L + i % 97))
      .toDF("id", "source", "w")
    val k = 10
    val got = Mix.prioritySample(weighted, "source", $"id", $"w", k)
    val counts = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.toSet === Set(k.toLong))
    // the custom-operator result equals the plain window-rank top-k
    import org.apache.spark.sql.expressions.Window
    val m = conv(substring(md5(concat(lit("prio:"), $"id".cast("string"))), 1, 6), 16, 10)
      .cast("long")
    val q = ($"w".cast("double") * lit(16777216.0)) / (m + 1).cast("double")
    val ref = weighted.withColumn("priority", q)
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy($"priority".desc, $"id".asc)))
      .filter($"rn" <= k).select("id").collect().map(_.getLong(0)).toSet
    assert(got.select("id").collect().map(_.getLong(0)).toSet === ref)
    // weight-monotone: giant-weight rows are (near-)certainly selected
    val spiked = weighted.withColumn("w",
      when($"id" < 4, lit(100000000L)).otherwise($"w"))
    val sel = Mix.prioritySample(spiked, "source", $"id", $"w", k)
      .select("id").collect().map(_.getLong(0)).toSet
    assert((0L until 4L).forall(sel.contains))
  }

  test("weightedSample: exactly k draws per stratum, counts within floor/ceil of k·w/W, repartition-invariant") {
    val rnd = new scala.util.Random(11)
    val wdf = (0L until 300L).map(i => (i, s"src${i % 3}", 1L + rnd.nextInt(50)))
      .toDF("id", "source", "w")
    val k = 17
    val got = Mix.weightedSample(wdf, "source", $"id", "w", k).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("id"),
        r.getAs[Long]("w"), r.getAs[Long]("n_draws")))
    // telescoping invariant: Σ n_draws = k exactly, per stratum
    val perStratum = got.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(perStratum === Map("src0" -> k.toLong, "src1" -> k.toLong, "src2" -> k.toLong))
    // proportionality: every row's count is ⌊k·w/W⌋ or ⌈k·w/W⌉ (also for
    // the 0-draw rows, trivially — only drawn rows are emitted)
    val totals = wdf.groupBy("source").agg(sum("w").as("tot")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (s, _, w, n) =>
      val exact = k.toDouble * w / totals(s)
      assert(n >= math.floor(exact).toLong && n <= math.ceil(exact).toLong,
        s"stratum $s weight $w: $n draws vs exact $exact")
    }
    // deterministic under reshuffling: identical (id, n_draws) multiset
    val reshuffled = Mix.weightedSample(wdf.repartition(13), "source", $"id", "w", k)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_draws"))).toSet
    assert(reshuffled === got.map(t => (t._2, t._4)).toSet)
    // a heavy row in a light stratum is drawn multiple times (epoch repeats)
    val heavy = (0L until 5L).map(i => (i, "only", if (i == 0L) 100L else 1L))
      .toDF("id", "source", "w")
    val h = Mix.weightedSample(heavy, "source", $"id", "w", 8).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_draws")).toMap
    assert(h(0L) >= 7L) // 100/104 of the weight line → ≥ ⌊8·100/104⌋ draws
    assert(h.values.sum === 8L)
  }
test("selectByBudget: two-phase prefix sum equals the one-window global cumsum") {
    import org.apache.spark.sql.expressions.Window
    // randomized scores in [0,1] with deliberate ties; tokens 1..20
    val rnd = new scala.util.Random(31)
    val rows = (1L to 200L).map(i =>
      (i, (rnd.nextInt(11) / 10.0), Seq.fill(1 + rnd.nextInt(19))("w").mkString(" ")))
    val docs = rows.toDF("doc_id", "s", "text")
    val budget = 600L
    val got = Mix.selectByBudget(docs, "doc_id", "text", col("s"), budget, buckets = 8)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Double]("score"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("start_offset")))).toMap
    // the naive single-task global window it must equal bit for bit
    val w = Window.orderBy(col("s").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs.select(col("doc_id"), col("s"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("cum", sum(col("n")).over(w))
      .filter(col("cum") - col("n") < budget)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Double]("s"), r.getAs[Long]("n"),
          r.getAs[Long]("cum") - r.getAs[Long]("n")))).toMap
    assert(got === naive)
    // the boundary document straddles the cut; the next one is excluded
    val starts = got.values.map(_._3)
    assert(starts.max < budget)
    assert(got.values.map(t => t._3 + t._2).max >= budget)
  }

  test("diversitySample: caps each cell at m, equals the unsalted per-cell md5 rank") {
    import org.apache.spark.sql.expressions.Window
    // cell 0 has 30 members, cell 1 has 4, cell 2 has 1 — only the hot
    // cell gets capped
    val assigned = (0 until 35).map { i =>
      (i.toLong, if (i < 30) 0L else if (i < 34) 1L else 2L)
    }.toDF("vec_id", "cell")
    val got = Mix.diversitySample(assigned, "vec_id", "cell", m = 5)
      .select("cell", "vec_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val byCell = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byCell === Map(0L -> 5, 1L -> 4, 2L -> 1))
    // identical rows to the plain (unsalted) per-cell window rank
    val naive = assigned.withColumn("rank",
        row_number().over(Window.partitionBy(col("cell")).orderBy(
          md5(concat(lit("div:"), col("vec_id").cast("string"))), col("vec_id")))
          .cast("long"))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getAs[Long]("cell"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rank"))).toSet
    assert(got === naive)
  }

  test("cluster-keyed split never separates a near-dup family; doc-keyed split can") {
    // 120 clusters of 3 consecutive ids each — big enough that hashing
    // the member id is statistically guaranteed to split some family
    val comp = (0L until 360L).map(i => (i, (i / 3) * 3)).toDF("id", "component")
    def spanning(keyed: org.apache.spark.sql.DataFrame): Long =
      keyed.groupBy("component")
        .agg(countDistinct(col("split")).as("ns"))
        .filter(col("ns") > 1).count()
    assert(spanning(Mix.split(comp, col("component"))) === 0L)
    assert(spanning(Mix.split(comp, col("id"))) > 0L)
    // the safe key preserves the 80/10/10 shape at cluster granularity
    val frac = Mix.split(comp.select("component").distinct(), col("component"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(frac("train") > frac.getOrElse("val", 0L)
      && frac("train") > frac.getOrElse("test", 0L))
  }

  test("categoricalDraws: local replay of the cumulative-mass pick, repartition-invariant") {
    val rows = (1 to 40).map(i => s"k$i").toDF("key")
    val vocab = Seq(("a", 3L), ("b", 1L), ("c", 6L)).toDF("w", "cnt")
    def run(r: org.apache.spark.sql.DataFrame) =
      Mix.categoricalDraws(r, Seq("key"), vocab, "w", "cnt", n = 2)
        .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2))).toSet
    val got = run(rows)
    assert(got.size === 80) // 40 keys × 2 draws
    // local replay: cum = [(a,3),(b,4),(c,10)], draw = md5_60("neg:key|j") % 10
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val cum = Seq(("a", 3L), ("b", 4L), ("c", 10L))
    val want = (for (i <- 1 to 40; j <- 1 to 2) yield {
      val d = h60(s"neg:k$i|$j") % 10
      (s"k$i", j.toLong, cum.find(_._2 > d).get._1)
    }).toSet
    assert(got === want)
    // residue ownership IS the distribution: a owns 0-2, b owns 3, c owns 4-9
    assert((0L to 9L).map(d => cum.find(_._2 > d).get._1).mkString
      === "aaabcccccc")
    assert(run(rows.repartition(7)) === got)
  }

  test("interleaveRanks: two-stage rank equals the naive single-window rank exactly") {
    import org.apache.spark.sql.expressions.Window
    // 200 rows over 3 skewed strata; the exactness claim is that the
    // salt-sharded rank (salt = md5 top bits, shard row_number + offset)
    // IS the global (md5, key) permutation per stratum
    val rows = (1 to 200).map(i => (i.toLong, Seq("a", "a", "a", "b", "c")(i % 5)))
      .toDF("doc_id", "source")
    val naive = rows.withColumn("interleave_rank",
      row_number().over(Window.partitionBy(col("source"))
        .orderBy(md5(concat(lit("mix:"), col("doc_id").cast("string"))),
          col("doc_id"))).cast("long"))
    val got = Mix.interleaveRanks(rows, "source", col("doc_id"))
      .select("doc_id", "source", "interleave_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = naive.select("doc_id", "source", "interleave_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === want)
    // repartition-invariant, and salts must divide 256
    val got2 = Mix.interleaveRanks(rows.repartition(13), "source", col("doc_id"),
        salts = 8)
      .select("doc_id", "source", "interleave_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got2 === want)
    intercept[IllegalArgumentException](
      Mix.interleaveRanks(rows, "source", col("doc_id"), salts = 3))
    // wide salt spaces (top two md5 bytes) produce the same exact ranks
    val got3 = Mix.interleaveRanks(rows, "source", col("doc_id"), salts = 4096)
      .select("doc_id", "source", "interleave_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got3 === want)
  }

  test("planMixture: caps bind, excess waterfalls, every invariant integer-exact") {
    import graft.pipeline.Mix
    // two heavy sources (weight 9) over-subscribe a 1.3x budget at the
    // 1.5-epoch cap; two weight-1 sources absorb the redistribution
    val docs = (
      (0 until 10).map(i => (s"d_a$i", "A", "w " * 99 + "w")) ++ // 100 words each
      (0 until 10).map(i => (s"d_b$i", "B", "w " * 99 + "w")) ++
      (0 until 10).map(i => (s"d_c$i", "C", "w " * 99 + "w")) ++
      (0 until 10).map(i => (s"d_d$i", "D", "w " * 99 + "w"))
    ).toDF("doc_id", "source", "text")
    val got = Mix.planMixture(docs, "source", "text",
        weights = Map("A" -> 9L, "B" -> 9L)).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("avail"), r.getAs[Long]("requested"),
          r.getAs[Long]("allocated"), r.getAs[Double]("epochs")))).toMap
    // tot 4000, budget 5200, wsum 20; A/B requested 2340 > cap 1500;
    // leftover 5200-1500-1500-260-260 = 1680 over headroom 2480
    assert(got("A") === ((1000L, 2340L, 1500L, 1.5)))
    assert(got("B") === ((1000L, 2340L, 1500L, 1.5)))
    // C/D: a1 = 260, headroom 1240 each → +1680*1240/2480 = +840 → 1100
    assert(got("C") === ((1000L, 260L, 1100L, 1.1)))
    assert(got("D") === ((1000L, 260L, 1100L, 1.1)))
    // invariants: nothing over cap, total within budget
    assert(got.values.map(_._3).sum <= 5200L)
    // over-budget parameterization is refused loudly
    intercept[IllegalArgumentException] {
      Mix.planMixture(docs, "source", "text", Map.empty[String, Long],
        budgetNum = 2L, budgetDen = 1L)
    }
    GraftStorage.clear(spark)
  }

  test("planMixture: redistribution grant is clamped to headroom at the ratio-equality edge") {
    import graft.pipeline.Mix
    // ADVICE r9 #1: with budget ratio == cap ratio (both 3/2), the
    // floored budget can exceed the sum of floored caps — here tot=8,
    // budget=12, caps 4+4+3=11. A/B over-subscribe (requested 5 > cap 4),
    // C requests 2 < cap 3; leftover = 12-4-4-2 = 2 > headroom 1, so an
    // UNCLAMPED grant to C would be floor(2*1/1) = 2 → allocated 4 > cap 3
    val docs = Seq(
      ("a", "A", "w w w"), ("b", "B", "w w w"), ("c", "C", "w w")
    ).toDF("doc_id", "source", "text")
    val got = Mix.planMixture(docs, "source", "text",
        weights = Map("A" -> 5L, "B" -> 5L, "C" -> 2L),
        budgetNum = 3L, budgetDen = 2L, epochCapNum = 3L, epochCapDen = 2L)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("avail"), r.getAs[Long]("allocated")))).toMap
    assert(got("A") === ((3L, 4L)))
    assert(got("B") === ((3L, 4L)))
    // the documented invariant: never past the epoch cap (floor(2*3/2)=3)
    assert(got("C") === ((2L, 3L)))
    GraftStorage.clear(spark)
  }

  test("contrastivePairs: positives from dup pairs, negatives never share a family") {
    import graft.pipeline.{Dedup, Mix}
    // two duplicate families {1,2,3} (chain) and {8,9}; 10-doc universe
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("id1", "id2")
    val comp = Dedup.components(pairs)
    val universe = (1L to 10L).toDF("doc_id")
    val got = Mix.contrastivePairs(pairs, comp, universe,
      targetCandidates = 10L, posPerAnchor = 2, negPerAnchor = 2).collect()
      .map(r => (r.getAs[Long]("anchor"), r.getAs[Long]("other"),
        r.getAs[String]("label"), r.getAs[Long]("rank")))
    val fam = comp.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("component")).toMap
    def family(x: Long) = fam.getOrElse(x, x)
    val pos = got.filter(_._3 == "pos")
    assert(pos.map(p => (p._1, p._2)).toSet === Set((1L, 2L), (2L, 3L), (8L, 9L)))
    val neg = got.filter(_._3 == "neg")
    assert(neg.nonEmpty)
    neg.foreach { case (a, o, _, _) =>
      assert(family(a) != family(o), s"negative ($a,$o) shares family ${family(a)}")
    }
    // per-anchor caps and dense ranks
    got.groupBy(r => (r._1, r._3)).foreach { case ((a, l), rows) =>
      assert(rows.length <= 2, s"anchor $a label $l over cap")
      assert(rows.map(_._4).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // md5 picks are partitioning-invariant
    val again = Mix.contrastivePairs(pairs.repartition(7), comp, universe.repartition(3),
      targetCandidates = 10L, posPerAnchor = 2, negPerAnchor = 2).collect()
      .map(r => (r.getAs[Long]("anchor"), r.getAs[Long]("other"),
        r.getAs[String]("label"), r.getAs[Long]("rank")))
    assert(again.toSet === got.toSet)
    GraftStorage.clear(spark)
  }
}
