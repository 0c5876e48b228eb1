package graft

import graft.pipeline.Snapshot
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkTestBase {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 1L), (2L, "b", 1L), (3L, "c", 2L)).toDF("id", "text", "version")

  test("upsert: higher version wins, updates win ties, untouched keys survive") {
    val updates = Seq(
      (2L, "b2", 2L),  // higher version → replaces
      (3L, "c2", 2L),  // same version → updates side wins
      (4L, "d", 1L))   // new key → inserted
      .toDF("id", "text", "version")
    val merged = Snapshot.upsert(base, updates, "id", "version").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(merged === Map(
      1L -> (("a", 1L)), 2L -> (("b2", 2L)), 3L -> (("c2", 2L)), 4L -> (("d", 1L))))
  }

  test("upsert: a stale delta (lower version) does NOT clobber the snapshot") {
    val stale = Seq((3L, "old-c", 1L)).toDF("id", "text", "version")
    val merged = Snapshot.upsert(base, stale, "id", "version").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(merged(3L) === "c")
  }

  test("upsert: many updates per key still yield one winner (max_by total order)") {
    val updates = (1L to 50L).map(v => (1L, s"a$v", v)).toDF("id", "text", "version")
    val merged = Snapshot.upsert(base, updates, "id", "version")
    assert(merged.count() === 3)
    assert(merged.filter($"id" === 1L).head().getString(1) === "a50")
  }

  test("applyChanges: upserts merge, tombstones drop, deletes beat same-batch upserts") {
    val updates = Seq((2L, "b2", 2L), (4L, "d", 1L)).toDF("id", "text", "version")
    val deletes = Seq(Tuple1(1L), Tuple1(4L)).toDF("id") // 4 also upserted this batch
    val out = Snapshot.applyChanges(base, updates, deletes, "id", "version")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(2L -> "b2", 3L -> "c")) // 1 deleted, 4 delete-wins
  }

  test("diff: added / removed / changed / unchanged classification") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val newSnap = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "text")
    val d = Snapshot.diff(oldSnap, newSnap, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("diff: null payloads compare null-safely (null = null is unchanged)") {
    val oldSnap = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "text")
    val newSnap = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "text")
    val d = Snapshot.diff(oldSnap, newSnap, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("diff compares only the columns both snapshots share") {
    val oldSnap = Seq((1L, "a", "extra")).toDF("id", "text", "old_only")
    val newSnap = Seq((1L, "a", 9L)).toDF("id", "text", "new_only")
    val d = Snapshot.diff(oldSnap, newSnap, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "unchanged"))
  }

  test("scd2: consecutive runs collapse; intervals abut; last run is current") {
    // user 1: A A B A (A repeats → one run; A later returns → NEW run)
    val log = Seq(
      (1L, "A", 10L, 100L), (1L, "A", 20L, 101L), (1L, "B", 30L, 102L),
      (1L, "A", 40L, 103L), (2L, "X", 10L, 104L))
      .toDF("k", "attr", "ts", "tie")
    val out = Snapshot.scd2(log, "k", "attr", "ts", "tie").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
          r.getBoolean(5)))).toMap
    assert(out === Map(
      (1L, 1L) -> (("A", 10L, Some(30L), false)),
      (1L, 2L) -> (("B", 30L, Some(40L), false)),
      (1L, 3L) -> (("A", 40L, None, true)),
      (2L, 1L) -> (("X", 10L, None, true))))
  }

  test("scd2: same-ts events break ties on the tie column; null attr forms runs") {
    val log = Seq(
      (1L, Some("A"), 10L, 1L), (1L, Option.empty[String], 10L, 2L),
      (1L, Option.empty[String], 20L, 3L), (1L, Some("A"), 30L, 4L))
      .toDF("k", "attr", "ts", "tie")
    val out = Snapshot.scd2(log, "k", "attr", "ts", "tie")
      .orderBy("version").collect()
      .map(r => (r.getLong(1), Option(r.getString(2)), r.getLong(3)))
    // A(ts10,tie1) → null(ts10,tie2 .. ts20) → A(ts30): three runs
    assert(out.toSeq === Seq(
      (1L, Some("A"), 10L), (2L, None, 10L), (3L, Some("A"), 30L)))
  }

  test("refreshAgg: merged view is row-identical to a full recompute, including new and absent keys") {
    val base = Seq(("a", 1L), ("a", 3L), ("b", 10L), ("c", 7L))
      .toDF("k", "v").withColumn("v", $"v".cast("decimal(18,6)"))
    // delta touches a, adds a brand-new key d, leaves b and c alone
    val delta = Seq(("a", 5L), ("d", 2L), ("d", 4L))
      .toDF("k", "v").withColumn("v", $"v".cast("decimal(18,6)"))
    val view = base.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"))
    val refreshed = Snapshot.refreshAgg(view, delta, "k", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).doubleValue))).toMap
    val full = base.unionByName(delta).groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).doubleValue))).toMap
    assert(refreshed === full)
    assert(refreshed("d") === ((2L, 6.0)))  // delta-only key appears
    assert(refreshed("b") === ((1L, 10.0))) // untouched key unchanged
  }

  test("refreshJoinAgg: delta decomposition is row-identical to re-joining the full tables") {
    // fact (id, grp, v) ⨝ dim (id, grp source) — deltas on BOTH sides,
    // chosen so every quadrant contributes: ΔA⨝B (fact 4), A⨝ΔB (fact 2
    // joins dim delta 20), ΔA⨝ΔB (fact 5 ⨝ dim 20)
    val aBase = Seq((10L, 1L), (10L, 3L), (20L, 7L))
      .toDF("a_id", "v").withColumn("v", $"v".cast("decimal(18,6)"))
    val aDelta = Seq((10L, 5L), (20L, 11L))
      .toDF("a_id", "v").withColumn("v", $"v".cast("decimal(18,6)"))
    val bBase = Seq((10L, "x")).toDF("b_id", "grp")
    val bDelta = Seq((20L, "y")).toDF("b_id", "grp")
    val view = aBase.join(bBase, $"a_id" === $"b_id")
      .groupBy("grp").agg(count(lit(1)).as("n"), sum($"v").as("total"))
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDecimal(2).doubleValue))).toMap
    val refreshed = m(Snapshot.refreshJoinAgg(view, aBase, aDelta, bBase, bDelta,
      "a_id", "b_id", "grp", "v"))
    val full = m(aBase.unionByName(aDelta)
      .join(bBase.unionByName(bDelta), $"a_id" === $"b_id")
      .groupBy("grp").agg(count(lit(1)).as("n"), sum($"v").as("total")))
    assert(refreshed === full)
    assert(refreshed("x") === ((3L, 9.0)))  // base view + ΔA⨝B arm
    assert(refreshed("y") === ((2L, 18.0))) // A⨝ΔB + ΔA⨝ΔB arms
  }
}
