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
}
