package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric band join — `|a.x − b.x| ≤ width` (optionally under extra
  * equi-keys) — without a nested loop. A raw band predicate gives Catalyst
  * nothing to hash on, so it plans BroadcastNestedLoopJoin: O(n·m)
  * comparisons and a broadcast of a whole side — the classic 100 TB
  * cliff (stock Spark has no range-join strategy; the hint exists only in
  * Databricks' fork, so the engine does the rewrite itself).
  *
  * The rewrite is bucketing: partition the number line into `width`-sized
  * cells, replicate ONE side to its cell and both neighbors, and
  * equi-join on the cell id. Any pair within `width` is in the same or
  * adjacent cells, so the equi-join (+ residual band filter) finds
  * exactly the true pairs — each at most once, because the
  * non-replicated side keeps its single home cell. Cost: 3× replication
  * of one side through a HASH join instead of n·m comparisons; the join
  * key `(equi-keys, cell)` is high-cardinality, so it shuffles cleanly.
  */
object BandJoin {

  private def cell(c: Column, width: Double): Column =
    floor(c / lit(width)).cast("long")

  /** Pairs `(l, r)` with `l.keys = r.keys` and `|l.x − r.x| ≤ width`.
    * `left`/`right` are `(idCol, xCol, equiKeys…)` relations; output is
    * `(equiKeys…, a, b, a_x, b_x)` where `a`/`b` are the left/right ids.
    */
  def join(left: DataFrame, right: DataFrame, idCol: String, xCol: String,
           width: Double, equiKeys: Seq[String]): DataFrame = {
    require(width > 0, "band width must be positive")
    // left keeps its single home cell …
    val l = left.select(
      (equiKeys.map(col) :+ col(idCol).as("a") :+
        col(xCol).as("a_x") :+ cell(col(xCol), width).as("band_cell")): _*)
    // … right replicates to home cell − 1, home, home + 1
    val r = right.select(
      (equiKeys.map(col) :+ col(idCol).as("b") :+ col(xCol).as("b_x")): _*)
      .withColumn("band_cell",
        explode(array(cell(col("b_x"), width) - 1, cell(col("b_x"), width),
          cell(col("b_x"), width) + 1)))

    l.join(r, equiKeys :+ "band_cell")
      .filter(abs(col("a_x") - col("b_x")) <= width)
      .select((equiKeys.map(col) :+ col("a") :+ col("b") :+
        col("a_x") :+ col("b_x")): _*)
  }

  /** Self band join, deduped to distinct unordered pairs (`a < b`) of
    * rows within `width` of each other, per equi-key group.
    */
  def selfPairs(df: DataFrame, idCol: String, xCol: String, width: Double,
                equiKeys: Seq[String]): DataFrame =
    join(df, df, idCol, xCol, width, equiKeys).filter(col("a") < col("b"))
}
