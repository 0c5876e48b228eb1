package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the points not dominated by any other —
  * `q` dominates `p` when `q.x ≤ p.x ∧ q.y ≥ p.y` and strictly better in
  * one (x minimized, y maximized). The multi-objective "best tradeoffs"
  * query: cheapest-vs-largest parts, fastest-vs-accurate models, …
  *
  * The naive formulation is a NOT EXISTS theta self-join — quadratic and
  * nested-loop-planned. In 2-D it collapses to a SORT: after keeping the
  * best y per distinct x, a point is on the frontier iff its y strictly
  * exceeds every y at a smaller x — one running-max window.
  *
  * Scale shape: the x-dedup is a hash aggregate (full parallelism); the
  * running max runs TWO-STAGE because a global `Window.orderBy` is a
  * single-task sort — first a per-x-range bucket pass (partitioned window,
  * parallel) that keeps only bucket-local frontier points, then the exact
  * global pass over the survivors. Survivors per bucket are bounded by
  * the distinct y values in it (a frontier is strictly monotone), so the
  * final window sees a sketch-sized relation, same discipline as
  * [[graft.pipeline.Skew.saltedTopK]]'s merge rank.
  */
object Skyline {

  /** Frontier points `(x, y)` — x minimized, y maximized. `bucketWidth`
    * sets the parallel first-pass granularity (any positive value is
    * correct; it only tunes parallelism).
    */
  def frontier2d(df: DataFrame, xCol: String, yCol: String,
                 bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val g = df.groupBy(col(xCol).as("x"))
      .agg(max(col(yCol)).as("y"))

    // bucket-local pass: dominated-within-bucket rows can't be on the
    // global frontier (their dominator is in the same bucket)
    val bucket = floor(col("x") / lit(bucketWidth)).cast("long")
    val wLocal = Window.partitionBy(bucket).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = g.withColumn("prev_y", max(col("y")).over(wLocal))
      .filter(col("prev_y").isNull || col("y") > col("prev_y"))
      .drop("prev_y")

    // exact global pass over the (small) survivor set
    val wGlobal = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    local.withColumn("prev_y", max(col("y")).over(wGlobal))
      .filter(col("prev_y").isNull || col("y") > col("prev_y"))
      .select(col("x"), col("y"))
  }
}
