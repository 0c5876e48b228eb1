package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deequ-style data-quality constraint suite: each check reduces a table
  * to ONE `(check, metric, passed)` audit row; a suite is the union of
  * its checks — the validation gate a pipeline runs before promoting a
  * snapshot. Every metric is an exact integer count, so the audit is
  * hash-replayable, and every check is a single aggregate (or anti-join +
  * aggregate) with map-side partials — the whole suite costs one pass
  * per participating table regardless of scale.
  */
object Checks {

  private def row(name: String, metric: org.apache.spark.sql.Column,
                  passed: org.apache.spark.sql.Column)(df: DataFrame): DataFrame =
    df.agg(metric.as("metric"), passed.as("passed"))
      .select(lit(name).as("check"), col("metric"), col("passed"))

  /** Duplicate key tuples: `n_rows − n_distinct(keys)`; passes at 0. */
  def unique(df: DataFrame, keys: Seq[String], name: String): DataFrame =
    row(name,
      (count(lit(1)) - countDistinct(keys.head, keys.tail: _*)).as("m"),
      count(lit(1)) === countDistinct(keys.head, keys.tail: _*))(df)

  /** Null count in `c`; passes at 0. */
  def complete(df: DataFrame, c: String, name: String): DataFrame =
    row(name, sum(when(col(c).isNull, 1L).otherwise(0L)),
      sum(when(col(c).isNull, 1L).otherwise(0L)) === 0L)(df)

  /** Rows with `c` outside [lo, hi]; passes at 0. */
  def inRange(df: DataFrame, c: String, lo: Double, hi: Double,
              name: String): DataFrame =
    row(name,
      sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)),
      sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)) === 0L)(df)

  /** Orphaned child keys (no parent match): LEFT ANTI + count; passes
    * at 0. The anti-join is an equi-join on the key — broadcast when the
    * parent is dimension-sized, shuffled otherwise; either way one pass.
    */
  def referential(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String,
                  name: String): DataFrame =
    row(name, coalesce(count(lit(1)), lit(0L)), count(lit(1)) === 0L)(
      child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti"))

  /** k-anonymity over quasi-identifier columns: number of equivalence
    * classes smaller than k (each is a re-identification risk); passes
    * at 0. One hash aggregate on the quasi-identifier tuple.
    */
  def kAnonymity(df: DataFrame, quasi: Seq[String], k: Long,
                 name: String): DataFrame =
    row(name,
      coalesce(sum(when(col("cnt") < k, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("cnt") < k, 1L).otherwise(0L)), lit(0L)) === 0L)(
      df.groupBy(quasi.map(col): _*).agg(count(lit(1)).as("cnt")))

  /** l-diversity over quasi-identifier columns: number of equivalence
    * classes whose SENSITIVE column carries fewer than l distinct values
    * (a homogeneity-attack risk k-anonymity alone misses — a class can
    * be large yet all share one diagnosis); passes at 0. One two-level
    * hash aggregate: distinct-per-class, then the violation count.
    */
  def lDiversity(df: DataFrame, quasi: Seq[String], sensitive: String,
                 l: Long, name: String): DataFrame =
    row(name,
      coalesce(sum(when(col("ndv") < l, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("ndv") < l, 1L).otherwise(0L)), lit(0L)) === 0L)(
      df.groupBy(quasi.map(col): _*)
        .agg(countDistinct(col(sensitive)).as("ndv")))

  /** Union a suite of check rows into one audit relation. */
  def suite(checks: DataFrame*): DataFrame = checks.reduce(_.unionByName(_))
}
