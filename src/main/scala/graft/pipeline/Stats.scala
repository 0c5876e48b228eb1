package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic descriptive statistics. Spark's built-in `stddev`/`corr`
  * accumulate floating-point co-moments incrementally, so their last ulps
  * depend on partition order — fine for analytics, fatal for a
  * hash-compared contract. These variants aggregate EXACT decimal sums
  * (Σx, Σy, Σx², Σy², Σxy — values with ≤2 decimals are exact in
  * `decimal(18,2)`, and decimal addition is associative), cast once to
  * double, and finish with a fixed IEEE operation tree that the oracle
  * replays verbatim:
  *
  *   mean   = Σx / n
  *   stddev = √(n·Σx² − (Σx)²) / n                    (population)
  *   corr   = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))
  *
  * (IEEE `+ - * / sqrt` are all correctly rounded, so identical inputs
  * give identical bits in every engine.)
  *
  * Scale shape: ONE hash aggregate with map-side partials — the five
  * sums are the sufficient statistics, so this is a single shuffle of
  * six numbers per group regardless of input size (same pattern as any
  * algebraic aggregate).
  */
object Stats {

  /** Per-group n / mean(x) / stddev_pop(x) / corr(x, y). */
  def moments(df: DataFrame, groupCol: String, x: String, y: String): DataFrame = {
    def dec(c: String): Column = col(c).cast("decimal(18,2)")
    val agg = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(dec(x)).cast("double").as("sx"),
      sum(dec(y)).cast("double").as("sy"),
      sum(dec(x) * dec(x)).cast("double").as("sxx"),
      sum(dec(y) * dec(y)).cast("double").as("syy"),
      sum(dec(x) * dec(y)).cast("double").as("sxy"))
    val nD = col("n").cast("double")
    agg.select(col(groupCol), col("n"),
      (col("sx") / nD).as("mean_x"),
      (sqrt(nD * col("sxx") - col("sx") * col("sx")) / nD).as("stddev_x"),
      ((nD * col("sxy") - col("sx") * col("sy")) /
        sqrt((nD * col("sxx") - col("sx") * col("sx")) *
          (nD * col("syy") - col("sy") * col("sy")))).as("corr_xy"))
  }
}
