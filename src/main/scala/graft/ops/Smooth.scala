package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series smoothing over keyed event streams. */
object Smooth {

  /** Bounded EWMA with power-of-two decay: over the last `depth` rows of
    * each key (ordered by `ts, seq`),
    *
    *   ewma = Σ_j value_{-j} · 2^{-j}  /  Σ_j 2^{-j}   (j = 0 .. depth-1,
    *          missing lags excluded from both sums)
    *
    * Why powers of two and a bounded window, instead of the textbook
    * recursive `s_t = α·x_t + (1-α)·s_{t-1}`:
    *  - the recursion is inherently sequential per key (a window fold over
    *    the ENTIRE history), while the bounded form is `depth` `lag()`s in
    *    one window pass — embarrassingly parallel after the key shuffle;
    *  - every weight 2^{-j} is an exact binary float, so `value · 2^{-j}`
    *    is a pure exponent shift (no rounding), and the sums are written in
    *    a fixed left-to-right order — bit-identical across engines, which
    *    makes the result hash-verifiable against a SQL oracle with zero
    *    tolerance. An α=0.5 EWMA truncated at depth terms, exactly.
    *
    * One shuffle (the window partition). At 100 TB: key = high-cardinality
    * id (user, device), so partitions stay balanced.
    */
  def ewmaPow2(df: DataFrame, key: String, ts: String, seq: String,
               value: String, depth: Int = 8): DataFrame = {
    require(depth >= 1 && depth <= 53, s"depth must fit exact doubles, got $depth")
    val w = Window.partitionBy(key).orderBy(ts, seq)
    val terms: Seq[(Column, Column)] = (0 until depth).map { j =>
      val lagged = if (j == 0) col(value) else lag(col(value), j).over(w)
      val wj = lit(1.0 / (1L << j))
      (coalesce(lagged * wj, lit(0.0)),
        when(lagged.isNotNull, wj).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.select(col(key), col(seq), (num / den).as("ewma"))
  }

  /** Weekday seasonal components of a keyed daily series (STL-lite):
    * trend = centered 7-row moving average of the integer-unit values,
    * detrended = value − trend, seasonal(dow) = mean of the detrended
    * values at that weekday. Returns `(key, dow, n_days, seasonal)`.
    *
    * Determinism: each detrended value stays an exact integer RATIONAL —
    * `v − Σwin/cnt = (v·cnt − Σwin)/cnt` with an exact-long numerator —
    * so the per-row term is ONE correctly-rounded division; the per-dow
    * mean then sums a handful of such doubles with the order PINNED by
    * a sorted-array fold (the Relevance.tokenRarity trick — a grouped
    * double `sum()`'s accumulation order is engine-internal). Rounding
    * arbitrary doubles to decimal does NOT work here: Spark rounds the
    * shortest decimal repr while DuckDB rounds the binary value, and
    * they disagree near .5 boundaries (observed empirically).
    *
    * Scale shape: one window + one agg per key on the (tiny) daily
    * rollup relation — the raw events never enter; same per-key series
    * bound as [[cusum]]. The collected per-dow array is ≤ ⌈days/7⌉.
    */
  def seasonalDow(daily: DataFrame, key: String, day: String,
                  valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(day)).rowsBetween(-3, 3)
    daily
      .withColumn("det_num",
        col(valueCol) * count(lit(1)).over(w) - sum(col(valueCol)).over(w))
      .withColumn("term",
        col("det_num").cast("double") / count(lit(1)).over(w).cast("double"))
      .groupBy(col(key), dayofweek(col(day)).cast("long").as("dow"))
      .agg(count(lit(1)).as("n_days"),
        (aggregate(sort_array(collect_list(col("term"))), lit(0.0),
          (acc, x) => acc + x) /
          count(lit(1)).cast("double")).as("seasonal"))
  }

  /** CUSUM change-point statistic over a keyed integer-unit series:
    * `cusum_t = Σ_{i≤t}(v_i − mean)` — drifts near 0 while the series is
    * stationary, ramps when the level shifts; `|cusum| > h` flags the
    * change. `valueCol` must be long-valued units (e.g. micros — see
    * [[graft.pipeline.Stats.toUnits]]).
    *
    * Determinism: the textbook form accumulates `v − mean` in floating
    * point, whose half-open window sum is engine-internal (segment trees
    * need not fold left-to-right). Instead everything stays INTEGER:
    * with S = Σv and R_t the running sum,
    *
    *   cusum_t = R_t − t·S/n  =  (n·R_t − t·S) / n
    *
    * where `n·R_t − t·S` is an exact long — the only float op is the
    * final division by n. One group-stats aggregate (broadcast back) +
    * one running-sum window per key.
    */
  def cusum(df: DataFrame, key: String, order: String,
            valueCol: String): DataFrame = {
    val stats = df.groupBy(col(key)).agg(
      sum(col(valueCol)).as("cusum_s"), count(lit(1)).as("cusum_n"))
    val w = Window.partitionBy(col(key)).orderBy(col(order))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(broadcast(stats), key)
      .withColumn("cusum_r", sum(col(valueCol)).over(w))
      .withColumn("cusum_i", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(order))).cast("long"))
      .select(col(key), col(order),
        ((col("cusum_n") * col("cusum_r") -
          col("cusum_i") * col("cusum_s")).cast("double") /
          col("cusum_n").cast("double")).as("cusum"))
  }
}
