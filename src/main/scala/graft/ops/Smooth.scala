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
}
