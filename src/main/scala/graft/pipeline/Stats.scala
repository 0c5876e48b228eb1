package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT distributed order statistics without a global sort: the k-th
  * smallest of a long column by iterative histogram refinement (the
  * classic distributed-selection scheme — Blum et al.'s selection idea
  * in its aggregation form). Per round: ONE 256-bin count aggregate over
  * the surviving value range, a ≤256-row driver collect walks the
  * cumulative counts to the bin containing rank k, and the range narrows
  * ×256 — so ⌈log₂₅₆(range)⌉ rounds total (4 rounds covers any long
  * range that fits a double-free pipeline; values spanning 2⁶³ still
  * converge in 8). The finish collects the ≤4096 DISTINCT (value, count)
  * rows of the terminal range and walks them on the driver.
  *
  * Why not `orderBy.limit(k)`: k is data-sized for a median (n/2) —
  * TakeOrdered holds k rows per partition; a global sort shuffles the
  * world. Why not percentile_approx: it's approximate and its error is
  * rank-dependent. This is exact, each round is a map-combined aggregate
  * (256 longs on the shuffle), and every driver collect is bins-sized —
  * the k-row-collect class, never data.
  *
  * Cost contract: log₂₅₆(range) full scans of the FILTERED column (the
  * range predicate pushes to parquet, so later rounds read row-group
  * subsets where the layout clusters the column). For repeated quantile
  * queries at 100 TB, build [[Sketches.histQuantile]] once instead; this
  * is the exact one-shot.
  */
object Selection {
  /** k-th smallest (1-based) of long column `c` in `df`. Returns
    * `(n, k, value)` as a 1-row DataFrame; requires 1 ≤ k ≤ n.
    */
  def kthSmallest(df: DataFrame, c: String, k: Long): DataFrame = {
    val vals = df.select(col(c).cast("long").as("v")).where(col("v").isNotNull)
    val head = vals.agg(count(lit(1)).as("n"), min(col("v")).as("lo"),
      max(col("v")).as("hi")).head()
    val n = head.getLong(0)
    require(k >= 1 && k <= n, s"kthSmallest: k=$k outside 1..$n")
    var lo = head.getLong(1)
    var hi = head.getLong(2)
    var kk = k
    // span in BigInt: `hi - lo` WRAPS for ranges >= 2^63 (lo=-2^62,
    // hi=2^62), which would silently skip refinement and collect every
    // distinct value of the terminal "range" to the driver (ADVICE r10
    // #2) — all interval arithmetic here is exact, longs only at the end
    def span: BigInt = BigInt(hi) - BigInt(lo)
    // each round: count values per bin over [lo, hi], walk to k's bin
    while (span >= 4096) {
      val width = (span / 256 + 1).toLong // span < 2^64 → width < 2^56
      // integer `div`, not `/`: Column./ on longs returns double; when
      // the span itself overflows a long, `v - lo` can too — route the
      // subtraction through decimal(38,0) (exact for any long pair, and
      // decimal `div` yields long) instead of wrapping
      val binCol =
        if (span.isValidLong) expr(s"(v - (${lo}L)) div ${width}L")
        else expr(s"(cast(v as decimal(38,0)) - ($lo)) div ${width}L")
      val bins = vals.where(col("v") >= lo && col("v") <= hi)
        .groupBy(binCol.as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      var acc = 0L
      var i = 0
      while (acc + bins(i)._2 < kk) { acc += bins(i)._2; i += 1 }
      kk -= acc
      val newLo = BigInt(lo) + BigInt(bins(i)._1) * width
      lo = newLo.toLong                    // within [lo, hi] → fits
      hi = ((newLo + width - 1) min BigInt(hi)).toLong // clamped → fits
    }
    // terminal range: ≤4096 distinct values — collect (value, count)
    val tail = vals.where(col("v") >= lo && col("v") <= hi)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    var i = 0
    while (acc + tail(i)._2 < kk) { acc += tail(i)._2; i += 1 }
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, k, tail(i)._1)).toDF("n", "k", "value")
  }
}

/** Deterministic descriptive statistics. Spark's built-in `stddev`/`corr`
  * accumulate floating-point co-moments incrementally, so their last ulps
  * depend on partition order — fine for analytics, fatal for a
  * hash-compared contract. These variants scale inputs to exact integer
  * units (×10^decimals, [[toUnits]]), aggregate EXACT scale-0 decimal
  * sums (Σx, Σy, Σx², Σy², Σxy — int128-backed, and decimal addition is
  * associative), cast once to double, and finish with a fixed IEEE
  * operation tree that the oracle replays verbatim:
  *
  *   mean   = (Σx / n) / 10^d
  *   stddev = (√(n·Σx² − (Σx)²) / n) / 10^d           (population)
  *   corr   = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))
  *
  * (IEEE `+ - * / sqrt` are all correctly rounded, so identical inputs
  * give identical bits in every engine. Scale-0 units matter: a
  * fractional-scale decimal(18,2)→double cast is TWO roundings in DuckDB
  * — int128→double then ÷100 — and can land one ulp off Spark's
  * correctly-rounded BigDecimal cast; observed on corr_xy at sf0.001.
  * An integer sum crosses the cast as a SINGLE rounding in both engines.)
  *
  * Scale shape: ONE hash aggregate with map-side partials — the five
  * sums are the sufficient statistics, so this is a single shuffle of
  * six numbers per group regardless of input size (same pattern as any
  * algebraic aggregate).
  */
object Stats {

  /** Per-group n / mean(x) / stddev_pop(x) / corr(x, y), both columns
    * scaled to integer units at `decimals` fractional digits (exact for
    * values with ≤ `decimals` decimals; mean/stddev are de-scaled, corr
    * is unit-invariant). */
  def moments(df: DataFrame, groupCol: String, x: String, y: String,
              decimals: Int = 2): DataFrame = {
    val agg = suffStats(df, groupCol,
      toUnits(col(x), decimals), toUnits(col(y), decimals))
    val nD = col("n").cast("double")
    val u = lit(math.pow(10, decimals))
    agg.select(col(groupCol), col("n"),
      ((col("sx") / nD) / u).as("mean_x"),
      ((sqrt(nD * col("sxx") - col("sx") * col("sx")) / nD) / u).as("stddev_x"),
      ((nD * col("sxy") - col("sx") * col("sy")) /
        sqrt((nD * col("sxx") - col("sx") * col("sx")) *
          (nD * col("syy") - col("sy") * col("sy")))).as("corr_xy"))
  }

  /** The five sufficient sums for a (x, y) regression over INTEGER-UNIT
    * inputs (`xu`/`yu` long-valued columns, e.g. cents), cast to double
    * once — shared by [[ols]] and [[lagCorr]].
    *
    * Why integer units and scale-0 decimals rather than the decimal(18,6)
    * sums [[moments]] uses: a fractional-scale decimal→double cast is TWO
    * roundings in DuckDB (int128→double, then ÷10^scale) and can land one
    * ulp off Spark's correctly-rounded BigDecimal cast — harmless alone,
    * but the regression finish `n·Σy² − (Σy)²` cancels catastrophically
    * and amplifies that ulp into the visible digits (observed empirically
    * on q_regression's r²). A scale-0 sum crosses the cast as a SINGLE
    * int→double rounding, which both engines perform correctly, so every
    * downstream double is bit-identical. Slope and r² are invariant under
    * the unit scaling; the intercept is de-scaled by the caller.
    */
  private def suffStats(df: DataFrame, groupCol: String,
                        xu: Column, yu: Column): DataFrame = {
    // products in decimal(19,0) — int128-backed in both engines, so the
    // per-group sums stay exact far past long range (6e5 rows × 1e14
    // products at sf0.1 already pass 2⁶³)
    val (dx, dy) = (xu.cast("decimal(19,0)"), yu.cast("decimal(19,0)"))
    df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(dx).cast("double").as("sx"),
      sum(dy).cast("double").as("sy"),
      sum(dx * dx).cast("double").as("sxx"),
      sum(dy * dy).cast("double").as("syy"),
      sum(dx * dy).cast("double").as("sxy"))
  }

  /** `round(x · 10^decimals)` as an exact long — the deterministic
    * fixed-point scaling both engines replay (`floor(x·u + 0.5)` is
    * round-half-up in exact double arithmetic).
    */
  def toUnits(c: Column, decimals: Int): Column =
    floor(c * lit(math.pow(10, decimals)) + lit(0.5)).cast("long")

  /** Per-group simple linear regression (ordinary least squares) of
    * `y ≈ slope·x + intercept` with fit quality r², both columns scaled
    * to integer units at `decimals` fractional digits first
    * ([[suffStats]] explains why). The finish is a fixed IEEE tree the
    * oracle replays verbatim:
    *
    *   slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)      (unit-invariant)
    *   intercept = ((Σy − slope·Σx) / n) / 10^decimals    (de-scaled)
    *   r²        = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))
    *
    * DuckDB's `regr_slope` (streaming co-moments) is NOT replayable
    * bit-for-bit, so the oracle replays these formulas instead.
    *
    * Scale shape: identical to [[moments]] — ONE hash aggregate, six
    * numbers per group on the shuffle. Distributed OLS on 100 TB is
    * exactly this: the normal equations' sufficient statistics are
    * algebraic aggregates; only the k×k solve (here closed-form 2×2) is
    * driver-side.
    */
  def ols(df: DataFrame, groupCol: String, x: String, y: String,
          decimals: Int = 2): DataFrame = {
    val agg = suffStats(df, groupCol,
      toUnits(col(x), decimals), toUnits(col(y), decimals))
    val nD = col("n").cast("double")
    val covN = nD * col("sxy") - col("sx") * col("sy")
    val varxN = nD * col("sxx") - col("sx") * col("sx")
    val varyN = nD * col("syy") - col("sy") * col("sy")
    agg.select(col(groupCol), col("n"),
      (covN / varxN).as("slope"),
      (((col("sy") - (covN / varxN) * col("sx")) / nD) /
        lit(math.pow(10, decimals))).as("intercept"),
      ((covN * covN) / (varxN * varyN)).as("r2"))
  }

  /** Per-group min-max feature normalization: `(x − min) / (max − min)`
    * with the group stats attached via a BROADCAST join (groups are
    * low-cardinality by contract; the stats aggregate is map-combined).
    * Constant groups (max = min) scale to 0.0 rather than NaN. The
    * division is one IEEE op over exactly-representable inputs when `x`
    * is integer-valued — bit-identical cross-engine; for double `x` both
    * engines still divide the same bits, since min/max are selections,
    * not accumulations.
    *
    * Scale shape: one stats aggregate + a shuffle-free broadcast-joined
    * projection — the whole normalization streams through the scan.
    */
  def minMaxScale(df: DataFrame, groupCol: String, x: String): DataFrame = {
    val stats = df.groupBy(col(groupCol)).agg(
      min(col(x)).as("mn"), max(col(x)).as("mx"))
    df.join(broadcast(stats), groupCol)
      .withColumn("scaled",
        when(col("mx") === col("mn"), lit(0.0))
          .otherwise((col(x).cast("double") - col("mn").cast("double")) /
            (col("mx").cast("double") - col("mn").cast("double"))))
      .drop("mn", "mx")
  }

  /** Pearson chi-square independence statistic for a two-way contingency
    * table: `χ² = Σ_cells (O − E)² / E` with `E = rowTot·colTot / N`.
    * Returns one row: `(chi2, df, n)` (df = (R−1)(C−1)).
    *
    * Determinism: O and the totals are exact longs, so each cell term is
    * a fixed IEEE tree — but the SUM over cells is float accumulation
    * whose order differs between engines, so each term is rounded to
    * decimal(18,8) BEFORE the (associative) decimal sum, same discipline
    * as the temperature-mixing Σ√cnt.
    *
    * Scale shape: one (row, col) count aggregate; totals re-aggregate the
    * CELL relation (≤ R·C rows), never the data; everything after the
    * first agg is sketch-sized.
    */
  def chiSquare(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val cells = df.groupBy(col(rowCol).as("r"), col(colCol).as("c"))
      .agg(count(lit(1)).as("o"))
    val withTotals = cells
      .withColumn("rt", sum(col("o")).over(Window.partitionBy(col("r"))))
      .withColumn("ct", sum(col("o")).over(Window.partitionBy(col("c"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    val e = (col("rt").cast("double") * col("ct").cast("double")) /
      col("n").cast("double")
    val term = ((col("o").cast("double") - e) * (col("o").cast("double") - e) / e)
      .cast("decimal(18,8)")
    withTotals.agg(
      sum(term).cast("double").as("chi2"),
      ((countDistinct(col("r")) - 1) * (countDistinct(col("c")) - 1)).as("df"),
      any_value(col("n")).as("n"))
  }

  /** Per-group lag-1 autocorrelation of an integer-unit series ordered by
    * `orderCol`: Pearson corr of (value_{t-1}, value_t). `valueCol` must
    * already be long-valued units (correlation is scale-invariant, so the
    * caller picks any exact fixed-point scaling, e.g.
    * [[toUnits]]`(sum, 6)`).
    *
    * Scale shape: the window partitions per group — use on series whose
    * per-group length fits a task (daily/hourly rollups, not raw events);
    * the aggregate after it is the same six-number shuffle as [[ols]].
    */
  def lagCorr(df: DataFrame, groupCol: String, orderCol: String,
              valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
    val lagged = df
      .withColumn("x_prev", lag(col(valueCol), 1).over(w))
      .filter(col("x_prev").isNotNull)
    val agg = suffStats(lagged, groupCol, col("x_prev"), col(valueCol))
    val nD = col("n").cast("double")
    agg.select(col(groupCol), col("n").as("n_pairs"),
      ((nD * col("sxy") - col("sx") * col("sy")) /
        sqrt((nD * col("sxx") - col("sx") * col("sx")) *
          (nD * col("syy") - col("sy") * col("sy")))).as("autocorr"))
  }

  /** Per-group LOWER MEDIAN of an integer column — the value at ordered
    * position `(n + 1) div 2`. Discrete on purpose: an interpolated
    * median drags `(a + b) / 2` float finishes into the hash contract,
    * while the lower median is an INPUT VALUE, exact in any engine. One
    * per-group window sort (spillable; partitions by the group key,
    * never global).
    */
  private def lowerMedian(df: DataFrame, groupCol: String, valueCol: String,
                          idCol: String, out: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .filter(col("__rn") === ((col("__n") + lit(1L)) / lit(2L)).cast("long"))
      .select(col(groupCol), col(valueCol).as(out))
  }

  /** MEDIAN/MAD robust outlier audit: per group, the lower median of
    * `x`, the lower median of absolute deviations (MAD), and how many
    * rows DEVIATE BEYOND 3.5 × MAD — compared as `10·|x − med| > 35·mad`,
    * all-integer, so the verdict never touches a float. NOTE this is a
    * raw-MAD rule, deliberately NOT the Iglewicz–Hoaglin modified
    * z-score (which flags `0.6745·dev/MAD > 3.5`, i.e. dev > ~5.19·MAD
    * — noticeably laxer); the 0.6745 normal-consistency constant is
    * omitted to keep the threshold exact-integer (ADVICE r9 #2: the
    * earlier doc cited Iglewicz–Hoaglin while implementing this rule). The robust alternative to
    * z-scores for length/quality screens: one wild document shifts a
    * mean + stddev but not a median + MAD. MAD = 0 (over half the group
    * identical) degenerates to flagging ANY deviation — documented,
    * deterministic. Returns `(group, med, mad, n, n_outliers)`.
    *
    * Plan: two per-group window sorts (median, then deviation median) +
    * two joins of the row relation against 1-row-per-group medians
    * (broadcast at any realistic group count) + one aggregate.
    */
  def madOutliers(df: DataFrame, groupCol: String, x: String,
                  idCol: String): DataFrame = {
    val base = df.select(col(groupCol), col(idCol).as("__id"),
      col(x).cast("long").as("__x"))
    val med = lowerMedian(base, groupCol, "__x", "__id", "med")
    val dev = base.join(med, Seq(groupCol))
      .withColumn("__dev", abs(col("__x") - col("med")))
    val mad = lowerMedian(dev.select(col(groupCol), col("__id"), col("__dev")),
      groupCol, "__dev", "__id", "mad")
    dev.join(mad, Seq(groupCol))
      .groupBy(col(groupCol), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__dev") * 10L > col("mad") * 35L, 1L).otherwise(0L))
          .as("n_outliers"))
  }
}
