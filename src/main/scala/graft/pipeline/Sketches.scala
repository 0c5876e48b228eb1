package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (HyperLogLog, via Spark's built-in
  * Apache DataSketches functions) — the INCREMENTAL analytics pattern at
  * 100 TB: sketch each partition/day/shard ONCE, store the few-KB binary
  * sketch column, and answer any later "distinct users over window X"
  * by unioning sketches — no rescan of raw data, ever.
  *
  * HLL register merge is max() — commutative, associative, idempotent —
  * so estimates are DETERMINISTIC under any partitioning, retry, or merge
  * order (asserted in `SketchesSpec`: merging per-shard sketches equals
  * sketching the union, bit-for-bit). Error is the standard HLL ~1-2% at
  * the default lgConfigK; exact distinct stays available via
  * `count(DISTINCT …)` (q_agg_distinct) when the answer must be exact.
  */
object Sketches {

  /** One HLL sketch per group over `valueCol` — the ingest-time step. */
  def distinctSketch(df: DataFrame, groupCols: Seq[String],
                     valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("sketch"))

  /** Merge stored sketches up to a coarser grouping and estimate. */
  def mergeEstimate(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"))

  /** Direct estimate without storing the sketch (one-shot form). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String],
                     valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_sketch_agg(col(valueCol))).as("approx_distinct"))

  // -------------------------------------------- oracle-replayable HLL twin

  /** md5-register HyperLogLog twin of [[distinctSketch]] (Flajolet et al.
    * 2007) as a RELATION: `(group…, register, max_rho)` with `m` registers —
    * same pattern as [[cmsSketch]], which made the CMS a deterministic
    * relation. The DataSketches path above stays the production variant
    * (tighter error, dense binary registers); THIS twin exists so the
    * whole sketch lifecycle — build, merge, estimate — is replayable
    * bit-for-bit by a SQL oracle in any engine:
    *
    *  - register index and rho both derive from md5 (engine-independent);
    *  - rho = leading-zero-count + 1 of a 24-bit hash, computed as
    *    `25 - length(bin(v))` — `bin` drops leading zeros identically in
    *    Spark and DuckDB (`bin(0) = "0"` in both, special-cased to 25);
    *  - merge is `max(max_rho)` per register — commutative, associative,
    *    idempotent, so any shard partitioning/retry yields THE sketch;
    *  - the harmonic-mean finish avoids float-sum order dependence by
    *    summing EXACT integers `2^(25-max_rho)` (dyadic rationals scaled
    *    by 2^25) and dividing once — IEEE `*`/`/` are correctly rounded,
    *    so the double estimate is identical in every engine.
    *
    * The finish is the RAW HLL estimator (no linear-counting small-range
    * correction: that needs `ln`, which is not correctly rounded and may
    * differ across engines' libm — the production DataSketches path has
    * the corrected estimate).
    *
    * Scale shape: identical to the DataSketches path — one hash aggregate
    * onto at most `m` cells per group; the sketch is KBs regardless of
    * input size, and only `(register, max_rho)` pairs ride the shuffle.
    */
  val HllM = 64 // registers; alpha_64 = 0.709 (Flajolet et al., table 1)

  private def hllRegister(value: Column): Column =
    conv(substring(md5(concat(lit("reg:"), value.cast("string"))), 1, 6), 16, 10)
      .cast("long") % HllM

  private def hllRho(value: Column): Column = {
    val v = conv(substring(md5(concat(lit("rho:"), value.cast("string"))), 1, 6), 16, 10)
      .cast("long")
    when(v === 0, lit(25L)).otherwise(lit(25L) - length(bin(v)))
  }

  /** One `(register, max_rho)` relation per group — the ingest-time step. */
  def hllReplaySketch(df: DataFrame, groupCols: Seq[String],
                      valueCol: String): DataFrame =
    df.select((groupCols.map(col) :+ hllRegister(col(valueCol)).as("register")
        :+ hllRho(col(valueCol)).as("rho")): _*)
      .groupBy((groupCols :+ "register").map(col): _*)
      .agg(max("rho").as("max_rho"))

  /** Union partial sketches: register-wise max, any merge order. */
  def hllReplayMerge(groupCols: Seq[String], sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy((groupCols :+ "register").map(col): _*)
      .agg(max("max_rho").as("max_rho"))

  /** Raw-HLL harmonic estimate from a [[hllReplaySketch]] relation.
    * `s_scaled = Σ_j 2^(25 - M_j)` over all m registers (absent register ⇒
    * M_j = 0 ⇒ 2^25) is exact integer arithmetic; the only float ops are
    * one multiply chain of constants and one division.
    */
  def hllReplayEstimate(sketch: DataFrame, groupCols: Seq[String]): DataFrame =
    sketch.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("registers_used"),
        // the Scala shiftleft() helper takes a literal shift only; the SQL
        // form accepts a column expression
        (sum(expr("shiftleft(1L, cast(25 - max_rho as int))")) +
          (lit(HllM.toLong) - count(lit(1))) * lit(1L << 25)).as("s_scaled"))
      .withColumn("approx_distinct",
        lit(0.709 * HllM * HllM) * lit((1L << 25).toDouble) /
          col("s_scaled").cast("double"))

  // ------------------------------------------------------- Count-Min Sketch

  /** Count-Min Sketch (Cormode & Muthukrishnan 2005) as a RELATION:
    * `(row, bucket, cnt)` with `depth` rows × `width` buckets — the
    * mergeable frequency twin of the HLL distinct sketch. Hashing is
    * md5-derived (`bucket_i(x) = int(md5("i:x")[0,6)) mod width`), so the
    * sketch is deterministic in every engine and the DuckDB oracle
    * replays it exactly.
    *
    * Scale shape: `posexplode` of the depth bucket keys (computed per row,
    * shuffle-free) then ONE hash aggregate onto at most depth×width
    * cells — the sketch is a few KB regardless of input size. Merging
    * shards is `union → groupBy(row, bucket) → sum` ([[cmsMerge]]):
    * addition is commutative/associative, so partial sketches from any
    * partitioning/retry merge to the identical sketch.
    */
  def cmsBucket(value: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"$row:"), value.cast("string"))), 1, 6), 16, 10)
      .cast("long") % width

  def cmsSketch(df: DataFrame, valueCol: String, depth: Int, width: Int): DataFrame =
    df.select(posexplode(array((0 until depth).map(i =>
        cmsBucket(col(valueCol), i, width)): _*)).as(Seq("r", "bucket")))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cnt"))
      .select(col("r").cast("long").as("r"), col("bucket"), col("cnt"))

  /** Union partial sketches built with the same (depth, width). */
  def cmsMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))

  /** Fixed-bin histogram sketch over a KNOWN value range — the mergeable
    * QUANTILE member of the sketch family (HLL = distinct, CMS =
    * frequency). `bins` equal-width buckets over `[lo, hi)`, out-of-range
    * values clamped to the edge bins. Mergeable like CMS: union + sum.
    * Honest trade-off vs t-digest/KLL: needs the range up front and has
    * fixed resolution `(hi-lo)/bins` — in exchange it is DETERMINISTIC
    * (t-digest centroids depend on merge order) and replayable in any
    * engine.
    */
  def histSketch(df: DataFrame, valueCol: String,
                 lo: Double, hi: Double, bins: Int): DataFrame =
    df.select(least(lit(bins - 1), greatest(lit(0),
        floor((col(valueCol) - lo) / (hi - lo) * bins).cast("int"))).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))

  /** Interpolated quantile estimates from a [[histSketch]]: for each q,
    * find the bin where the cumulative count crosses `q·n` and
    * interpolate linearly inside it. The window runs over the BIN-SIZED
    * sketch (not the data), so the single-partition sort is `bins` rows.
    */
  def histQuantile(sketch: DataFrame, qs: Seq[Double],
                   lo: Double, hi: Double, bins: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = sketch.withColumn("cum", sum("cnt").over(w))
      .withColumn("n", max("cum").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    val qdf = sketch.sparkSession.createDataFrame(qs.map(Tuple1(_))).toDF("q")
    val width = (hi - lo) / bins
    qdf.crossJoin(cum)
      .filter(col("cum") >= col("q") * col("n") &&
        (col("cum") - col("cnt")) < col("q") * col("n"))
      .select(col("q"),
        (lit(lo) + (col("bin").cast("double") +
          (col("q") * col("n") - (col("cum") - col("cnt")).cast("double")) /
            col("cnt").cast("double")) * lit(width)).as("est"))
  }

  /** Per-GROUP [[histSketch]]: `(group, bin, cnt)` cells — one hash
    * aggregate onto at most groups×bins cells, additive-mergeable like the
    * global sketch.
    */
  def histSketchBy(df: DataFrame, groupCol: String, valueCol: String,
                   lo: Double, hi: Double, bins: Int): DataFrame =
    df.select(col(groupCol), least(lit(bins - 1), greatest(lit(0),
        floor((col(valueCol) - lo) / (hi - lo) * bins).cast("int"))).cast("long").as("bin"))
      .groupBy(groupCol, "bin").agg(count(lit(1)).as("cnt"))

  /** Distribution-DRIFT audit between two relations (train vs serve,
    * yesterday vs today): per group, the L1 distance between the two
    * value histograms — the drift monitor that gates model retraining
    * and catches upstream schema/unit changes. The usual PSI/KL forms
    * need `ln` (libm, engine-divergent); L1 on histograms carries the
    * same signal, and the cross-multiplied form
    * `Σ_bins |c_a·n_b − c_b·n_a| / (n_a·n_b)` keeps the whole numerator
    * an exact order-free integer sum — the ONLY float op is the final
    * divide, so the score is bit-identical in any engine. Range 0 (same
    * shape) to 2 (disjoint support).
    */
  def histDriftL1(a: DataFrame, b: DataFrame, groupCol: String, valueCol: String,
                  lo: Double, hi: Double, bins: Int): DataFrame = {
    val ha = histSketchBy(a, groupCol, valueCol, lo, hi, bins)
      .withColumnRenamed("cnt", "ca")
    val hb = histSketchBy(b, groupCol, valueCol, lo, hi, bins)
      .withColumnRenamed("cnt", "cb")
    val cells = ha.join(hb, Seq(groupCol, "bin"), "full")
      .select(col(groupCol), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val totals = cells.groupBy(groupCol)
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cells.join(totals, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(any_value(col("na")).as("n_a"), any_value(col("nb")).as("n_b"),
        sum(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("num"))
      .select(col(groupCol), col("n_a"), col("n_b"),
        (col("num").cast("double") / (col("n_a") * col("n_b")).cast("double"))
          .as("l1_drift"))
  }

  /** Per-group interpolated quantiles from a [[histSketchBy]] relation —
    * the grouped twin of [[histQuantile]]. Windows partition on the group
    * over the (groups × bins)-sized sketch: no single-partition global
    * sort, and the q-list cross join stays sketch-sized.
    */
  def histQuantileBy(sketch: DataFrame, groupCol: String, qs: Seq[Double],
                     lo: Double, hi: Double, bins: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = Window.partitionBy(groupCol).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = sketch.withColumn("cum", sum("cnt").over(wc))
      .withColumn("n", max("cum").over(Window.partitionBy(groupCol)))
    val qdf = sketch.sparkSession.createDataFrame(qs.map(Tuple1(_))).toDF("q")
    val width = (hi - lo) / bins
    qdf.crossJoin(cum)
      .filter(col("cum") >= col("q") * col("n") &&
        (col("cum") - col("cnt")) < col("q") * col("n"))
      .select(col(groupCol), col("q"),
        (lit(lo) + (col("bin").cast("double") +
          (col("q") * col("n") - (col("cum") - col("cnt")).cast("double")) /
            col("cnt").cast("double")) * lit(width)).as("est"))
  }

  /** Curriculum/quantile binning: tag every row with the quantile bucket
    * (0..buckets-1) of `valueCol`'s own distribution — the scalable
    * replacement for a global `ntile()` window, whose empty partitionBy
    * sorts the whole dataset in ONE task. Here the distribution lives in
    * the bin-sized [[histSketch]]; each row equi-joins its bin id against
    * the broadcast cumulative table and gets
    * `bucket = buckets·(rows before my bin) div n` — exact integer
    * arithmetic, so any engine replays it bit-for-bit. Resolution is the
    * histogram bin: rows inside one bin share a bucket (ntile's exact
    * rank-split needs the global sort this avoids).
    */
  def histBucketize(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                    bins: Int, buckets: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    val cum = histSketch(df, valueCol, lo, hi, bins)
      .withColumn("__before", coalesce(sum("cnt").over(w), lit(0L)))
      .withColumn("__n", sum("cnt").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("bin"), col("__before"), col("__n"))
    df.withColumn("bin", least(lit(bins - 1), greatest(lit(0),
        floor((col(valueCol) - lo) / (hi - lo) * bins).cast("int"))).cast("long"))
      .join(broadcast(cum), "bin")
      .withColumn("bucket", expr(s"($buckets * __before) div __n"))
      .drop("bin", "__before", "__n")
  }

  /** Range-SELECTIVITY estimate from a [[histSketch]] — the optimizer
    * statistic for "how many rows match `value ∈ [a, b)`?" answered from
    * the KB-size sketch, never the data (the planning companion of
    * [[cmsJoinSizeEstimate]]: that prices a join, this prices a filter).
    * Interior bins contribute fully, edge bins linearly by overlap.
    *
    * Determinism contract: with integer-aligned `lo/hi/bins/a/b` every
    * per-bin overlap is an exact integer, so the aggregate sums longs
    * (order-free) and the ONLY float op is the final divide by the bin
    * width — bit-identical in any engine. Non-aligned probes would sum
    * doubles in shuffle order; keep probes on bin-width multiples.
    */
  def histSelectivity(sketch: DataFrame, lo: Double, hi: Double, bins: Int,
                      a: Double, b: Double): DataFrame = {
    val width = (hi - lo) / bins
    val binLo = lit(lo) + col("bin").cast("double") * width
    val overlap = greatest(lit(0.0),
      least(lit(b), binLo + width) - greatest(lit(a), binLo)).cast("long")
    sketch.agg((sum(col("cnt") * overlap).cast("double") / width).as("est_rows"))
  }

  /** Point-estimate the frequency of each item in `items`: `min` over the
    * depth rows of the addressed cell, an empty cell counting 0 (the
    * classic CMS upper-bound estimate — never under-counts, over-counts
    * only on collisions). `items` is expected to be small (heavy-hitter
    * candidates); it left-joins the KB-size sketch.
    */
  def cmsEstimate(sketch: DataFrame, items: DataFrame, itemCol: String,
                  depth: Int, width: Int): DataFrame =
    items.select(col(itemCol), posexplode(array((0 until depth).map(i =>
        cmsBucket(col(itemCol), i, width)): _*)).as(Seq("r", "bucket")))
      .withColumn("r", col("r").cast("long"))
      .join(sketch, Seq("r", "bucket"), "left")
      .groupBy(itemCol).agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Pre-shuffle JOIN-CARDINALITY estimate from two frequency sketches —
    * the AMS/CMS inner-product estimator (Cormode & Muthukrishnan '05
    * §4.2): `|A ⋈ B on key| = Σ_key f_A(key)·f_B(key)`, estimated as
    * `min_r Σ_bucket A_r[b]·B_r[b]`. Never under-estimates (collisions
    * only ADD mass), exact when no bucket collides — both directions
    * asserted in `SketchesSpec`.
    *
    * Why it matters at 100 TB: the estimate prices a join BEFORE paying
    * its shuffle — each side is sketched in one mergeable map-side pass
    * (KB-size output, storable per shard/day like the HLL sketches), and
    * the estimator is a sketch-sized join. An optimizer-style gate
    * (broadcast vs sort-merge vs refuse-to-run) reads this number, not
    * the data. Deterministic: md5 bucket hashing, integer counters.
    */
  def cmsJoinSizeEstimate(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
                          depth: Int, width: Int): DataFrame = {
    val sa = cmsSketch(joinSide(a, aCol), "v", depth, width).withColumnRenamed("cnt", "ca")
    val sb = cmsSketch(joinSide(b, bCol), "v", depth, width).withColumnRenamed("cnt", "cb")
    val ip = sa.join(sb, Seq("r", "bucket"))
      .groupBy(col("r")).agg(sum(col("ca") * col("cb")).as("ip"))
    // min over ALL depth rows: a row with zero shared buckets estimates 0,
    // so spine from the sketch's own r values, absent ip coalesced to 0
    sa.select(col("r")).distinct().join(ip, Seq("r"), "left")
      .agg(min(coalesce(col("ip"), lit(0L))).as("est_pairs"))
  }

  /** Equi-join inputs as the estimator sees them: string-cast, non-null
    * keys (SQL join semantics drop null keys anyway).
    */
  def joinSide(df: DataFrame, c: String): DataFrame =
    df.select(col(c).cast("string").as("v")).filter(col("v").isNotNull)

  // ------------------------------------------------------------- KMV

  /** 2^60 as an exact double — the KMV hash-space size. The estimator's
    * numerator (k-1)·2^60 stays exactly representable for any k < 2^53,
    * so cross-engine the only rounding is the final IEEE divide.
    */
  private val KmvSpace: Double = math.pow(2, 60)

  /** K-minimum-values (bottom-k) distinct sketch per group: the k
    * SMALLEST distinct 60-bit md5 hashes of `keyCol`, sorted ascending.
    * Unlike HLL this sketch supports exact-replayable SET OPERATIONS —
    * the k-min of a union of sketches is the union's sketch, membership
    * of a hash is exact — so Jaccard/intersection between shards come
    * straight off the stored arrays ([[kmvPairEstimates]]), the question
    * the HLL register twin can't answer without inclusion-exclusion
    * error stacking.
    *
    * Scale shape: one narrow pass; each partition keeps a bounded
    * dedup-ing TreeSet per group (the DataSketches KMV update loop), and
    * only k-sized partial arrays shuffle — `merge(partials) ≡ sketch
    * (union)` because k-min-of-distinct is a commutative idempotent
    * monoid (asserted in SketchesSpec under repartitioning). The raw
    * relation never sorts and never moves.
    *
    * `keyCol` must be a string column (md5's input; callers cast).
    */
  def kmvSketch(df: DataFrame, groupCol: String, keyCol: String,
                k: Int): DataFrame = {
    require(k >= 2, s"k=$k must be >= 2")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val hashed = df.select(col(groupCol).cast("string").as("g"),
      conv(substring(md5(col(keyCol)), 1, 15), 16, 10).cast("long").as("hv"))
    val outSchema = StructType(Seq(
      StructField("g", StringType),
      StructField("part_ks", ArrayType(LongType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val partials = hashed.mapPartitions { rows =>
      val heaps = scala.collection.mutable.Map
        .empty[String, java.util.TreeSet[java.lang.Long]]
      rows.foreach { r =>
        val ts = heaps.getOrElseUpdate(r.getString(0),
          new java.util.TreeSet[java.lang.Long]())
        ts.add(r.getLong(1))          // TreeSet dedups inside the bound
        if (ts.size > k) { ts.pollLast(); () } // evict the largest
      }
      heaps.iterator.map { case (g, ts) =>
        Row(g, ts.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSeq)
      }
    }(enc)
    partials.groupBy(col("g"))
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("part_ks"))))),
        1, k).as("ks"))
      .select(col("g").as(groupCol), col("ks"))
  }

  /** Distinct estimate from a KMV sketch: exact `|ks|` while the sketch
    * is under-full (it IS the distinct hash set), else the classic
    * unbiased (k-1)/U_(k) with U the k-th min normalized to [0,1) —
    * exact-integer numerator, ONE IEEE divide, bit-identical in any
    * engine that can rank hashes.
    */
  def kmvEstimate(sketch: DataFrame, groupCol: String, k: Int): DataFrame = {
    val n = size(col("ks")).cast("long")
    sketch.select(col(groupCol), n.as("n_sketch"),
      when(n < k, n.cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(KmvSpace) /
          element_at(col("ks"), k).cast("double")).as("est_distinct"))
  }

  /** Pairwise overlap estimates between all group sketches: for each
    * unordered pair, the union sketch is the k smallest of the merged
    * arrays, Ĵ = |hashes in BOTH sketches among them| / |union sketch|
    * (exact Jaccard when the union is under-full), and the intersection
    * estimate is Ĵ·D̂(union). The join is sketch-relation × sketch-
    * relation — groups², never data — and every number is integer ranks
    * + the two documented IEEE ops, so DuckDB replays it exactly.
    */
  def kmvPairEstimates(sketch: DataFrame, groupCol: String,
                       k: Int): DataFrame = {
    val a = sketch.select(col(groupCol).as("ga"), col("ks").as("ksa"))
    val b = sketch.select(col(groupCol).as("gb"), col("ks").as("ksb"))
    val unionK = slice(array_sort(array_distinct(concat(col("ksa"), col("ksb")))), 1, k)
    val nu = size(unionK)
    val matches = size(array_intersect(unionK,
      array_intersect(col("ksa"), col("ksb"))))
    val jacc = matches.cast("double") / nu.cast("double")
    val estU = when(nu < k, nu.cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(KmvSpace) /
        array_max(unionK).cast("double")) // sorted ascending → max = k-th min
    a.join(b, col("ga") < col("gb"))
      .select(col("ga"), col("gb"),
        nu.cast("long").as("n_union"), matches.cast("long").as("n_shared"),
        jacc.as("jaccard_est"), (jacc * estU).as("intersection_est"))
  }

  /** DIRECTIONAL containment estimates from the stored KMV sketches:
    * `cont(A ⊆ B) = Î(A∩B) / D̂(A)` for every ordered source pair — the
    * question the symmetric Jaccard of [[kmvPairEstimates]] cannot
    * answer ("is source A mostly inside source B?" — the crawl-dedup /
    * acquisition call: a small source 90% contained in an existing one
    * adds almost nothing, whatever its Jaccard says). Both factors are
    * the already-replayable estimators, combined by one IEEE division —
    * bit-identical in any engine.
    *
    * Scale shape: [[kmvPairEstimates]]' groups²-sized sketch self-join
    * plus one groups-sized equi-join of the per-group estimates — the
    * corpus is touched only by the sketch build, exactly like the exact
    * q_cross_source_overlap audit it replaces at 100 TB (which costs a
    * full corpus-pair shuffle).
    */
  def kmvContainment(sketch: DataFrame, groupCol: String, k: Int): DataFrame = {
    val pairs = kmvPairEstimates(sketch, groupCol, k)
      .select(col("ga"), col("gb"), col("intersection_est"))
    val sym = pairs.unionByName(pairs.select(col("gb").as("ga"),
      col("ga").as("gb"), col("intersection_est")))
    val est = kmvEstimate(sketch, groupCol, k)
      .select(col(groupCol).as("ga"), col("est_distinct").as("da"))
    sym.join(est, Seq("ga"))
      .select(col("ga"), col("gb"), col("intersection_est"),
        (col("intersection_est") / col("da")).as("containment_est"))
  }
}
