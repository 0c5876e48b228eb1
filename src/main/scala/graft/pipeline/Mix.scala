package graft.pipeline

import graft.GraftStorage.Syntax
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data-mixing primitives for training-corpus assembly:
  * stratified downsampling and epoch-weighted upsampling by source/domain
  * (the "data mixture" knobs of every public LLM recipe — e.g. The Pile /
  * Gopher / LLaMA mixture tables weight each source independently).
  *
  * Sampling is HASH-based, not RNG-based: a row is kept iff
  * `md5(seed:key) mod 100 < rate(stratum)`. That makes the sample
  *   - reproducible across runs, retries, and engines (no RNG state, no
  *     partition-order dependence — `sample()` has both),
  *   - consistent under re-partitioning (decision is a pure row function),
  *   - oracle-verifiable bit-for-bit.
  * Per-stratum rates compile to a literal CASE chain — no join, no
  * broadcast, shuffle-free; the whole mix streams through a 100 TB scan.
  */
object Mix {

  /** Deterministic percentile in [0, 100): first 6 hex chars of
    * `md5(seed ++ ":" ++ key)` as an integer, mod 100. 6 hex chars = 24
    * bits, so the mod-100 bias is < 2⁻¹⁷ — negligible and, more
    * important, identical in every engine.
    */
  def hashPct(key: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), key.cast("string"))), 1, 6), 16, 10)
      .cast("long") % 100

  private def rateExpr(stratum: Column, rates: Map[String, Int], default: Int): Column =
    rates.toSeq.sortBy(_._1).foldRight(lit(default): Column) { case ((k, v), e) =>
      when(stratum === k, lit(v)).otherwise(e)
    }

  /** Keep each row of stratum `s` with probability `rates(s)/100`
    * (`default`/100 for unlisted strata), decided by [[hashPct]] of
    * `key` — deterministic stratified sampling.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, key: Column,
                       rates: Map[String, Int], default: Int,
                       seed: String = "mix"): DataFrame =
    df.filter(hashPct(key, seed) < rateExpr(col(stratumCol), rates, default))

  /** Integer epoch-weighted upsampling: stratum `s` appears `weights(s)`
    * times (unlisted strata once), tagged with `epoch` 1..w — how a
    * mixture over-samples high-quality sources. Explodes map-side; no
    * shuffle, output size = Σ wᵢ·|stratumᵢ|.
    */
  def upsample(df: DataFrame, stratumCol: String, weights: Map[String, Int]): DataFrame =
    df.withColumn("epoch",
      explode(sequence(lit(1), rateExpr(col(stratumCol), weights, 1))))

  /** Exactly (up to) `k` rows per stratum — the fixed-SIZE twin of
    * [[stratifiedSample]]'s fixed-rate: eval hold-outs, per-domain audit
    * samples, "10k docs from every source". Selection order is the md5 of
    * `seed:key` (a uniform deterministic permutation — reproducible across
    * runs, retries, engines, and re-partitioning), tie-broken by `key` for
    * totality. Output = input + `sample_rank` (1-based hash rank within
    * the stratum).
    *
    * Scale shape: strata are LOW-cardinality by construction, so a plain
    * `Window.partitionBy(stratum)` would sort whole strata in single
    * tasks; this delegates to [[Skew.saltedTopK]] — per-(stratum, salt)
    * shard ranks, then a merge rank over ≤ 32·k survivors.
    */
  def samplePerStratum(df: DataFrame, stratumCol: String, key: Column, k: Int,
                       seed: String = "mix"): DataFrame =
    Skew.saltedTopK(df, col(stratumCol), key, k,
        order = Seq(md5(concat(lit(seed + ":"), key.cast("string"))), key))
      .withColumnRenamed("rank", "sample_rank")

  /** Deterministic uniform in [0, 1): 24 md5 bits / 2²⁴ — the same hash
    * stream as [[hashPct]], but exact (the divisor is a power of two, so
    * the double is the bit pattern itself — no mod bias, no rounding).
    */
  def hashUniform(key: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + ":"), key.cast("string"))), 1, 6), 16, 10)
      .cast("double") / lit(16777216.0)

  /** Temperature-weighted source mixing (mT5/XLM-R style): stratum `s`
    * gets sampling weight `w_s = √cnt_s / Σ√cnt`, i.e. temperature
    * α = 0.5 — small sources are up-weighted relative to their share,
    * head sources down-weighted. Each row is kept with probability
    * `rate_s = min(1, budget·w_s / cnt_s)`, decided by [[hashUniform]]
    * (reproducible across runs / retries / engines). α is fixed at 0.5
    * because `sqrt` is IEEE-correctly-rounded — `pow(x, α)` for general α
    * is not, so its last ulp could differ between engines and flip a
    * hash-compared keep decision.
    *
    * Returns the per-stratum audit `(stratum, n_total, rate, n_sampled)`;
    * [[temperatureSampled]] returns the sampled rows themselves.
    *
    * Scale shape: stratum counts are ONE map-combined aggregate; the
    * Σ√cnt total is a 1-row broadcast cross join over the tiny stratum
    * relation (never a driver collect); the per-row keep decision joins
    * the broadcast rate table and streams through the scan shuffle-free.
    */
  def temperatureSampled(df: DataFrame, stratumCol: String, key: Column,
                         budget: Long, seed: String = "mix"): DataFrame = {
    // √cnt is rounded to decimal(18,8) BEFORE the Σ√cnt total: decimal
    // addition is associative (a double sum's last ulp would depend on
    // stratum order, which the two engines need not share)
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_total"))
      .withColumn("sqrt_n",
        sqrt(col("n_total").cast("double")).cast("decimal(18,8)"))
    val tot = counts.agg(sum(col("sqrt_n")).cast("double").as("tot_sqrt"))
    val rates = counts.crossJoin(broadcast(tot)).select(col(stratumCol),
      col("n_total"),
      least(lit(1.0),
        (lit(budget.toDouble) *
          (col("sqrt_n").cast("double") / col("tot_sqrt"))) /
          col("n_total").cast("double")).as("rate"))
    df.join(broadcast(rates), stratumCol)
      .filter(hashUniform(key, seed) < col("rate"))
  }

  /** Shape the corpus to a TARGET distribution over a stratum column —
    * the mixture-rebalancing step (DoReMi-style reference weights, or
    * "make the length/source histogram match the eval distribution"):
    * keep the LARGEST subcorpus whose strata follow `targets`
    * proportions. With integer target weights w_s (summing to W) and
    * stratum counts n_s, the feasible scaled total is
    * `T = min_s (n_s·W div w_s)` — the binding stratum caps everything —
    * and stratum s keeps at rate `T·w_s / (W·n_s)` (≤ 1 by construction
    * of T), decided per row by [[hashUniform]]: reproducible across
    * runs, engines, retries, and repartitioning, no RNG state. Strata
    * absent from `targets` are dropped (weight 0); target strata absent
    * from the corpus make the match infeasible and fail loudly.
    *
    * Returns sampled rows with `(rate, n_total)` audit columns attached;
    * [[matchDistributionAudit]] is the per-stratum rollup.
    *
    * Scale shape: ONE map-combined stratum-count aggregate, a 1-row
    * broadcast of the feasibility minimum (the q_mix_temperature scalar
    * pattern), then a shuffle-free per-row keep decision against the
    * broadcast rate table — identical cost profile to
    * [[temperatureSampled]] at any corpus size.
    */
  def matchDistribution(df: DataFrame, stratumCol: String,
                        targets: Seq[(String, Long)], key: Column,
                        seed: String = "match"): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "targets must be non-empty with positive weights")
    val w = targets.map(_._2).sum
    val weightOf = targets.foldLeft(lit(null).cast("long")) {
      case (other, (s, wt)) => when(col(stratumCol) === s, lit(wt)).otherwise(other)
    }
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_total"))
      .withColumn("tw", weightOf).filter(col("tw").isNotNull)
    // the binding stratum: feasible scaled total T = min(n_s·W div w_s).
    // n_targets rides along so a target stratum MISSING from the corpus
    // fails the require below instead of silently over-allocating
    val tRow = counts.agg(min(expr(s"n_total * ${w}L div tw")).as("t"),
      count(lit(1)).as("n_strata")).head()
    require(!tRow.isNullAt(0) && tRow.getLong(1) == targets.size.toLong,
      s"matchDistribution: ${targets.size - (if (tRow.isNullAt(0)) 0 else tRow.getLong(1))} " +
        "target strata absent from the corpus — the match is infeasible")
    val t = tRow.getLong(0)
    val rates = counts.select(col(stratumCol), col("n_total"),
      ((lit(t) * col("tw")).cast("double") /
        (lit(w) * col("n_total")).cast("double")).as("rate"))
    df.join(broadcast(rates), stratumCol)
      .filter(hashUniform(key, seed) < col("rate"))
  }

  /** Per-stratum rollup of [[matchDistribution]]:
    * `(stratum, n_total, rate, n_sampled)` — read it to check the
    * realized histogram against the target before a 100 TB run.
    */
  def matchDistributionAudit(df: DataFrame, stratumCol: String,
                             targets: Seq[(String, Long)], key: Column,
                             seed: String = "match"): DataFrame =
    matchDistribution(df, stratumCol, targets, key, seed)
      .groupBy(col(stratumCol))
      .agg(any_value(col("n_total")).as("n_total"),
        any_value(col("rate")).as("rate"),
        count(lit(1)).as("n_sampled"))

  /** Deterministic train/val/test assignment: `split` = "train" for hash
    * percentile < `trainPct`, "val" below `trainPct + valPct`, else
    * "test". The decision is [[hashPct]] of `key` — stable across runs,
    * engines, and repartitioning, and STABLE UNDER CORPUS GROWTH: a
    * document keeps its split when new data arrives (the property RNG
    * splits lack, and the reason eval contamination sneaks in when a
    * reshuffled split moves docs across the boundary). Shuffle-free.
    */
  def split(df: DataFrame, key: Column, trainPct: Int = 80, valPct: Int = 10,
            seed: String = "split"): DataFrame =
    df.withColumn("split",
      when(hashPct(key, seed) < trainPct, lit("train"))
        .when(hashPct(key, seed) < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))

  /** The per-stratum audit of [[temperatureSampled]]:
    * `(stratum, n_total, rate, n_sampled)`.
    */
  def temperatureAudit(df: DataFrame, stratumCol: String, key: Column,
                       budget: Long, seed: String = "mix"): DataFrame =
    temperatureSampled(df, stratumCol, key, budget, seed)
      .groupBy(col(stratumCol))
      .agg(any_value(col("n_total")).as("n_total"),
        any_value(col("rate")).as("rate"),
        count(lit(1)).as("n_sampled"))

  /** Weight-PROPORTIONAL deterministic sampling: exactly `k` draws per
    * stratum, row inclusion count ∝ its integer weight (token count,
    * quality score) — the importance-sampling knob of a mixture recipe,
    * RNG-free. Systematic sampling over the cumulative-weight line: rows
    * are laid out in md5(seed:key) order, and `k` equally-spaced pointers
    * sweep `[0, W)`; row i is drawn
    * `⌊C_i·k/W⌋ − ⌊(C_i−w_i)·k/W⌋ ∈ {⌊w_i·k/W⌋, ⌈w_i·k/W⌉}` times, and
    * the counts TELESCOPE to exactly k per stratum — an invariant the
    * spec asserts, which no Bernoulli scheme has. All-integer arithmetic
    * (`DIV`, never a double ratio) → bit-replayable in any engine;
    * requires `W·k < 2⁶³`. Rows with `n_draws ≥ 2` are epoch-style
    * repeats (heavy rows at small W), same semantics as [[upsample]].
    *
    * Scale shape: strata are LOW-cardinality, so a per-stratum window
    * would sort whole strata in single tasks; instead the md5-prefix
    * BUCKET carries the sort (the [[Ids.contiguous]] offset pattern):
    * per-(stratum, bucket) running sums + a broadcast 256-rows-per-
    * stratum offset table reconstruct the exact global cumulative line —
    * ordering by (bucket, md5, key) IS ordering by (md5, key) because the
    * bucket is the md5 prefix. One data shuffle (the bucket window) + one
    * map-combined aggregate.
    *
    * Output: input rows with `n_draws ≥ 1` plus the `n_draws` column.
    */
  def weightedSample(df: DataFrame, stratumCol: String, key: Column,
                     weightCol: String, k: Int, seed: String = "mix"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k=$k must be >= 1")
    val keyed = df
      .withColumn("__h", md5(concat(lit(seed + ":"), key.cast("string"))))
      .withColumn("__b", conv(substring(col("__h"), 1, 2), 16, 10).cast("int"))
    val offsets = keyed.groupBy(col(stratumCol), col("__b"))
      .agg(sum(col(weightCol)).as("__bw"))
      .withColumn("__off", coalesce(sum(col("__bw")).over(
        Window.partitionBy(stratumCol).orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__tot", sum(col("__bw")).over(
        Window.partitionBy(stratumCol)))
      .drop("__bw")
    val wnd = Window.partitionBy(col(stratumCol), col("__b"))
      .orderBy(col("__h"), key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed.join(broadcast(offsets), Seq(stratumCol, "__b"))
      .withColumn("__cum", col("__off") + sum(col(weightCol)).over(wnd))
      .withColumn("n_draws", expr(
        s"(__cum * $k) DIV __tot - ((__cum - $weightCol) * $k) DIV __tot"))
      .filter(col("n_draws") >= 1)
      .drop("__h", "__b", "__off", "__tot", "__cum")
  }

  /** PRIORITY SAMPLING (Duffield–Lund–Thorup, JACM'07): a fixed-size-k
    * weighted-without-replacement sample per stratum — each row gets
    * priority `q = w / u` with `u` uniform in (0, 1], keep the k highest
    * per stratum. High-weight rows are near-certainly kept, low-weight
    * rows survive proportionally — the subsample you want when weights
    * are token counts or quality mass and [[weightedSample]]'s
    * with-replacement draws are the wrong contract.
    *
    * Determinism: `u = (m + 1) / 2²⁴` with `m` the first 24 md5 bits of
    * the seeded key (the [[hashUniform]] stream; `+ 1` keeps u > 0), so
    * `q = (w·2²⁴) / (m + 1)` is ONE IEEE divide of two exact-in-double
    * integers — correctly rounded, hence bit-identical in any engine.
    * (`pow`/`ln` priority forms are NOT replayable — the same last-ulp
    * hazard that pins [[temperatureSampled]] to α = 0.5.) Requires
    * integer weights with `w·2²⁴ < 2⁵³`, i.e. `w < 2²⁹ ≈ 5·10⁸`.
    *
    * Scale shape: the per-stratum top-k runs on [[graft.plans.TopKPerKey]]
    * — per-partition bounded heaps, then a final k-merge per stratum —
    * never a full window sort of a 100 TB stratum. (priority DESC, key
    * ASC) is a total order, so the selected set is unique.
    */
  def prioritySample(df: DataFrame, stratumCol: String, key: Column,
                     weight: Column, k: Int, seed: String = "prio"): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val m = conv(substring(md5(concat(lit(seed + ":"), key.cast("string"))), 1, 6), 16, 10)
      .cast("long")
    val q = (weight.cast("double") * lit(16777216.0)) / (m + 1).cast("double")
    graft.plans.TopKPerKey(
      df.withColumn("priority", q),
      Seq(stratumCol),
      Seq(col("priority").desc, key.asc), k)
  }

  /** Token-budget corpus selection: walk documents in quality order
    * (score desc, id asc — a total order) and keep every document whose
    * START position in the concatenated token stream is inside `budget`
    * — "the best N-token subset", the data-selection step behind
    * quality-pruned pretraining mixes (the boundary document straddles
    * the cut exactly as in [[Chunking.pack]]).
    *
    * The naive form is `sum(tokens) OVER (ORDER BY score DESC)` — a
    * SINGLE-TASK global window. This is the two-phase prefix sum
    * instead (same shape as [[Ids.contiguous]] / [[weightedSample]]):
    * `score` must lie in [0, 1] and becomes one of `buckets` range
    * buckets (bucket 0 = best); per-bucket windows cumulate in
    * parallel, the bucket token totals prefix-sum in a buckets-row
    * window, and the broadcast offsets make every row's GLOBAL stream
    * position exact — bit-equal to the one-window answer, with no task
    * ever sorting more than one bucket.
    *
    * Bucket balance follows the score distribution (floor((1−s)·B) is
    * order-preserving, so correctness never depends on it); raise
    * `buckets` if scores concentrate. Output:
    * `(id, score, n_tokens, start_offset)` for selected documents.
    */
  def selectByBudget(docs: DataFrame, idCol: String, textCol: String,
                     score: Column, budget: Long, buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 1 && budget >= 0, s"buckets=$buckets budget=$budget")
    val scored = docs.select(col(idCol), score.as("score"),
        Text.nWords(col(textCol)).as("n_tokens"))
      .withColumn("__b", least(lit(buckets - 1), greatest(lit(0),
        floor((lit(1.0) - col("score")) * buckets).cast("int"))))
    val offsets = scored.groupBy(col("__b")).agg(sum(col("n_tokens")).as("__t"))
      .withColumn("__off", coalesce(
        sum(col("__t")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("__t")
    val w = Window.partitionBy(col("__b")).orderBy(col("score").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.join(broadcast(offsets), Seq("__b"))
      .withColumn("start_offset", col("__off") + sum(col("n_tokens")).over(w) - col("n_tokens"))
      .filter(col("start_offset") < budget)
      .select(col(idCol), col("score"), col("n_tokens"), col("start_offset"))
  }

  /** Deterministic TRAINING-ORDER interleave: the EXACT per-stratum hash
    * rank of every row, computed without ever sorting a whole stratum in
    * one task. Consumers order by `(interleave_rank, stratum)` to get
    * the round-robin source schedule training pipelines feed from (each
    * source's docs appear in a reproducible shuffled order, sources
    * alternating) — the global-sort-free form of "shuffle and interleave
    * the corpus".
    *
    * Exactness trick: the salt is the TOP bits of the same md5 the
    * within-shard sort uses, so salt order IS hash-prefix order and
    * concatenating shards by `(salt, md5, key)` equals the global
    * `(md5, key)` permutation — rank = shard-local row_number + the
    * stratum's cumulative shard offset (a strata×salts-row broadcast).
    * A plain `Window.partitionBy(stratum)` would sort entire strata in
    * single tasks (strata are LOW-cardinality); this is the exact-rank
    * generalization of the [[Skew.saltedTopK]] top-k escape.
    */
  def interleaveRanks(df: DataFrame, stratumCol: String, key: Column,
                      seed: String = "mix", salts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // salts is the per-stratum parallelism: each (stratum, salt) shard
    // sorts in one task, so size it at ~|largest stratum| / 10M rows.
    // Up to 65536 shards from the md5's top TWO bytes (a 10B-doc
    // stratum at 65536 salts is ~150k rows/task); the divisibility
    // requirement keeps the salt an exact top-bits prefix, which is
    // what makes shard concatenation equal the global hash order.
    require(salts >= 1 && 65536 % salts == 0,
      s"salts=$salts must divide 65536 (salt = top bits of the md5 first two bytes)")
    val keyed = df
      .withColumn("__h", md5(concat(lit(seed + ":"), key.cast("string"))))
      .withColumn("__salt", floor(
        conv(substring(col("__h"), 1, 4), 16, 10) / lit(65536 / salts)).cast("int"))
    val r1 = keyed.withColumn("__r", row_number().over(
      Window.partitionBy(col(stratumCol), col("__salt"))
        .orderBy(col("__h"), key)).cast("long"))
    val offs = keyed.groupBy(col(stratumCol), col("__salt"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum(col("__c")).over(Window.partitionBy(col(stratumCol))
          .orderBy(col("__salt")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("__c")
    r1.join(broadcast(offs), Seq(stratumCol, "__salt"))
      .withColumn("interleave_rank", col("__off") + col("__r"))
      .drop("__h", "__salt", "__r", "__off")
  }

  /** Cluster-balanced ("diversity") sampling: the first `m` rows per
    * cell in deterministic md5 order — the cap that keeps a dominant
    * semantic cluster from swallowing a selection budget (the
    * cluster-balanced step of published diverse-selection recipes, run
    * over [[KMeansCluster.assignCells]] output or any partition
    * column). The per-cell order is `(md5(seed:id), id)` — a
    * reproducible uniform draw, the [[hashPct]] stance — and the
    * per-cell rank comes from [[Skew.saltedTopK]] (cells are few and
    * hot; a plain window over a cell would sort a whole cell in one
    * task at 100×). Returns the input columns plus `rank` (1-based
    * within cell).
    */
  def diversitySample(assigned: DataFrame, idCol: String, cellCol: String,
                      m: Int, seed: String = "div"): DataFrame =
    Skew.saltedTopK(assigned, col(cellCol), col(idCol), m,
      Seq(md5(concat(lit(seed + ":"), col(idCol).cast("string"))), col(idCol)))

  /** Deterministic frequency-weighted CATEGORICAL draws — word2vec-style
    * negative sampling with the library's RNG-free discipline: draw `j`
    * for input row with key `k` picks the vocab entry whose cumulative
    * count bucket contains `md5₆₀(seed:k|j) mod totalCount` — an entry of
    * count `c` owns exactly `c` residues, so draws follow the unigram
    * distribution, and they are retry/repartition-invariant and exactly
    * engine-replayable (the reason this is count-weighted, not the
    * classic count^0.75: `pow` is a libm call whose last ulp differs
    * across engines; integer mass is exact everywhere).
    *
    * The cumulative vocab array rides ONE row broadcast to every input
    * row (vocab-sized, the q_vocab_coverage contract — fine for
    * categorical vocabularies, not for open domains), so each draw is a
    * pure projection: no shuffle, no join by key.
    */
  def categoricalDraws(rows: DataFrame, keyCols: Seq[String], vocab: DataFrame,
                       wordCol: String, cntCol: String, n: Int,
                       seed: String = "neg"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"n must be >= 1, got $n")
    // cum is monotone in word order, so the struct sort (word-first)
    // yields the cumulative array — same trick as the weighted walks
    val cum = vocab
      .withColumn("cum", sum(col(cntCol)).over(Window.orderBy(col(wordCol))))
      .agg(sort_array(collect_list(struct(col(wordCol).as("w"), col("cum"))))
        .as("__arr"))
    val key = concat_ws("|", (keyCols.map(c => col(c).cast("string"))
      :+ col("draw").cast("string")): _*)
    val h = conv(substring(md5(concat(lit(seed + ":"), key)), 1, 15), 16, 10)
      .cast("long")
    val total = element_at(col("__arr"), -1).getField("cum")
    rows.join(broadcast(cum))            // 1-row vocab-array attachment
      .select(col("*"), explode(array((1 to n).map(lit): _*)).as("draw"))
      .withColumn("sample",
        element_at(filter(col("__arr"), x => x.getField("cum") > h % total), 1)
          .getField("w"))
      .drop("__arr")
      .withColumn("draw", col("draw").cast("long"))
  }

  /** MIXTURE PLANNER — the token-allocation computation behind every
    * published data recipe (Pile/Gopher/LLaMA weight tables): given a
    * per-source weight vector, a token budget (a rational multiple of
    * the live corpus mass, so the plan is scale-free), and a per-source
    * epoch cap, WATERFILL the budget — proportional allocation, cap the
    * over-subscribed sources, redistribute the excess over the remaining
    * headroom in one round. Returns
    * `(source, avail, weight, requested, allocated, epochs)`.
    *
    * ALL-INTEGER arithmetic (`div` floor division; the one cross-multiply
    * that can exceed a long goes through decimal(38,0)): the plan is
    * bit-replayable in any engine — a float waterfill would make "which
    * source got the last token" partition-order-dependent. Floor crumbs
    * (≤ one token per source per stage) stay unallocated by design; the
    * single redistribution round cannot overshoot a cap: each grant is
    * CLAMPED to the source's remaining headroom (`least(grant, cap−a1)`).
    * The clamp matters at the require-boundary edge: the guard compares
    * the RATIOS budgetNum/budgetDen ≤ epochCapNum/epochCapDen, but
    * `budget = floor(tot·bn/bd)` can exceed the sum of per-source FLOORED
    * caps by up to one token per source when the ratios are equal — then
    * leftover > Σheadroom and an unclamped grant would allocate past a
    * cap (ADVICE r9 #1).
    *
    * Scale shape: one per-source aggregate, two 1-row total broadcasts
    * (the q_mix_temperature class) — the corpus shuffles once by the
    * low-cardinality stratum with map-side partials.
    */
  def planMixture(docs: DataFrame, stratumCol: String, textCol: String,
                  weights: Map[String, Long], defaultWeight: Long = 1L,
                  budgetNum: Long = 13L, budgetDen: Long = 10L,
                  epochCapNum: Long = 3L, epochCapDen: Long = 2L): DataFrame = {
    require(budgetNum * epochCapDen <= epochCapNum * budgetDen,
      "budget exceeds the epoch-capped corpus capacity — nothing to waterfill")
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0,
      "weights must be non-negative")
    val av = docs.groupBy(col(stratumCol).as("source"))
      // functions.split qualified: Mix.split (the hash splitter) shadows it
      .agg(sum(size(org.apache.spark.sql.functions.split(col(textCol), " ")))
        .cast("long").as("avail"))
    val spark = docs.sparkSession
    val wdf =
      if (weights.isEmpty) av.select(col("source")).withColumn("weight", lit(defaultWeight))
      else {
        import spark.implicits._
        weights.toSeq.toDF("source", "weight")
      }
    val withW = av.join(broadcast(wdf), Seq("source"), "left")
      .withColumn("weight", coalesce(col("weight"), lit(defaultWeight)))
    val tots = withW.agg(sum(col("avail")).as("tot"), sum(col("weight")).as("wsum"))
    val base = withW.crossJoin(broadcast(tots))
      .withColumn("budget", expr(s"tot * $budgetNum div $budgetDen"))
      .withColumn("cap", expr(s"avail * $epochCapNum div $epochCapDen"))
      .withColumn("requested", expr("budget * weight div wsum"))
      .withColumn("a1", least(col("requested"), col("cap")))
      .persistTracked() // feeds the leftover aggregate AND the projection
    val lo = base.agg(
      greatest(lit(0L), max(col("budget")) - sum(col("a1"))).as("leftover"),
      sum(col("cap") - col("a1")).as("hsum"))
    base.crossJoin(broadcast(lo))
      // div yields LONG, so the headroom clamp stays long-typed too —
      // a decimal operand would silently promote `allocated` to decimal
      .withColumn("allocated", col("a1") + when(col("hsum") > 0,
          least(expr("CAST(leftover AS DECIMAL(38,0)) * (cap - a1) div hsum"),
            col("cap") - col("a1")))
        .otherwise(lit(0L)))
      .withColumn("epochs",
        col("allocated").cast("double") / col("avail").cast("double"))
      .select(col("source"), col("avail"), col("weight"), col("requested"),
        col("allocated"), col("epochs"))
  }

  /** CONTRASTIVE training pairs from near-dup structure — the embedding-
    * model data-assembly step: POSITIVES are near-duplicate pairs (the
    * dedup pipeline's own output, so "semantically same" is whatever the
    * configured similarity says), NEGATIVES pair each anchor with corpus
    * docs from a DIFFERENT duplicate family (never an accidental
    * positive — the classic false-negative contamination in contrastive
    * batches). All picks are md5-ranked (the [[split]] convention):
    * reproducible across runs, engines, and partitionings, no RNG state.
    *
    * Returns `(anchor, other, label 'pos'|'neg', rank)`.
    *
    * Scale shape: positives are one per-anchor window over the (already
    * bounded) dup-pair relation. Negative CANDIDATES come from a hash
    * BUCKET equi-join — the corpus hashes into `n / targetCandidates`
    * buckets (one count job sizes them, the `candidatePairsAuto`
    * precedent) and each anchor probes the bucket its own hash lands in:
    * every anchor sees its own pseudo-random ~`targetCandidates`-doc
    * slice (a shared broadcast pool would hand EVERY anchor the same
    * negatives — degenerate for training at scale), candidates are
    * bounded per anchor at any corpus size, and the join is a plain
    * hash-partition equi-join — no nested loop anywhere. The family
    * check runs on `coalesce(component, id)` so un-clustered docs are
    * their own family.
    */
  def contrastivePairs(pairs: DataFrame, comp: DataFrame, universe: DataFrame,
                       idCol: String = "doc_id", targetCandidates: Long = 64L,
                       posPerAnchor: Int = 2, negPerAnchor: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def pick(tag: String, a: Column, b: Column): Column =
      md5(concat(lit(tag + ":"), a.cast("string"), lit(":"), b.cast("string")))
    def bucketOf(c: Column, nBuckets: Long): Column =
      pmod(conv(substring(md5(concat(lit("nbkt:"), c.cast("string"))), 1, 15), 16, 10)
        .cast("long"), lit(nBuckets))
    val wPos = Window.partitionBy(col("anchor")).orderBy(col("__m"), col("other"))
    val pos = pairs.select(col("id1").as("anchor"), col("id2").as("other"))
      .withColumn("__m", pick("pos", col("anchor"), col("other")))
      .withColumn("rank", row_number().over(wPos).cast("long"))
      .filter(col("rank") <= posPerAnchor)
      .select(col("anchor"), col("other"), lit("pos").as("label"), col("rank"))
    // one count job sizes the buckets so each holds ~targetCandidates docs
    val nBuckets = math.max(1L, universe.count() / math.max(1L, targetCandidates))
    val fam = comp.select(col("id"), col("component"))
    val cands = universe.select(col(idCol).as("cand"))
      .join(fam, col("cand") === col("id"), "left")
      .select(col("cand"), coalesce(col("component"), col("cand")).as("ccomp"),
        bucketOf(col("cand"), nBuckets).as("bkt"))
    val anchors = pos.select(col("anchor")).distinct()
      .join(fam, col("anchor") === col("id"), "left")
      .select(col("anchor"), coalesce(col("component"), col("anchor")).as("acomp"),
        bucketOf(col("anchor"), nBuckets).as("bkt"))
    val wNeg = Window.partitionBy(col("anchor")).orderBy(col("__m"), col("other"))
    val neg = anchors.join(cands, Seq("bkt"))
      .filter(col("acomp") =!= col("ccomp"))
      .select(col("anchor"), col("cand").as("other"))
      .withColumn("__m", pick("neg", col("anchor"), col("other")))
      .withColumn("rank", row_number().over(wNeg).cast("long"))
      .filter(col("rank") <= negPerAnchor)
      .select(col("anchor"), col("other"), lit("neg").as("label"), col("rank"))
    pos.unionByName(neg)
  }
}
