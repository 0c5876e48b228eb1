package graft.pipeline

import graft.GraftStorage.Syntax
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-compression leg of the ANN
  * toolkit, complementing [[SimilarityLsh]] (candidate pruning by bucket)
  * and [[SimilarityIvf]] (candidate pruning by cell). PQ attacks the OTHER
  * 100 TB cost: the bytes a scan must read per vector. A d-dim float
  * vector (4d bytes) is split into `m` subvectors; each subvector is
  * replaced by the index of its nearest entry in a per-subspace codebook
  * of `k` entries — `m` small ints (m bytes at k ≤ 256) per vector, a
  * 4d/m ≈ 32× compression at d=64, m=8. Distances against a query are
  * then computed per subspace against the CODEBOOK entry the code names
  * (asymmetric distance computation, ADC): the corpus side of the scan
  * reads codes only, never embeddings.
  *
  * Everything is exact integer math over globally-scaled vectors
  * (`⌊x·2²⁰⌋` — floor of a double times a power of two is exact, so any
  * engine replays it bit-for-bit): squared-L2 distances are exact longs
  * computed by the native PQ kernels ([[graft.functions.PqEncodeExpr]] /
  * [[graft.functions.PqAdcDistExpr]] — the codebook rides inside the
  * expression, so plan size is constant at any (m, k)), argmins
  * tie-break to the lowest code, and the whole flow — encode,
  * reconstruction error, ADC top-k — is oracle-hashable with zero
  * tolerance. The codebook is FIXED (subvectors of the `k` lowest-id
  * rows), the same honesty trade as [[SimilarityIvf]]'s fixed coarse
  * quantizer: real PQ mechanics, deterministic assignment; a k-means-
  * trained codebook (the [[KMeansCluster]] integer-Lloyd trick per
  * subspace) is the production upgrade and changes no query shape.
  *
  * Scale shape: the codebook is m·k·(d/m) = k·d longs — a driver-side
  * literal compiled into the plan (exactly what FAISS ships to every
  * search node). Encode is a map-side projection (m argmins per row, no
  * shuffle, no join). ADC search is broadcast(queries) × codes scan —
  * no shuffle on the corpus side; the scan reads m bytes/vector. Compose
  * with IVF cells to prune WHICH codes are scanned.
  */
object SimilarityPq {

  /** Global quantization scale: 2²⁰. Unlike [[Embeddings.quantize]]'s
    * per-vector max-abs scale (built for scale-cancelling cosine), a
    * GLOBAL scale keeps L2 distances comparable ACROSS vectors — which is
    * what PQ codebooks quantize. Components of unit-norm vectors stay
    * ≤ 2²⁰, so an 8-dim subspace distance is ≤ 8·(2²¹)² < 2⁴⁶ — no
    * overflow anywhere near 2⁶³.
    */
  val Scale = 1048576L

  /** `(id, q: array<long>)` — the globally-scaled integer form. */
  def quantized(vectors: DataFrame, id: String = "vec_id",
                emb: String = "embedding"): DataFrame =
    vectors.select(col(id),
      transform(col(emb), x => floor(x.cast("double") * Scale).cast("long")).as("q"))

  /** The fixed codebook: per subspace `s`, the `k` lowest-id rows'
    * subvectors, code = rank in id order. Collected to the driver (k·d
    * longs, like [[KMeansCluster]]'s centroid matrix) so encode/ADC
    * compile it into the plan as literals. Returns `cb(s)(code) =
    * Array[Long]` of length `dim/m`.
    */
  def codebook(vectors: DataFrame, m: Int, k: Int, id: String = "vec_id",
               emb: String = "embedding"): IndexedSeq[IndexedSeq[Array[Long]]] = {
    val rows = quantized(vectors, id, emb)
      .filter(col(id) < k).orderBy(col(id))
      .select(col("q")).collect()
      .map(_.getSeq[Long](0).toArray)
    require(rows.length == k, s"need ids 0..${k - 1} present, got ${rows.length}")
    val dim = rows.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val ds = dim / m
    IndexedSeq.tabulate(m)(s => rows.toIndexedSeq.map(_.slice(s * ds, s * ds + ds)))
  }

  private def cbArr(cb: IndexedSeq[IndexedSeq[Array[Long]]]): Array[Array[Array[Long]]] =
    cb.map(_.toArray).toArray

  /** PQ-encode every vector: `(id, codes: array<int>, err: long)` where
    * `err` is the exact reconstruction error `Σ_s ‖v_s − cb_s[code_s]‖²`
    * — the quantity a codebook trainer minimizes, and the per-row quality
    * signal for "is m big enough". Pure map-side projection.
    */
  def encode(vectors: DataFrame, m: Int, k: Int, id: String = "vec_id",
             emb: String = "embedding"): DataFrame = {
    val cb = codebook(vectors, m, k, id, emb)
    encodeWith(quantized(vectors, id, emb), cb, id)
  }

  /** [[encode]] against a pre-collected codebook (shared by ADC so the
    * codebook job runs once). `qv` must be the [[quantized]] relation.
    * `keepQ` retains the scaled vector column alongside the codes — the
    * trainer's update pass needs both, and keeping `q` in the projection
    * beats re-joining the quantized relation (one scan, no exchange).
    *
    * The argmin battery is ONE native expression per row
    * ([[graft.functions.PqEncodeExpr]] — codebook inside the expression,
    * tie → lowest code): the equivalent composed form (m×k
    * `graft_sqdist`-vs-literal structs under `array_min`) costs the
    * optimizer a ~2000-node tree re-analyzed and re-codegen'd per
    * distinct codebook, and stops being analyzable long before a
    * production (m=16, k=256) book.
    */
  def encodeWith(qv: DataFrame, cb: IndexedSeq[IndexedSeq[Array[Long]]],
                 id: String = "vec_id", keepQ: Boolean = false): DataFrame = {
    val (encName, _) = graft.functions.PqFunctions.register(qv.sparkSession, cbArr(cb))
    val enc = qv.select(
      col(id) +: (if (keepQ) Seq(col("q")) else Nil) :+
        call_function(encName, col("q")).as("__e"): _*)
    val base = Seq(col(id), col("__e.codes").as("codes"), col("__e.err").as("err"))
    enc.select((if (keepQ) base :+ col("q") else base): _*)
  }

  /** ADC top-k: exact integer PQ distance from each query to every
    * corpus CODE vector, smallest `topK` per query (ties → lowest
    * neighbor id). The query side keeps full precision (its scaled
    * subvectors); the corpus side is codes only — `element_at` into the
    * literal codebook recovers the centroid each code names. Queries are
    * broadcast; the corpus never shuffles (the only exchange is the
    * final sketch-sized top-k rank).
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, m: Int, k: Int,
              topK: Int, id: String = "vec_id",
              emb: String = "embedding"): DataFrame =
    adcTopKWith(corpus, queries, codebook(corpus, m, k, id, emb), topK, id, emb)

  /** [[adcTopK]] against an explicit codebook (fixed or [[trainCodebook]]
    * output).
    */
  def adcTopKWith(corpus: DataFrame, queries: DataFrame,
                  cb: IndexedSeq[IndexedSeq[Array[Long]]], topK: Int,
                  id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    val (_, adcName) = graft.functions.PqFunctions.register(corpus.sparkSession, cbArr(cb))
    val enc = encodeWith(quantized(corpus, id, emb), cb, id)
      .select(col(id).as("n_id"), col("codes"))
    val qs = quantized(queries, id, emb)
      .select(col(id).as("q_id"), col("q").as("qq"))
    broadcast(qs).join(enc, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        call_function(adcName, col("qq"), col("codes")).as("dist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("dist").asc, col("n_id").asc)).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** IVF-PQ — the two prunings composed, the standard billion-scale ANN
    * architecture (FAISS's IndexIVFPQ): the coarse quantizer
    * ([[SimilarityIvf.assign]]) prunes WHICH vectors are scanned (cell
    * equi-join = the inverted-list lookup), PQ shrinks WHAT the scan
    * reads per survivor (m code bytes). Search cost ≈ corpus/numCells
    * codes per query, vs all codes for plain ADC and all embeddings for
    * brute force. Queries search their own cell (nprobe=1); distances,
    * ranks, and ties are the exact-integer ADC contract of
    * [[adcTopKWith]].
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, numCells: Int,
                m: Int, k: Int, topK: Int, id: String = "vec_id",
                emb: String = "embedding"): DataFrame = {
    val assigned = SimilarityIvf.assign(
        corpus.select(col(id).as("vec_id"), col(emb).as("embedding")), numCells)
      .select(col("vec_id"), col("cell"))
    val cb = codebook(corpus, m, k, id, emb)
    val (_, adcName) = graft.functions.PqFunctions.register(corpus.sparkSession, cbArr(cb))
    val enc = encodeWith(quantized(corpus, id, emb), cb, id)
      .withColumnRenamed(id, "n_id")
      .join(assigned.withColumnRenamed("vec_id", "n_id"), Seq("n_id"))
      .select(col("n_id"), col("cell"), col("codes"))
    val qs = quantized(queries, id, emb)
      .select(col(id).as("q_id"), col("q").as("qq"))
      .join(assigned.withColumnRenamed("vec_id", "q_id"), Seq("q_id"))
    broadcast(qs).join(enc, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        call_function(adcName, col("qq"), col("codes")).as("dist"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("dist").asc, col("n_id").asc)).cast("long"))
      .filter(col("rank") <= topK)
  }

  /** Measured RECALL of the ADC top-k against exact-integer L2 truth —
    * the PQ family's own deployed audit (r12 verdict task 2: PQ was the
    * one shipped index family without a recall row; q_ann_pq and friends
    * verify the CODES, not search quality). Truth is the exact
    * scaled-integer squared-L2 top-k over the QUANTIZED vectors — the
    * metric ADC approximates — so the number isolates pure quantization
    * loss (codebook coarseness at the chosen m, k), not a metric
    * mismatch; and because both legs are exact long arithmetic, the
    * whole audit hash-replays in any engine with zero tolerance (unlike
    * a float-cosine truth). Anchors are md5-ranked (deterministic,
    * engine-replayable); both legs cost nAnchors·n, never n² — the
    * [[SimilarityLsh.knnRecallAudit]] contract.
    */
  def adcRecallAudit(corpus: DataFrame, topK: Int, nAnchors: Int = 50,
                     m: Int = 8, k: Int = 16): DataFrame = {
    val cb = codebook(corpus, m, k)
    pqRecallAuditCore(corpus, topK, nAnchors,
      anchors => adcTopKWith(corpus, anchors, cb, topK))
  }

  /** [[adcRecallAudit]] with the TRAINED codebook ([[trainCodebook]],
    * `iters` integer-Lloyd rounds) — the PQ family's recall LEVER,
    * audited: training moves codebook entries to the data's subspace
    * means, shrinking reconstruction error and therefore ADC ranking
    * error. Read next to [[adcRecallAudit]]: the pair prices what one
    * training round buys at the same (m, k) memory budget.
    */
  def adcRecallAuditTrained(corpus: DataFrame, topK: Int, nAnchors: Int = 50,
                            m: Int = 8, k: Int = 16, iters: Int = 1): DataFrame = {
    val cb = trainCodebook(corpus, m, k, iters)
    pqRecallAuditCore(corpus, topK, nAnchors,
      anchors => adcTopKWith(corpus, anchors, cb, topK))
  }

  /** [[adcRecallAudit]] for the COMPOSED IVF-PQ index ([[ivfPqTopK]],
    * nprobe=1): same exact-integer truth, approx = own-cell ADC — so the
    * number prices BOTH losses at once: quantizer boundary misses (the
    * IVF leg, which q_ann_recall_ivf prices alone) and code coarseness
    * (the PQ leg, which [[adcRecallAudit]] prices alone). The three rows
    * together decompose where a billion-scale index's recall went, which
    * lever (nprobe / trained cells / bigger m) buys it back.
    */
  def ivfPqRecallAudit(corpus: DataFrame, topK: Int, nAnchors: Int,
                       numCells: Int, m: Int = 8, k: Int = 16): DataFrame =
    pqRecallAuditCore(corpus, topK, nAnchors,
      anchors => ivfPqTopK(corpus, anchors, numCells, m, k, topK))

  /** The audit core both PQ recall rows share: md5-picked anchors, exact
    * integer squared-L2 truth (broadcast anchors × corpus, ranked via
    * [[Skew.saltedTopK]] — anchors are few and hot), per-anchor
    * `|approx ∩ truth| / |truth|`.
    */
  private def pqRecallAuditCore(corpus: DataFrame, topK: Int, nAnchors: Int,
                                approxOf: DataFrame => DataFrame): DataFrame = {
    val anchors = corpus
      .select(col("vec_id"), col("embedding"),
        md5(concat(lit("anch:"), col("vec_id").cast("string"))).as("__m"))
      .orderBy(col("__m"), col("vec_id")).limit(nAnchors).drop("__m")
      .persistTracked() // feeds the truth broadcast AND the approx queries
    val qc = quantized(corpus).select(col("vec_id").as("n_id"), col("q").as("nq"))
    val qa = quantized(anchors).select(col("vec_id").as("q_id"), col("q").as("qq"))
    val scored = broadcast(qa).join(qc, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        graft.functions.VectorFunctions.sqDistLExpr(col("qq"), col("nq")).as("dist"))
    val truth = Skew.saltedTopK(scored, col("q_id"), col("n_id"), topK,
      order = Seq(col("dist").asc, col("n_id").asc))
    val approx = approxOf(anchors.select(col("vec_id"), col("embedding")))
      .select(col("q_id"), col("n_id").as("a_id"))
    truth
      .join(approx, truth("q_id") === approx("q_id") &&
        truth("n_id") === approx("a_id"), "left")
      .groupBy(truth("q_id").as("q_id"))
      .agg(count(lit(1)).as("n_truth"),
        sum(when(col("a_id").isNotNull, 1L).otherwise(0L)).as("n_caught"))
      .withColumn("recall",
        col("n_caught").cast("double") / col("n_truth").cast("double"))
  }

  /** Train the codebook: `iters` Lloyd rounds per subspace from the fixed
    * seed — assignment is [[encodeWith]] (a map-side argmin projection),
    * the update is ONE hash aggregate of (subspace, code) → count +
    * per-dimension long sums, i.e. m·k·(ds+1) numbers on the shuffle
    * regardless of corpus size. New entry = per-dim TRUNCATING integer
    * division `Σ/n` (Long division ≡ DuckDB's `//` — no doubles, so the
    * trained codebook is bit-replayable in SQL, the same trick as
    * [[SimilarityIvf.refineCentroids]] but float-free). Codes no vector
    * chose keep their previous entry. Like every k-means, the driver
    * carries the k·d codebook between rounds — that's the algorithm, not
    * a collect smell.
    *
    * Lloyd monotonicity survives the integer flooring up to ±ds/4 per
    * entry (each dim is off by < 1 from the true mean), so total
    * reconstruction error is non-increasing in practice; the spec asserts
    * trained ≤ fixed on random data.
    */
  def trainCodebook(vectors: DataFrame, m: Int, k: Int, iters: Int = 1,
                    id: String = "vec_id",
                    emb: String = "embedding"): IndexedSeq[IndexedSeq[Array[Long]]] = {
    require(iters >= 0, s"iters=$iters must be >= 0")
    val qv = quantized(vectors, id, emb)
      .persistTracked()
    try {
      var cb = codebook(vectors, m, k, id, emb)
      val ds = cb.head.head.length
      for (_ <- 1 to iters) {
        // (s, code) → n + per-dim sums, one row per populated cell;
        // keepQ carries the vector through the encode projection so the
        // update is agg-over-scan, never a self-join of the corpus
        val stats = encodeWith(qv, cb, id, keepQ = true)
          .select(posexplode(col("codes")).as(Seq("s", "code")), col("q"))
          .groupBy(col("s"), col("code"))
          .agg(count(lit(1)).as("n"),
            (0 until ds).map(j =>
              sum(element_at(col("q"), col("s") * ds + j + 1)).as(s"s$j")): _*)
          .collect()
        val updated = stats.map { r =>
          val n = r.getAs[Long]("n")
          (r.getAs[Int]("s"), r.getAs[Int]("code")) ->
            Array.tabulate(ds)(j => r.getAs[Long](s"s$j") / n)
        }.toMap
        cb = IndexedSeq.tabulate(m)(s =>
          IndexedSeq.tabulate(k)(c => updated.getOrElse((s, c), cb(s)(c))))
      }
      cb
    } finally qv.unpersist()
  }
}
