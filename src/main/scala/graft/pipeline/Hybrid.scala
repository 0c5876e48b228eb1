package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse a DENSE ranking (embedding cosine) with a
  * LEXICAL ranking (n-gram shingle overlap) by reciprocal-rank fusion
  * (Cormack/Clarke/Buettcher, SIGIR'09 — public literature):
  *
  *   rrf(d) = 1/(k0 + rank_dense(d)) + 1/(k0 + rank_lex(d))
  *
  * the production RAG-retrieval shape: dense recall catches paraphrase,
  * lexical recall catches rare exact terms, and RRF needs no score
  * calibration between the two systems because it consumes only RANKS.
  *
  * Determinism contract: ranks are integers from total-ordered windows
  * (score desc, id), `1/(k0+rank)` is one correctly-rounded IEEE divide,
  * and the two-term sum is a fixed evaluation tree — bit-replayable by
  * the oracle. Missing-from-one-list contributes exactly 0.
  *
  * Scale shape: the seed (query) set is FIXED-size and broadcast on both
  * arms — dense scoring is broadcast-seeds × streamed-corpus (swap in the
  * IVF/LSH candidate generators for a large query load), lexical overlap
  * is broadcast-seed-shingles × the corpus shingle relation — so the
  * corpus never self-joins and never shuffles whole. Per-seed top-k
  * windows partition on the seed id; the fusion join carries ≤ 2·topK
  * rows per seed.
  */
object Hybrid {

  def rrfRetrieve(docs: DataFrame, embeddings: DataFrame,
                  numSeeds: Int = 8, topK: Int = 10, n: Int = 3, k0: Int = 60,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // dense arm: unit-normalized doubles, seeds broadcast, cosine = dot
    val dbl = col("embedding").cast("array<double>")
    val ne = embeddings.select(col("vec_id"), dbl.as("d"))
      .withColumn("nv", sqrt(graft.functions.VectorFunctions.dot(col("d"), col("d"))))
      .select(col("vec_id"), transform(col("d"), x => x / col("nv")).as("ne"))
    val dseeds = ne.filter(col("vec_id") < numSeeds)
      .select(col("vec_id").as("q_id"), col("ne").as("qe"))
    val wD = Window.partitionBy("q_id").orderBy(col("cos").desc, col("id"))
    val dense = broadcast(dseeds).join(ne, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("id"),
        graft.functions.VectorFunctions.dot(col("qe"), col("ne")).as("cos"))
      .withColumn("rd", row_number().over(wD).cast("long"))
      .filter(col("rd") <= topK)
      .select(col("q_id"), col("id"), col("rd"))
    // lexical arm: shared-shingle counts against the broadcast seed shingles
    val sh = Dedup.docShingles(docs, idCol, textCol, n)
    val qsh = sh.filter(col("id") < numSeeds).select(col("id").as("q_id"), col("sh"))
    val wL = Window.partitionBy("q_id").orderBy(col("overlap").desc, col("id"))
    val lex = broadcast(qsh).join(sh, "sh").filter(col("q_id") =!= col("id"))
      .groupBy("q_id", "id").agg(count(lit(1)).as("overlap"))
      .withColumn("rl", row_number().over(wL).cast("long"))
      .filter(col("rl") <= topK)
      .select(col("q_id"), col("id"), col("rl"))
    // fusion: full outer on (q_id, id); absent rank contributes 0
    val wF = Window.partitionBy("q_id").orderBy(col("rrf").desc, col("id"))
    dense.join(lex, Seq("q_id", "id"), "full_outer")
      .select(col("q_id"), col("id"),
        (coalesce(lit(1.0) / (lit(k0.toDouble) + col("rd").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0.toDouble) + col("rl").cast("double")), lit(0.0))).as("rrf"))
      .withColumn("rank", row_number().over(wF).cast("long"))
      .filter(col("rank") <= topK)
  }
}
