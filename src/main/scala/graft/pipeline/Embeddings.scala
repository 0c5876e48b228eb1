package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column storage transforms: the compression step between
  * "embeddings computed" and "embeddings served/stored" in a training-data
  * pipeline. At 100 TB of float32 vectors, int8 quantization is a 4×
  * storage/IO cut that the ANN candidate-generation stages barely notice —
  * quantize at ingest, keep full precision only for the final re-rank.
  *
  * Everything here is a per-row projection over array columns — no shuffle,
  * no UDF: `transform`/`array_max`/`floor` all stay inside whole-stage
  * codegen, so quantization streams through the scan at whatever
  * parallelism the source has.
  *
  * Determinism (the driver hash-compares against a DuckDB replay):
  * float→double casts are exact; the scale `127.0 / maxabs` is one IEEE
  * division; `floor(x * scale + 0.5)` is round-half-up in exact double
  * arithmetic — bit-identical in any engine, unlike `round()` whose
  * half-way tie rule differs across SQL dialects.
  */
object Embeddings {

  // codegen'd array Cast, not an interpreted transform lambda (see
  // Similarity.toDouble): identical element-wise float → double widening
  private def toDouble(a: Column): Column = a.cast("array<double>")

  /** Symmetric max-abs int8 quantization: per vector,
    * `scale = 127 / max|x_i|` and `q_i = floor(x_i·scale + 0.5)` ∈
    * [-127, 127]. Returns `(id, scale, q)` with `q` an array of
    * integer-valued doubles (exact, so downstream dot products stay inside
    * the same codegen'd vector expressions the float path uses — and
    * cosine over `q` needs no dequantization at all: the scales cancel).
    * Dequantization is `q_i / scale`; max error per component is
    * `0.5/scale`. All-zero vectors get `scale = 0` and an all-zero q (the
    * consumer treats scale 0 as "null embedding").
    */
  def quantize(df: DataFrame, id: String = "vec_id",
               emb: String = "embedding"): DataFrame = {
    val e = toDouble(col(emb))
    val maxabs = array_max(transform(e, x => abs(x)))
    val scale = when(maxabs > 0d, lit(127.0) / maxabs).otherwise(lit(0.0))
    df.select(col(id), scale.as("scale"), e.as("e"))
      .select(col(id), col("scale"),
        transform(col("e"),
          x => floor(x * col("scale") + lit(0.5)).cast("double")).as("q"))
  }

  /** [[quantize]] with the q-vector serialized as a comma-joined string —
    * the catalog's array canonicalization (positional, NOT sorted).
    */
  def quantizeInt8(df: DataFrame, id: String = "vec_id",
                   emb: String = "embedding"): DataFrame =
    quantize(df, id, emb).select(col(id), col("scale"),
      concat_ws(",", transform(col("q"),
        x => x.cast("long").cast("string"))).as("qvec"))
}
