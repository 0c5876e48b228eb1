package graft

import graft.pipeline.Embeddings
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends SparkTestBase {
  import spark.implicits._

  test("quantizeInt8: max-abs symmetric quantization, round-half-up") {
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)))   // all-zero → scale 0, zero qvec
      .toDF("vec_id", "embedding")
    val got = Embeddings.quantizeInt8(df).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    assert(got(1L) === ((127.0, "127,-63,0")))  // floor(-63.5 + 0.5) = -63
    assert(got(2L) === ((0.0, "0,0,0")))
  }

  test("quantized cosine approximates full-precision cosine (int8 search path)") {
    import graft.pipeline.{Embeddings, Similarity}
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 40L).map(i => (i, Array.fill(64)(rnd.nextFloat() * 2f - 1f).toSeq))
    val df = vecs.toDF("vec_id", "embedding")
    val q = Embeddings.quantize(df)
    val pairs = df.as("a").join(df.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
    val qpairs = q.as("a").join(q.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        Similarity.cosine(col("a.q"), col("b.q")).as("qcos"))
    val joined = pairs.join(qpairs, Seq("i", "j")).collect()
      .map(r => (r.getDouble(2), r.getDouble(3)))
    assert(joined.nonEmpty)
    // int8 over 64 dims: quantization noise stays well under 0.02 cosine
    joined.foreach { case (c, qc) => assert(math.abs(c - qc) < 0.02, s"$c vs $qc") }
  }

  test("quantizeInt8: values stay in [-127, 127]; dequant error ≤ 0.5/scale") {
    val vecs = Seq(
      (1L, Seq(0.3f, -0.9f, 0.0041f, 0.77f)),
      (2L, Seq(-123.45f, 0.001f, 99.9f, -0.5f)),
      (3L, Seq(1e-8f, -1e-8f, 5e-9f, 0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val rows = Embeddings.quantizeInt8(df).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2).split(',').map(_.toLong))))
      .toMap
    for ((id, emb) <- vecs) {
      val (scale, q) = rows(id)
      assert(q.forall(v => v >= -127 && v <= 127))
      emb.zip(q).foreach { case (x, qi) =>
        assert(math.abs(qi / scale - x) <= 0.5 / scale + 1e-12)
      }
    }
  }
}
