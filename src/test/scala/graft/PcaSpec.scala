package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Pca

/** Fixed-point power-iteration PCA ([[graft.pipeline.Pca]]): moments
  * exactness and recovery of a planted dominant direction.
  */
class PcaSpec extends SparkTestBase {

  import spark.implicits._

  // 8-dim vectors whose variance lives almost entirely in dim 2, with a
  // weaker independent signal in dim 5 — the planted top component is
  // the dim-2 axis
  private def vectors = {
    val rows = (0 until 40).map { k =>
      val main = if (k % 2 == 0) 10f else -10f // dominant: dim 2
      val minor = if (k % 4 < 2) 2f else -2f   // weaker: dim 5
      (k.toLong, Array(0f, 0f, main, 0f, 0f, minor, 0f, 1f))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("dimStats: constant dims have var_num 0, planted dim dominates") {
    val st = Pca.dimStats(vectors).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("var_num")).toMap
    assert(st.size === 8)
    // dims 0,1,3,4,6 are all-zero; dim 7 is constant 1 → quantized
    // constant → variance 0 as well
    Seq(0L, 1L, 3L, 4L, 6L, 7L).foreach(d => assert(st(d) === 0L, s"dim $d"))
    assert(st(2L) > st(5L) && st(5L) > 0L)
  }

  test("dimStats n*ss - s^2 matches a brute-force integer recompute") {
    val rows = Pca.dimStats(vectors).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("var_num") ===
        r.getAs[Long]("n") * r.getAs[Long]("ss") -
          r.getAs[Long]("s") * r.getAs[Long]("s"))
    }
  }

  test("topComponent recovers the planted dominant axis") {
    val x = Pca.topComponent(vectors, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(x.size === 8)
    // the dominant component carries the max-abs value 127 on dim 2 and
    // (near-)zero weight everywhere off the planted axes
    assert(math.abs(x(2L)) === 127L)
    Seq(0L, 1L, 3L, 4L, 6L).foreach(d => assert(math.abs(x(d)) <= 1L, s"dim $d"))
    assert(math.abs(x(5L)) < 127L)
  }
}
