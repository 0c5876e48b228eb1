package graft

import graft.pipeline.Bloom
import org.apache.spark.sql.functions._

class BloomSpec extends SparkTestBase {
  import spark.implicits._

  test("no false negatives: every built key passes the membership test") {
    val keys = (1L to 500L).map(_ * 7919).toDF("k")
    val bloom = Bloom.build(keys, col("k"))
    val tagged = Bloom.tagProbe(keys, col("k"), bloom)
    assert(tagged.filter(col("bloom_hit") === 0L).count() === 0)
  }

  test("false-positive rate on non-members is small but nonzero-capable") {
    val members = (1L to 200L).toDF("k")
    val bloom = Bloom.build(members, col("k"))
    val nonMembers = (100000L to 101999L).toDF("k")
    val fp = Bloom.tagProbe(nonMembers, col("k"), bloom)
      .filter(col("bloom_hit") === 1L).count()
    // m=8192, k=3, n=200 → theoretical FP ≈ (1-e^(-600/8192))^3 ≈ 3.5e-4;
    // allow an order of magnitude of slack on 2000 probes
    assert(fp <= 20, s"false-positive count $fp is far above the design rate")
  }

  test("bitmap is a single fixed-width row, independent of build size") {
    val bloom = Bloom.build((1L to 1000L).toDF("k"), col("k"), k = 3, m = 1024)
    val rows = bloom.collect()
    assert(rows.length === 1)
    assert(rows.head.getSeq[Long](0).length === 1024 / 64)
  }

  test("positions are stable md5 derivations (replayable by the oracle)") {
    val p = spark.range(1).select(Bloom.positions(lit(42L), k = 3, m = 8192): _*)
      .collect().head
    // pinned values: CAST(concat('0x', substr(md5('i:42'),1,6)) AS BIGINT) % 8192
    val expected = (0 until 3).map { i =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:42".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 6)
      java.lang.Long.parseLong(hex, 16) % 8192
    }
    assert((0 until 3).map(p.getLong) === expected)
  }
}
