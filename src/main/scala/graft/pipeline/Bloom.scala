package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter as a broadcastable relation — the join-pruning
  * pattern for 100 TB semi-joins: aggregate the (small) build side's keys
  * into a fixed-size bitmap ONCE, broadcast that single row, and test
  * membership on the probe side as a pure projection. The probe never
  * shuffles, never sees the build table, and reads only the key column.
  *
  * Unlike Spark's built-in `DataFrameStatFunctions.bloomFilter` (a
  * driver-side `BloomFilter` object) or the AQE runtime bloom rewrite, the
  * bitmap here is a DataFrame value: md5-derived bit positions packed into
  * an `array<long>`, so it survives checkpointing, can be persisted/reused
  * across queries, and — because md5 is engine-independent — the whole
  * filter is replayable by the DuckDB oracle bit-for-bit.
  *
  * Guarantees the classic contract: NO false negatives (every true member
  * passes), measurable false-positive rate ≈ (1 - e^{-kn/m})^k.
  */
object Bloom {

  /** The k md5-derived bit positions of `key` in an m-bit filter. Each
    * position hashes a distinct salt prefix (`"i:"`), the same trick as
    * [[Sketches]]' CMS rows, so the k hashes are independent and both
    * engines derive identical positions from the string form of the key.
    */
  def positions(key: Column, k: Int, m: Int): Seq[Column] =
    (0 until k).map { i =>
      conv(substring(md5(concat(lit(s"$i:"), key.cast("string"))), 1, 6), 16, 10)
        .cast("long") % m
    }

  /** Build the filter: ONE row, column `bloom: array<long>` of m/64 packed
    * words. The only shuffle is the build side's positions → ≤ m/64 groups;
    * the final single-row pack aggregates at most m/64 entries. At 100 TB
    * the build side is the small/filtered dimension, so this is cheap; the
    * result is bytes-sized (m=8192 → 1 KiB) and broadcast-friendly.
    */
  def build(keys: DataFrame, key: Column, k: Int = 3, m: Int = 8192): DataFrame = {
    require(m % 64 == 0, s"m must pack into 64-bit words, got $m")
    val words = m / 64
    keys
      .select(explode(array(positions(key, k, m): _*)).as("pos"))
      .select(floor(col("pos") / 64).cast("int").as("w"),
        (col("pos") % 64).cast("int").as("b"))
      .groupBy("w")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").as("bits"))
      .agg(map_from_entries(collect_list(struct(col("w"), col("bits")))).as("e"))
      .select(transform(sequence(lit(0), lit(words - 1)),
        i => coalesce(element_at(col("e"), i.cast("int")), lit(0L))).as("bloom"))
  }

  /** Membership test against a packed `bloom` array column: all k bit
    * positions set. Pure codegen'd projection — `shiftrightunsigned` keeps
    * the top-bit word correct.
    */
  def mightContain(bloom: Column, key: Column, k: Int = 3, m: Int = 8192): Column =
    positions(key, k, m).map { p =>
      val word = element_at(bloom, (floor(p / 64) + 1).cast("int"))
      call_function("shiftrightunsigned", word, (p % 64).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)

  /** The full pruning flow: tag each distinct probe key with its bloom
    * verdict. Plan shape: probe → distinct → cross-join the broadcast
    * 1-row bitmap → projection. At 100 TB, follow with
    * `.filter(col("bloom_hit") === 1L)` BEFORE the real join — the filter
    * removes (1-FP) of the non-matching probe rows without shuffling the
    * build table next to them.
    */
  def tagProbe(probe: DataFrame, key: Column, bloom: DataFrame,
               k: Int = 3, m: Int = 8192): DataFrame =
    probe.crossJoin(broadcast(bloom))
      .select(probe.columns.map(col) :+
        mightContain(col("bloom"), key, k, m).cast("long").as("bloom_hit"): _*)
}
