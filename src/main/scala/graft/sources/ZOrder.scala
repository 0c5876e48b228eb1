package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two
  * clustering columns so that range-partitioning + sorting on the single
  * z-value co-locates rows that are close in BOTH dimensions. Files then
  * carry tight parquet min/max ranges on both columns, and scans
  * filtering on either (or both) prune most files — the multi-dimension
  * data-skipping layout Delta/Iceberg expose as `OPTIMIZE ZORDER BY`,
  * here as a plain write-side transform (public curve, public idea —
  * Morton 1966).
  *
  * The code is pure codegen'd bit arithmetic per row; the only exchange
  * is the final range partitioner, which any bulk write needs anyway.
  */
object ZOrder {

  /** Morton code of the low `bits` bits of two non-negative columns —
    * `a`'s bits land in even positions, `b`'s in odd. `2·bits ≤ 62`.
    */
  def morton(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Lay `df` out in `numFiles` z-ordered range partitions, sorted within
    * each — ready for a parquet write whose files carry tight min/max on
    * both clustering columns.
    */
  def layout(df: DataFrame, a: String, b: String, bits: Int, numFiles: Int): DataFrame =
    df.withColumn("z", morton(col(a), col(b), bits))
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions("z")
}
