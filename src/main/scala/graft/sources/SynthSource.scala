package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A full custom DataSource V2 connector: a deterministic synthetic
  * document-id stream with REAL filter pushdown and column pruning —
  * the connector-side twin of the repo's other Catalyst extension
  * tiers (custom expressions in `functions/`, the optimizer rule in
  * `plans/BandJoinRewrite`, the physical operator in
  * `plans/TopKPerKey`). Rows are a pure function of the id, so the
  * DuckDB oracle replays the whole "table" from `range()`:
  *
  *   id   BIGINT  — 0 until `rows`
  *   grp  BIGINT  — id % 20
  *   v    BIGINT  — first 60 bits of md5(id) (the catalog's md5-prefix
  *                  integer convention)
  *
  * Read path mechanics, each the real protocol (not a stub):
  *   - `pruneColumns`: the reader materializes ONLY the requested
  *     fields — an unused `v` means md5 is never computed (the analogue
  *     of a parquet scan skipping a column's pages).
  *   - `pushFilters`: comparisons and IN-lists on `id`/`grp` are
  *     ACCEPTED (evaluated inside the generator loop; accepted v2
  *     filters are NOT re-evaluated by Spark, so the source must apply
  *     them) — everything else stays a Spark-side residual. Filters on
  *     `id` additionally CLAMP each partition's range, the moral
  *     equivalent of partition pruning.
  *   - `planInputPartitions`: `numPartitions` contiguous id ranges —
  *     split generation, not a single-task stream.
  *
  * Options: `rows` (default 1000), `numPartitions` (default 4).
  * Usage: `spark.read.format("graft.sources.SynthSource")
  *   .option("rows", n).load()`.
  */
class SynthSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  // service-loader registration (META-INF/services) → `.format("graft-synth")`
  override def shortName(): String = "graft-synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // properties arrive CASE-SENSITIVE here (unlike inferSchema's map) —
    // rewrap, or `.option("numPartitions", …)` silently misses
    val opts = new CaseInsensitiveStringMap(properties)
    new SynthTable(opts.getLong("rows", 1000L), opts.getInt("numpartitions", 4))
  }
}

object SynthSource {
  val Schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  /** First 60 bits of md5 of the DECIMAL string of id — matches DuckDB's
    * `CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 15)) AS BIGINT)`
    * and the Spark-expression convention used across the catalog.
    */
  def mdPrefix(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }
}

private[sources] class SynthTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"synth($rows)"
  override def schema(): StructType = SynthSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts)
}

private[sources] class SynthScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = SynthSource.Schema
  private var pushed: Array[Filter] = Array.empty

  private def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _: Long)            => a == "id" || a == "grp"
    case GreaterThan(a, _: Long)        => a == "id" || a == "grp"
    case GreaterThanOrEqual(a, _: Long) => a == "id" || a == "grp"
    case LessThan(a, _: Long)           => a == "id" || a == "grp"
    case LessThanOrEqual(a, _: Long)    => a == "id" || a == "grp"
    case In(a, vs)                      => (a == "id" || a == "grp") &&
      vs.forall(_.isInstanceOf[Long])
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accept, residual) = filters.partition(supported)
    pushed = accept
    residual // Spark evaluates these; accepted ones are on the source
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SynthScan(rows, parts, required, pushed)
}

// public: PlanAudit-style specs inspect `pushed`/`planInputPartitions`
class SynthScan(rows: Long, parts: Int, required: StructType,
                val pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SynthScan(rows=$rows, cols=${required.fieldNames.mkString(",")}, " +
      s"pushed=${pushed.mkString("[", ",", "]")})"

  override def planInputPartitions(): Array[InputPartition] = {
    // id-filter pushdown CLAMPS the generated ranges — the partition-
    // pruning analogue: a `id >= N` probe skips whole partitions
    var lo = 0L
    var hi = rows // exclusive
    pushed.foreach {
      case GreaterThan("id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long)    => hi = math.min(hi, v + 1)
      case EqualTo("id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _                                 => ()
    }
    if (lo >= hi) return Array.empty
    val n = hi - lo
    val per = (n + parts - 1) / parts
    (0 until parts).iterator
      .map(i => (lo + i * per, math.min(lo + (i + 1) * per, hi)))
      .filter { case (a, b) => a < b }
      .map { case (a, b) => SynthRange(a, b): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required, pushed)
}

case class SynthRange(lo: Long, hi: Long) extends InputPartition

private[sources] class SynthReaderFactory(required: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SynthRange]
    new SynthReader(r.lo, r.hi, required, pushed)
  }
}

private[sources] class SynthReader(lo: Long, hi: Long, required: StructType,
                                   pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private var cur = lo - 1

  private def keep(id: Long): Boolean = {
    val grp = id % 20
    def v(attr: String): Long = if (attr == "id") id else grp
    pushed.forall {
      case EqualTo(a, x: Long)            => v(a) == x
      case GreaterThan(a, x: Long)        => v(a) > x
      case GreaterThanOrEqual(a, x: Long) => v(a) >= x
      case LessThan(a, x: Long)           => v(a) < x
      case LessThanOrEqual(a, x: Long)    => v(a) <= x
      case In(a, vs)                      => vs.exists(_.asInstanceOf[Long] == v(a))
      case _                              => true
    }
  }

  override def next(): Boolean = {
    cur += 1
    while (cur < hi && !keep(cur)) cur += 1
    cur < hi
  }

  override def get(): InternalRow = {
    val vals = required.fieldNames.map {
      case "id"  => cur
      case "grp" => cur % 20
      case "v"   => SynthSource.mdPrefix(cur) // only computed when projected
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = ()
}
