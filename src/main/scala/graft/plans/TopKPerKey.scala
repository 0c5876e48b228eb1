package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: top-k rows per key, with PARTIAL pruning
  * before the shuffle via bounded per-key HEAPS. Spark ≥ 3.5 partially
  * covers this pattern natively: `InferWindowGroupLimit` plants a
  * Partial `WindowGroupLimit` under the exchange for
  * `filter(row_number().over(...) <= k)`, so the shuffle volume is
  * already ≤ k rows per (key, partition) there too. What the stock
  * rewrite CANNOT drop is the sort: `WindowGroupLimit` requires sorted
  * input, so every input partition is FULLY sorted (O(n log n) + a
  * partition-sized sort buffer) before the limit, and the merged side is
  * fully sorted again for the Final pass + Window. This operator keeps a
  * bounded heap per key instead — O(n log k) per partition, memory
  * bounded by k·|keys-per-partition| rows, no partition-wide sort buffer
  * on either side of the exchange — the same partial/final split as hash
  * aggregation, applied to top-k. On a 100 TB fact table the shuffle is
  * the same as stock; the scan-side sort it deletes is the remaining
  * cost that matters.
  *
  * The pieces, wired the way Spark wants whole operators delivered:
  * [[TopKPerKeyNode]] (logical, analysis-visible), [[TopKPerKeyStrategy]]
  * (planner: logical → Partial + Final physical pair; the exchange
  * appears automatically because Final DECLARES
  * `ClusteredDistribution(keys)` and EnsureRequirements inserts the
  * shuffle), and [[TopKPerKeyExec]] (execution: per-partition bounded
  * heaps over UnsafeRows). Registered via
  * `GraftExtensions.injectPlannerStrategy` / `experimental.extraStrategies`.
  *
  * Ties: `order` must be a TOTAL order (extend it with a unique id) —
  * with ties at rank k the kept row would otherwise be partition-order
  * dependent. The operator is exact for total orders, like every
  * deterministic top-k.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, "k must be >= 1")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // the Final pass declares the clustered requirement; EnsureRequirements
  // plants the exchange between Partial and Final
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  // the heaps neither move nor re-key rows, so the child's partitioning
  // survives (r14): declaring it lets a downstream operator clustered on
  // the same keys — e.g. the rank window that re-attaches `rank` after a
  // TopKPerKey prune — REUSE the Final pass's exchange instead of adding
  // its own (the default UnknownPartitioning forced a second shuffle of
  // the already-pruned rows)
  override def outputPartitioning:
      org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  /** Per-task bound on the PARTIAL pass's hash state, in distinct keys
    * (r14): the sort this operator replaces could SPILL; a heap map
    * cannot, so it must be bounded by construction. When a new key would
    * exceed the bound the accumulated per-key top-ks are FLUSHED
    * downstream and the map restarts on a fresh segment — correctness is
    * the same containment argument as partial/final itself (a segment is
    * just a finer input partition: a row dropped in its segment has ≥ k
    * same-key rows ordering before it there, hence ≥ k globally). Only
    * the partial pass flushes: the Final pass must see every surviving
    * row of a key to be exact, and its input is already pruned to
    * ≤ k·upstream-partitions rows per key, so its state is input-sized.
    * At the default, state is ≤ ~maxKeys·k rows (tens of MB at k ≤ 50).
    */
  private[plans] val MaxPartialKeys: Int =
    java.lang.Integer.getInteger("spark.graft.topk.maxPartialKeys", 1 << 17)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortExprs = order
    val childOutput = child.output
    val kk = k
    val maxKeys = if (partial) math.max(1, MaxPartialKeys) else Int.MaxValue
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(
        BindReferences.bindReferences(keyExprs, childOutput))
      // heap root = WORST kept row; evict it when a better row arrives
      val rowOrd = new LazilyGeneratedOrdering(
        BindReferences.bindReferences(sortExprs, childOutput))
      new Iterator[InternalRow] {
        private val heaps =
          new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
        private var pending: UnsafeRow = null // row that triggered a flush
        private var drain: Iterator[InternalRow] = Iterator.empty

        private def offer(heap: java.util.PriorityQueue[UnsafeRow],
                          row: InternalRow): Unit = {
          if (heap.size < kk) {
            heap.add(row.asInstanceOf[UnsafeRow].copy())
          } else if (rowOrd.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(row.asInstanceOf[UnsafeRow].copy())
          }
        }
        // false = row carries a NEW key and the map is at capacity
        private def insert(row: InternalRow): Boolean = {
          val key = keyProj(row)
          var heap = heaps.get(key)
          if (heap == null) {
            if (heaps.size >= maxKeys) return false
            heap = new java.util.PriorityQueue[UnsafeRow](kk, rowOrd.reverse)
            heaps.put(key.copy(), heap)
          }
          offer(heap, row)
          true
        }
        private def fill(): Unit = {
          if (drain.hasNext) return
          if (pending == null && !iter.hasNext) return
          if (pending != null) { insert(pending); pending = null } // fresh map
          var flushed = false
          while (!flushed && iter.hasNext) {
            val row = iter.next()
            if (!insert(row)) {
              pending = row.asInstanceOf[UnsafeRow].copy()
              flushed = true
            }
          }
          if (!heaps.isEmpty) {
            val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
            heaps.values().forEach { h => h.forEach { r => out += r } }
            heaps.clear()
            drain = out.iterator
          }
        }
        override def hasNext: Boolean = { fill(); drain.hasNext }
        override def next(): InternalRow = { fill(); drain.next() }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {
  /** Top-k rows of `df` per `keyCols` group under `orderCols` (`.asc` /
    * `.desc` Columns or plain expressions, defaulting ascending — "top"
    * is whatever sorts FIRST; `orderCols` must be a total order).
    * Returns the rows themselves, un-ranked.
    */
  /** [[apply]] with Column keys — for callers whose key is an expression
    * rather than a named column (e.g. [[graft.pipeline.Skew.saltedTopK]]).
    */
  def byCols(df: org.apache.spark.sql.DataFrame,
             keyCols: Seq[org.apache.spark.sql.Column],
             orderCols: Seq[org.apache.spark.sql.Column], k: Int)
  : org.apache.spark.sql.DataFrame =
    build(df, keyCols.map(org.apache.spark.sql.classic.GraftPlanBridge.expr),
      orderCols, k)

  def apply(df: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
            orderCols: Seq[org.apache.spark.sql.Column], k: Int)
  : org.apache.spark.sql.DataFrame =
    build(df,
      keyCols.map(org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted),
      orderCols, k)

  private def build(df: org.apache.spark.sql.DataFrame, keyExprs0: Seq[Expression],
                    orderCols: Seq[org.apache.spark.sql.Column], k: Int)
  : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // idempotent self-registration (r14): library entry points now build
    // TopKPerKeyNode plans on sessions that may not have gone through
    // VectorFunctions.register / GraftExtensions — without the strategy
    // the node simply fails to plan
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val analyzed = df.queryExecution.analyzed
    def byName(n: String): Expression =
      analyzed.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${analyzed.output}"))
    def resolve(e: Expression): Expression = e.transformUp {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => byName(u.name)
    }
    val keyExprs: Seq[Expression] = keyExprs0.map(resolve)
    val sortOrders = orderCols.map { c =>
      resolve(org.apache.spark.sql.classic.GraftPlanBridge.expr(c)) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark,
      TopKPerKeyNode(keyExprs, sortOrders, k, analyzed))
  }
}
