package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: a naive band-join predicate
  * `abs(l.x − r.x) <= w` (or `<`) on an INNER join is rewritten into the
  * bucketed form [[graft.ops.BandJoin]] applies by hand — the left side
  * gains its `floor(x/w)` width-cell, the right side explodes to
  * `cell ± 1`, and the cells become an extra EQUI key. Catalyst's
  * `ExtractEquiJoinKeys` then sees a hashable key where the raw plan had
  * none (or only a low-cardinality one) and plans a shuffled hash/merge
  * join instead of BroadcastNestedLoopJoin — the rewrite every band join
  * needs at scale, applied even when the user writes the textbook theta
  * join. (Stock Spark has no range-join strategy; the equivalent hint
  * exists only in Databricks' fork.)
  *
  * Correctness: any pair within `w` lies in the same or adjacent cells,
  * so the cell equi-join plus the ORIGINAL band predicate (kept as a
  * residual) selects exactly the true pairs; the non-replicated side has
  * a unique home cell, so each pair survives exactly once. Null x on
  * either side fails both the cell equality and the band predicate —
  * semantics unchanged.
  *
  * The match is deliberately narrow: inner joins, plain `DoubleType`
  * attributes on each side, a positive double literal width. The
  * replicated side's projection is not re-pruned (user rules run after
  * the pruning batches) — a 3× wider exchange on one side, which is the
  * rewrite's cost anyway.
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  private val CellName = "graft_band_cell"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** `(leftX, rightX, w)` for `abs(a − b) <= w` style conjuncts, sides
    * normalized against the given join children.
    */
  private def bandOf(e: Expression, left: LogicalPlan,
                     right: LogicalPlan): Option[(Attribute, Attribute, Double)] = {
    val ab = e match {
      case LessThanOrEqual(Abs(Subtract(a: Attribute, b: Attribute, _), _),
        Literal(w: Double, DoubleType)) if w > 0 => Some((a, b, w))
      case LessThan(Abs(Subtract(a: Attribute, b: Attribute, _), _),
        Literal(w: Double, DoubleType)) if w > 0 => Some((a, b, w))
      case _ => None
    }
    ab.collect {
      case (a, b, w) if a.dataType == DoubleType && b.dataType == DoubleType &&
        left.outputSet.contains(a) && right.outputSet.contains(b) => (a, b, w)
      case (a, b, w) if a.dataType == DoubleType && b.dataType == DoubleType &&
        left.outputSet.contains(b) && right.outputSet.contains(a) => (b, a, w)
    }
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        // marker guard: user batches run to fixed point — don't re-rewrite
        if !left.output.exists(_.name == CellName) =>
      conjuncts(cond).flatMap(bandOf(_, left, right)).headOption match {
        case None => j
        case Some((lx, rx, w)) =>
          val wLit = Literal(w)
          // floor(double) is LongType — an exact integer cell id
          val lCell = Alias(Floor(Divide(lx, wLit)), CellName)()
          val newLeft = Project(left.output :+ lCell, left)

          val rCell = Floor(Divide(rx, wLit))
          val cells = CreateArray(Seq(
            Subtract(rCell, Literal(1L)), rCell, Add(rCell, Literal(1L))))
          val genOut = AttributeReference(s"${CellName}_r", LongType)()
          val newRight =
            Generate(Explode(cells), Nil, outer = false, None, Seq(genOut), right)

          val newCond = And(EqualTo(lCell.toAttribute, genOut), cond)
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), hint))
      }
  }
}
