package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule (SURVEY.md §2b "custom operators", the `Rule
  * [LogicalPlan]` leg): rewrites the idiomatic per-group top-k pattern
  *
  *   Filter(rn <= k, Window([row_number() AS rn], partitionBy, orderBy))
  *
  * into [[GroupTopKNode]], so EVERY query written the standard way gets
  * the heap-based two-phase physical plan (no full-partition sorts —
  * see the [[GroupTopKNode]] scaladoc for the comparison against
  * Spark's own sort-based WindowGroupLimit) without opting into the
  * [[GroupTopK.topKPerGroup]] API. The rank column stays available:
  * the rewritten node re-emits it under the ORIGINAL exprId, so
  * downstream projections that select the rank resolve unchanged.
  *
  * Scope is deliberately narrow — the rewrite fires only when ALL hold:
  *  - the Window computes EXACTLY ONE expression, a bare `row_number()`
  *    (rank/dense_rank admit ties, which a k-bounded heap cannot
  *    reproduce). A CAST over the rank still rewrites: Spark's own
  *    UnwrapCastInBinaryComparison + filter pushdown normalize
  *    `cast(rn) <= 4L` back to the bare pattern before user rules run;
  *  - the window is partitioned AND ordered with the standard
  *    row_number frame (ROWS UNBOUNDED PRECEDING..CURRENT ROW);
  *  - the filter bounds that rank from above by an integer literal
  *    (`<= k`, `< k`, `= 1`, and the flipped forms). Other conjuncts
  *    are preserved in a Filter ABOVE the rewritten node (they can
  *    still reference the rank — it is re-emitted).
  *
  * Semantics are identical by construction: row_number over a given
  * (partition, order) picks the same k rows the final heap keeps, and
  * ranks assigned after the final heap ARE row_number values. On a
  * non-total order both formulations are nondeterministic in the same
  * way. Every oracle query in the harness runs with this rule active
  * (Verify/Bench install it session-wide), so the 240+-query DuckDB
  * hash gate is the standing equivalence proof.
  */
object GroupTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** (rankAttribute, k) from a "rank bounded above by int literal"
    * comparison. `rn < k` keeps ranks 1..k−1; `rn = 1` is top-1. */
  private object RankLimit {
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) =>
        Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, IntegerType)) =>
        Some((a, k - 1))
      case EqualTo(a: Attribute, Literal(k: Int, IntegerType)) if k == 1 =>
        Some((a, 1))
      case EqualTo(Literal(k: Int, IntegerType), a: Attribute) if k == 1 =>
        Some((a, 1))
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) =>
        Some((a, k))
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) =>
        Some((a, k - 1))
      case _ => None
    }
  }

  private def isRowNumberSpec(spec: WindowSpecDefinition,
                              part: Seq[Expression],
                              order: Seq[SortOrder]): Boolean =
    spec.partitionSpec == part && spec.orderSpec == order &&
      (spec.frameSpecification match {
        case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
          true
        case _ => false
      })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        Window(Seq(al @ Alias(WindowExpression(_: RowNumber, spec), _)),
          part, order, child, _))
        if part.nonEmpty && order.nonEmpty &&
          isRowNumberSpec(spec, part, order) =>
      val rn = al.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val ks = conjuncts.collect {
        case RankLimit(a, k) if a.semanticEquals(rn) => k
      }
      // k <= 0 is a statically-empty result — let Spark fold it, don't
      // hand a degenerate bound to the heap
      if (ks.isEmpty || ks.min <= 0) f
      else {
        val rest = conjuncts.filter {
          case RankLimit(a, _) if a.semanticEquals(rn) => false
          case _ => true
        }
        // Spark's own InsertWindowGroupLimit has usually ALREADY wrapped
        // the window's child by the time user rules run — strip the
        // matching wrapper, or the plan keeps its sort+limit below our
        // heaps and pays both
        val realChild = child match {
          case WindowGroupLimit(p2, o2, _, _, grandChild)
              if p2 == part && o2 == order => grandChild
          case other => other
        }
        val node =
          GroupTopKNode(part, order, ks.min, realChild, rankAttr = Some(rn))
        if (rest.isEmpty) node else Filter(rest.reduce(And), node)
      }
  }
}
