package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, Dataset, SparkSession}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.{Column, DataFrame}

/** Whole-operator extension (SURVEY.md §2b "custom operators", path (c)):
  * per-group top-k as a first-class physical operator — custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions` ([[graft.GraftExtensions]]).
  *
  * Why Spark's built-ins aren't enough: the idiomatic formulation
  * (`row_number().over(Window.partitionBy(g).orderBy(o)) <= k`) plans
  * (Spark ≥3.5 with WindowGroupLimit, verified on 4.1)
  *
  *   Sort(FULL input partition) → WindowGroupLimit(partial)
  *     → Exchange → Sort → WindowGroupLimit(final) → Window → Filter
  *
  * — the group-limit bounds what crosses the shuffle to k rows per
  * (group × partition), same as ours, but it is SORT-BASED: every input
  * partition is fully sorted (O(n log n) over ALL rows, spill-eligible)
  * before the partial limit can scan it, and the post-shuffle side sorts
  * again. This operator plans
  *
  *   partial GroupTopKExec (map-side, bounded heaps)
  *     → Exchange(hash by group)
  *       → final GroupTopKExec (bounded heaps)
  *
  * — the per-group generalization of `TakeOrderedAndProject`: O(n log k)
  * heap updates instead of the two O(· log ·) sorts, no full-partition
  * sort anywhere, and identical shuffle volume. The same two-phase shape
  * Spark uses for aggregates, applied to ranking.
  * [[GroupTopKRewrite]] applies it automatically to the idiomatic
  * row_number-filter pattern.
  *
  * Semantics: rows ranked per group by `sortOrder`; the k FIRST rows of
  * each group are emitted (group-clustered, rank-ordered within a group).
  * Make the sort order total (add an id tiebreak) for deterministic
  * output — same contract as every rank-based operator in graft.
  *
  * Memory contract: each task holds (distinct groups in its partition) × k
  * rows on heap with NO spill path — the trade against the Window plan's
  * spillable full sort. Right-size by keeping k modest and, when group
  * cardinality is extreme, pre-clustering the input (bucketed layout or a
  * coarse repartition) so a partition sees fewer distinct groups.
  */
case class GroupTopKNode(groupExprs: Seq[Expression], sortOrder: Seq[SortOrder],
                         k: Int, child: LogicalPlan,
                         rankAttr: Option[Attribute] = None) extends UnaryNode {
  // rankAttr (when present) appends the 1-based per-group rank — REUSING
  // the rewritten Window alias's exprId so downstream references resolve
  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopKNode =
    copy(child = newChild)
}

/** Physical per-group top-k: one pass of bounded per-group heaps.
  * `partial = true` runs before the exchange (any distribution, safe
  * because top-k is idempotent under re-reduction: topk(topk(P1) ∪
  * topk(P2)) == topk(P1 ∪ P2)); `partial = false` requires the group
  * clustering and produces the final answer. */
case class GroupTopKExec(groupExprs: Seq[Expression], sortOrder: Seq[SortOrder],
                         k: Int, partial: Boolean, child: SparkPlan,
                         rankAttr: Option[Attribute] = None)
    extends UnaryExecNode {
  require(rankAttr.isEmpty || !partial,
    "rank emission is final-phase only (partial feeds another heap pass)")
  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override def outputPartitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupE = groupExprs
    val order = sortOrder
    val kk = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      // codegen'd comparator over the child schema
      val ord = RowOrdering.create(order, childOutput)
      // heap root = WORST kept row (reverse ordering), so admission is a
      // single compare against the root
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](
            math.min(kk + 1, 16), ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      val emitRank = rankAttr.isDefined
      heaps.values().asScala.iterator.flatMap { h =>
        val arr = h.toArray(new Array[InternalRow](h.size()))
        java.util.Arrays.sort(arr, ord)
        if (!emitRank) arr.iterator
        else {
          // final phase sees the whole group, so index+1 IS row_number
          val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
          arr.iterator.zipWithIndex.map { case (r, i) =>
            joined(r, InternalRow(i + 1)): InternalRow
          }
        }
      }
    }
  }
}

/** Plans [[GroupTopKNode]] as partial → (exchange via EnsureRequirements)
  * → final [[GroupTopKExec]]. */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKNode(g, s, k, child, rank) =>
      GroupTopKExec(g, s, k, partial = false,
        GroupTopKExec(g, s, k, partial = true, planLater(child)),
        rankAttr = rank) :: Nil
    case _ => Nil
  }
}

object GroupTopK {
  /** Per-group top-k through the custom operator. `orderBy` columns may
    * carry `.desc`/`.asc`; bare columns default to ascending. Requires
    * [[graft.GraftExtensions]] installed on the session (or injected at
    * build via `spark.sql.extensions=graft.GraftExtensions`). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderBy: Seq[Column], k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(orderBy.nonEmpty, "orderBy must be non-empty")
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    // eager ColumnNode → catalyst conversion (ExpressionUtils.expression
    // wraps lazily in a non-serializable ColumnNodeExpression)
    def toCatalyst(c: Column): Expression =
      ColumnNodeToExpressionConverter(c.node)
    val groupExprs: Seq[Expression] = groupCols.map(n => toCatalyst(df.col(n)))
    val sortExprs: Seq[SortOrder] = orderBy.map { c =>
      toCatalyst(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, Ascending)
      }
    }
    Dataset.ofRows(spark,
      GroupTopKNode(groupExprs, sortExprs, k, df.queryExecution.analyzed))
  }
}
