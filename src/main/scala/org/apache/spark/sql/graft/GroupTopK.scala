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
  * Exchange → **full Sort of every group** → Window → Filter. All n rows
  * per group are sorted and materialized to keep k. This operator plans
  *
  *   partial GroupTopKExec (map-side, bounded heaps)
  *     → Exchange(hash by group)
  *       → final GroupTopKExec (bounded heaps)
  *
  * — the per-group generalization of `TakeOrderedAndProject`: O(n log k)
  * heap updates instead of O(n log n) sort, at most k rows per (group ×
  * input partition) cross the shuffle, and no full-group materialization
  * anywhere. The same two-phase shape Spark uses for aggregates, applied
  * to ranking.
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
                         k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
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
                         k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
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
      heaps.values().asScala.iterator.flatMap { h =>
        val arr = h.toArray(new Array[InternalRow](h.size()))
        java.util.Arrays.sort(arr, ord)
        arr.iterator
      }
    }
  }
}

/** Plans [[GroupTopKNode]] as partial → (exchange via EnsureRequirements)
  * → final [[GroupTopKExec]]. */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKNode(g, s, k, child) =>
      GroupTopKExec(g, s, k, partial = false,
        GroupTopKExec(g, s, k, partial = true, planLater(child))) :: Nil
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
