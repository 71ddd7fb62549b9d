package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BaseOrdering, Descending, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension: top-k rows per key as ONE first-class plan
  * node, planned as a two-phase bounded-heap operator.
  *
  * The composed alternative (window `row_number` + filter, or a LATERAL
  * subquery) must shuffle and sort EVERY row of the child: at 100 TB the
  * exchange carries the full table and each reducer sorts its whole
  * partition just to throw away all but k rows per key. This operator
  * plans as
  *
  *   TopKPerKey(final) <- Exchange(hash by key) <- TopKPerKey(partial)
  *
  * — the partial phase caps each map-side partition at k rows PER KEY
  * with a bounded heap (no sort, O(n log k) comparisons, O(keys·k)
  * memory), so the shuffle moves at most partitions·keys·k rows instead
  * of n. Same shape as Spark's partial aggregation, applied to order
  * statistics. Ties: the sort order should be made total (append a
  * unique tiebreak column) for deterministic output, exactly as a
  * window-function formulation requires.
  *
  * The final phase can additionally EMIT the rank ordinal (`rankAttr`):
  * the surviving k rows per key pop off the heap already ordered, so the
  * 1..k numbering is free — no sort, no window. This is what lets
  * [[RewriteRankFilterToTopK]] fire even when the query projects the
  * `row_number()` column itself (the ANN top-k surface does: it returns
  * `(q_vec, rank, c_vec, cosine)`).
  *
  * Registered via `GraftExtensions` (`injectPlannerStrategy`); the
  * logical node is built already-resolved against the child's output, so
  * it passes analysis untouched and opaquely through the optimizer.
  */
object TopKPerKey {

  /** Top `k` rows of `df` per `keyCols` group, first in `orderCols`
    * order ((name, ascending) pairs). Row order within the result is
    * unspecified, as with any unsorted DataFrame.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
                 orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(keyCols.nonEmpty && orderCols.nonEmpty)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column '$n' not among ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerKeyPlan(keyCols.map(attr), order, k, analyzed))
  }
}

case class TopKPerKeyPlan(
    keys: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Option[Attribute] = None) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child, rankAttr) =>
      // Only the final phase numbers rows: partial survivors are a
      // superset of the true top-k, so any rank assigned map-side would
      // be provisional and discarded anyway.
      val partial = TopKPerKeyExec(keys, order, k, partial = true, None, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, rankAttr, partial) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per key. `partial = true` runs map-side on
  * whatever partitioning the child has; the final phase declares
  * `ClusteredDistribution(keys)` so EnsureRequirements plants the hash
  * exchange between the two — which then carries only the partial
  * survivors. When `rankAttr` is set (final phase only), each group's
  * survivors are emitted best-first with the 1-based ordinal appended —
  * the heap pops in reverse sort order, so the numbering costs nothing.
  */
case class TopKPerKeyExec(
    keys: Seq[Attribute],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    rankAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val emitRank = rankAttr.isDefined
    val outputTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering: BaseOrdering = RowOrdering.create(sortOrder, childOutput)
      // Per key a max-heap under the sort order: head = worst kept row.
      // A new row displaces the head iff it sorts strictly before it, so
      // each heap holds the k first rows in sort order seen so far.
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ordering)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.enqueue(row.copy())
        } else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      val groups = heaps.values().iterator().asScala
      if (!emitRank) {
        groups.flatMap(_.iterator)
      } else {
        // dequeueAll pops worst-first (the heap is a max-heap under the
        // sort order); reversing gives the group best-first, so element
        // i carries rank i + 1 — identical to row_number() over a window
        // with the same (possibly tie-arbitrary) order.
        val proj = UnsafeProjection.create(outputTypes)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        groups.flatMap { heap =>
          val sorted = new Array[InternalRow](heap.size)
          var j = sorted.length - 1
          while (j >= 0) { sorted(j) = heap.dequeue(); j -= 1 }
          sorted.iterator.zipWithIndex.map { case (row, i) =>
            rankRow.update(0, i + 1)
            proj(joined(row, rankRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }
}
