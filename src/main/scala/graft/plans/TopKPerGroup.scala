package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeSet, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k rows per group with a
  * dense 1..k rank column — the semantics of
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k`, with a plan
  * Spark's built-ins can't produce.
  *
  * WindowExec must SORT every partition's full data on (g, o) — at
  * 100 TB that's a full shuffle + sort of the fact table to keep k
  * rows per key. This operator instead runs two bounded-heap passes
  * (the same partial/final shape as aggregation):
  *
  *   partial TopKPerGroupExec   per input partition: one heap of ≤ k
  *                              rows per group seen — map-side, no
  *                              sort, memory O(groups·k)
  *   exchange (g)               shuffles only the surviving ≤ k·P
  *                              rows per group, not the input
  *   final TopKPerGroupExec     re-heaps per group, emits rows in
  *                              order with rank 1..k
  *
  * Registered via GraftExtensions (injectPlannerStrategy) or
  * GraftColumnBridge.addStrategy; built from the DataFrame API by
  * operators/TopK.perGroup.
  */
case class TopKPerGroup(
    grouping: Seq[Attribute],
    sortOrder: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"topKPerGroup: k must be positive, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, so, k, rank, child) =>
      // partial (map-side) under final, like partial aggregation;
      // EnsureRequirements inserts the exchange demanded by the
      // final node's requiredChildDistribution
      TopKPerGroupExec(g, so, k, Some(rank),
        TopKPerGroupExec(g, so, k, None, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    grouping: Seq[Attribute],
    sortOrder: Seq[SortOrder],
    k: Int,
    rankAttr: Option[Attribute], // None ⇒ partial (map-side) phase
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isEmpty) Seq(UnspecifiedDistribution)
    // GLOBAL top-k (no grouping): the final phase must see all partial
    // survivors in one partition — AllTuples, the single-partition
    // distribution (ClusteredDistribution(Nil) is rejected by Spark).
    // Volume at the exchange is ≤ k·partitions rows, same as grouped.
    else if (grouping.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(grouping))

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupingExprs = grouping
    val so = sortOrder
    val kk = k
    val emit = rankAttr.isDefined
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupingExprs, childOutput)
      val ord = new LazilyGeneratedOrdering(so, childOutput)
      // heap head = worst kept row (max in sort order) for O(log k)
      // evict
      val rev = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]
      var it = iter
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](kk + 1, rev)
          heaps.put(key.copy(), q)
        }
        if (q.size < kk) q.add(row.copy())
        else if (ord.compare(row, q.peek()) < 0) { q.poll(); q.add(row.copy()) }
      }
      val groups = heaps.values().iterator()
      if (!emit) {
        // partial phase: stream the survivors, order irrelevant
        new Iterator[InternalRow] {
          private var cur: java.util.Iterator[InternalRow] = java.util.Collections.emptyIterator()
          override def hasNext: Boolean = {
            while (!cur.hasNext && groups.hasNext) cur = groups.next().iterator()
            cur.hasNext
          }
          override def next(): InternalRow = cur.next()
        }
      } else {
        val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        new Iterator[InternalRow] {
          private var cur: Array[InternalRow] = Array.empty
          private var i = 0
          override def hasNext: Boolean = {
            while (i >= cur.length && groups.hasNext) {
              cur = groups.next().toArray(Array.empty[InternalRow])
              java.util.Arrays.sort(cur, ord)
              i = 0
            }
            i < cur.length
          }
          override def next(): InternalRow = {
            val rank = new GenericInternalRow(Array[Any](i + 1))
            val out = toUnsafe(joined(cur(i), rank))
            i += 1
            out
          }
        }
      }
    }, preservesPartitioning = true)
  }
}
