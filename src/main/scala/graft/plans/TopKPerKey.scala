package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Custom operator (SURVEY.md §4, preference path (c)): per-key top-k.
  *
  * The built-in formulation — row_number() over (partition by key order by
  * o) then filter rn<=k — must shuffle and sort EVERY row. At 100 TB of
  * scored candidates that shuffle is the job. This operator keeps a bounded
  * heap per key inside each input partition (partial mode), shuffles only
  * the ≤ k survivors per (partition, key), and merges heaps after the
  * exchange (final mode) — the classic partial-aggregate shape applied to
  * top-k, which Spark has for limits (TakeOrderedAndProject) but not per
  * key.
  *
  * Logical node + planner strategy are registered through
  * [[graft.GraftExtensions]]; EnsureRequirements inserts the hash exchange
  * between the partial and final execs automatically.
  *
  * Memory contract: partial state holds ≤ k rows per distinct key, and the
  * key map itself is bounded — when a partition sees more than
  * `maxKeysInMemory` distinct keys, the buffered survivors flush to the
  * output and the map resets. Flushing is safe because partial output is
  * allowed to carry more than k rows per key: the final exec re-reduces
  * after the shuffle. Worst case degrades toward the plain shuffle, never
  * OOM. Final mode is bounded by construction (k rows per key per reducer).
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    maxKeysInMemory: Int = 1 << 20) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    maxKeysInMemory: Int = 1 << 20) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val isPartial = partial
    val maxKeys = maxKeysInMemory
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrdering = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // per-key bounded "heap" as a sorted buffer: k is small by contract,
      // so insertion into an array beats heap constant factors
      val heaps = new java.util.HashMap[UnsafeRow, java.util.ArrayList[UnsafeRow]]()
      // lazily-draining iterator: when the key map passes the bound, its
      // survivors stream OUT before more input streams in, so resident
      // rows never exceed ~2 * maxKeys * k (map + one draining batch)
      new scala.collection.AbstractIterator[InternalRow] {
        private var draining: java.util.Iterator[UnsafeRow] =
          java.util.Collections.emptyIterator()
        private var inputDone = false

        private def drain(): Unit = {
          val batch = new java.util.ArrayList[UnsafeRow]()
          heaps.values.forEach { h => batch.addAll(h) }
          heaps.clear()
          draining = batch.iterator()
        }

        private def insert(row: InternalRow): Boolean = {
          val key = keyProj(row)
          var heap = heaps.get(key)
          val needsDrain = heap == null && isPartial && heaps.size >= maxKeys
          if (heap == null && !needsDrain) {
            heap = new java.util.ArrayList[UnsafeRow](limit + 1)
            heaps.put(key.copy(), heap)
          }
          if (needsDrain) {
            drain()
            heap = new java.util.ArrayList[UnsafeRow](limit + 1)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < limit ||
              rowOrdering.compare(row, heap.get(heap.size - 1)) < 0) {
            val copied = row.copy().asInstanceOf[UnsafeRow]
            var i = heap.size
            heap.add(copied) // placeholder slot
            while (i > 0 && rowOrdering.compare(copied, heap.get(i - 1)) < 0) {
              heap.set(i, heap.get(i - 1)); i -= 1
            }
            heap.set(i, copied)
            if (heap.size > limit) heap.remove(limit)
          }
          needsDrain
        }

        private def pump(): Unit = {
          while (!draining.hasNext && !inputDone) {
            if (iter.hasNext) {
              insert(iter.next()) // sets `draining` when a flush fires
            } else {
              inputDone = true
              drain() // final drain of whatever remains buffered
            }
          }
        }

        override def hasNext: Boolean = { pump(); draining.hasNext }
        override def next(): InternalRow = { pump(); draining.next() }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

/** Plans TopKPerKeyNode as partial → (exchange via EnsureRequirements) →
  * final. */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child, maxKeys) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child), maxKeys),
        maxKeys) :: Nil
    case _ => Nil
  }
}
