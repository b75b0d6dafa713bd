package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.classic.Strategy

/** Top-k rows per key as a first-class operator — the full custom-operator
  * ladder (LogicalPlan → Strategy → SparkPlan) for a shape Spark's
  * built-ins can't execute efficiently: `row_number() OVER (PARTITION BY k
  * ORDER BY o) <= K` SORTS every partition of the full input. This
  * operator keeps a bounded heap of K rows per key instead:
  *
  *   partial TopKPerKeyExec  (no distribution requirement, map-side —
  *                            cuts shuffle volume to ≤K rows per key per
  *                            input partition, like a partial aggregate)
  *   → shuffle on key (EnsureRequirements inserts it from the declared
  *     ClusteredDistribution)
  *   → final TopKPerKeyExec  (exact top-K per key)
  *
  * At 100 TB this is the difference between shuffling+sorting the corpus
  * and shuffling K rows per key. Results are identical to the window form
  * whenever the ordering is total (callers use explicit tiebreaks).
  */
final case class TopKPerKeyPlan(k: Int, keys: Seq[Expression],
                                order: Seq[SortOrder], child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

final case class TopKPerKeyExec(k: Int, keys: Seq[Expression],
                                order: Seq[SortOrder], partial: Boolean,
                                child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(sortOrder, childOutput)
      // per-key bounded heap; head = worst kept row under the ordering
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](
            kLocal + 1, ordering.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) heap.add(row.copy())
        else if (ordering.lt(row, heap.peek())) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      val it = heaps.values().iterator()
      while (it.hasNext) {
        val heap = it.next()
        val rows = new Array[InternalRow](heap.size())
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // drain worst-first
        out ++= rows
      }
      out.iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)
}

object TopKStrategy extends Strategy {
  import org.apache.spark.sql.execution.SparkPlan
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(k, keys, order, child) =>
      val planned = planLater(child)
      TopKPerKeyExec(k, keys, order, partial = false,
        TopKPerKeyExec(k, keys, order, partial = true, planned)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Sort key: column name + direction. */
  final case class Order(column: String, asc: Boolean = true)
  def asc(c: String): Order = Order(c, asc = true)
  def desc(c: String): Order = Order(c, asc = false)

  /** Keep the first `k` rows per key under `orderBy` (use explicit
    * tiebreaks for a total order). Registers the planner strategy on the
    * frame's session idempotently. Expressions are built as pure Catalyst
    * nodes (UnresolvedAttribute + SortOrder) and resolved by the analyzer —
    * Column-derived trees carry non-serializable ColumnNode internals that
    * must not cross into executor closures. */
  def apply(df: DataFrame, keys: Seq[String], orderBy: Seq[Order], k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val keyExprs: Seq[Expression] = keys.map(UnresolvedAttribute.quoted)
    val sortOrders = orderBy.map { o =>
      SortOrder(UnresolvedAttribute.quoted(o.column),
        if (o.asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(spark,
      TopKPerKeyPlan(k, keyExprs, sortOrders, ColumnBridge.logicalPlan(df)))
  }
}
