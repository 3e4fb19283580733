package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: exact top-k per key with MAP-SIDE
  * pruning (SURVEY.md §7.3 ladder rung (c): LogicalPlan + Strategy +
  * SparkPlan).
  *
  * The DataFrame idiom for per-group top-k — row_number() over a
  * (partitionBy key, orderBy v) window, filter rn <= k — shuffles
  * EVERY row of the input and sorts each reducer partition. At 100 TB
  * with bounded k that is almost all wasted I/O: a partition holding
  * m rows of one key can contribute at most k of them to the answer.
  * This operator keeps a k-bounded heap per key on each input
  * partition, shuffles only the surviving <= k·keys-per-partition
  * rows, and re-prunes after the exchange — the same
  * partial/final split Spark applies to aggregates, applied to
  * order-statistics. No sort anywhere: O(n log k) heap work replaces
  * the reducer-side O(n log n) sort.
  *
  * Ordering must be TOTAL (tie-break to uniqueness) for the result to
  * be deterministic — same contract as the row_number oracle it
  * replaces. */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : TopKPerKeyPlan = copy(child = newChild)
}

/** Physical node; `partial = true` runs before the exchange (any
  * distribution), `partial = false` demands clustering on the keys —
  * EnsureRequirements inserts the single hash exchange between the
  * two, exactly like partial/final aggregation. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val orderExprs = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // rank order: first under this ordering = rank 1; the heap is a
      // max-heap under it, so head is the current worst survivor
      val ord = RowOrdering.create(orderExprs, childOutput)
      val heaps = mutable.HashMap.empty[UnsafeRow,
        mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row) // reused buffer — copy on first sight
        val heap = heaps.getOrElse(key, null)
        if (heap == null) {
          val h = mutable.PriorityQueue.empty[InternalRow](ord)
          h.enqueue(row.copy())
          heaps.put(key.copy(), h)
        } else if (heap.size < limit) {
          heap.enqueue(row.copy())
        } else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : TopKPerKeyExec = copy(child = newChild)
}

/** Plans the logical node as partial -> (exchange) -> final. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true,
        planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Exact top-k rows per key under `orderBy` (column name ->
    * descending?; together they must be a total order). Key and order
    * columns are resolved eagerly against the child's analyzed output
    * — Spark 4's ColumnNode wrappers never resolve inside a plan node
    * the analyzer doesn't know. Registers the strategy idempotently
    * on the session; cluster deployments get it via GraftExtensions
    * instead. */
  def perKey(df: DataFrame, keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      child.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${child.output.map(_.name)}"))
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    val orderExprs = orderBy.map { case (name, desc) =>
      val dir = if (desc) Descending else Ascending
      SortOrder(attr(name), dir, dir.defaultNullOrdering, Seq.empty)
    }
    GraftColumnBridge.ofRows(spark,
      TopKPerKeyPlan(keyCols.map(attr), orderExprs, k, child))
  }
}
