package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a first-class operator: logical node + planner
  * strategy + two-phase physical operator, the (c) rung of the
  * custom-operator ladder (compose > Expression > LogicalPlan+Strategy >
  * mapPartitions) for semantics the built-ins only express wastefully.
  *
  * The built-in shape — `row_number().over(Window.partitionBy(keys)
  * .orderBy(o)) <= k` — SORTS EVERY ROW of every key (shuffle, then a
  * full per-partition sort; Spark has no TakeOrdered analog per key).
  * This operator keeps a bounded heap of k rows per key instead:
  *
  *  - partial phase (map-side, before the exchange): each input
  *    partition reduces to ≤ k rows per key it has seen — the shuffle
  *    then moves at most `partitions × keys × k` rows, not the corpus;
  *  - final phase (after a ClusteredDistribution exchange the planner
  *    inserts): merge the ≤ `partitions × k` survivors per key and emit
  *    each key's k rows in sort order.
  *
  * Heap memory is `keys-per-partition × k` rows — the operator suits
  * the many-rows-per-key regime (top sellers per region, latest events
  * per user). No full sort happens anywhere at any phase.
  */
final case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {

  require(keys.nonEmpty, "TopKPerKey needs at least one key expression")
  require(k > 0, s"TopKPerKey needs k > 0, got $k")

  override def output: Seq[Attribute] = child.output
  override def maxRowsPerPartition: Option[Long] = None

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as final(partial(child)); EnsureRequirements
  * inserts the key exchange between the phases (exactly how partial /
  * final aggregation pairs plan).
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // "less" = earlier in the requested sort = better. The heap is a
      // max-heap (comparator reversed), so peek() is the worst kept row
      // and a candidate only displaces it when strictly better.
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, ord.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.iterator.asScala.flatMap { heap =>
        val rows = heap.toArray(new Array[InternalRow](heap.size))
        java.util.Arrays.sort(rows, ord)
        rows.iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** DataFrame-level entry point. */
object TopK {

  /** Top `k` rows per distinct value of `keyCols`, "top" = first under
    * `orderBy` — (column, ascending) pairs; include a unique tiebreaker
    * for determinism. Null ordering follows the catalyst default
    * (ascending ⇒ nulls first, descending ⇒ nulls last), same as the
    * window formulation this replaces. Installs [[TopKPerKeyStrategy]]
    * on the session's experimental strategies if absent — works on any
    * running session, no extensions config needed.
    */
  def perKey(
      df: DataFrame, keyCols: Seq[String], orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name)}"))
    val sortOrders = orderBy.map { case (name, asc) =>
      SortOrder(attr(name),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    GraftBridge.ofRows(spark,
      TopKPerKey(keyCols.map(attr), sortOrders, k, analyzed))
  }
}
