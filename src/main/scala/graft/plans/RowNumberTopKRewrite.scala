package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: per-key top-k expressed the declarative way —
  *
  * {{{
  *   df.withColumn("rn", row_number().over(Window.partitionBy(keys).orderBy(o)))
  *     .filter($"rn" <= k)
  *     .select(<anything not using rn>)
  * }}}
  *
  * — is rewritten to the native [[TopKPerKey]] operator (bounded heaps
  * around one key exchange) whenever the rank column itself is projected
  * away. The window formulation shuffles EVERY row of every key and
  * fully sorts each partition before the filter throws away all but k
  * rows per key; the heap operator's map-side partial bounds the shuffle
  * to k rows per key per input partition and never sorts the input.
  *
  * Fires only on the exact semantics-preserving shape:
  *  - the Window computes a single `row_number()` over a non-empty
  *    partitionSpec (global top-k is TakeOrdered's job, not ours);
  *  - the Filter is `rn <= k`, `rn < k`, or `rn = 1` on that window
  *    output (optionally through an int→long cast — the common
  *    `.cast("long")` in declared queries);
  *  - the Project above references child columns only, so dropping the
  *    rank column is invisible.
  *
  * Rank-preserving variants (e.g. b3/c19 emit `rn` as output) keep the
  * window plan — the heap output carries no rank. The rewrite is proven
  * row-identical by TopKSpec (rule output vs window output) and by the
  * unchanged d9 oracle.
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] {

  /** k from the filter predicate on the rank attribute, if the predicate
    * is one of the supported top-k shapes.
    */
  private def topKOf(cond: Expression, rn: Attribute): Option[Int] = {
    def isRn(e: Expression): Boolean = e match {
      case a: Attribute => a.exprId == rn.exprId
      case Cast(a: Attribute, _, _, _) => a.exprId == rn.exprId
      case _ => false
    }
    cond match {
      case LessThanOrEqual(e, IntegerLiteral(k)) if isRn(e) && k > 0 => Some(k)
      case LessThan(e, IntegerLiteral(k)) if isRn(e) && k > 1 => Some(k - 1)
      case EqualTo(e, IntegerLiteral(1)) if isRn(e) => Some(1)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond, w @ Window(
        Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
        partitionSpec, orderSpec, child, _)))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      val rn = alias.toAttribute
      // Spark's InferWindowGroupLimit (main optimizer, runs before user
      // rules) has usually already pushed a WindowGroupLimit below the
      // Window; TopKPerKey subsumes it (same per-key rank limit, minus
      // the local sort + post-shuffle sort it still needs), so a
      // matching node is stripped rather than left to re-grow a
      // sort + exchange under the heap operator.
      val source = child match {
        case WindowGroupLimit(ps, os, _: RowNumber, limit, grandchild)
            if ps == partitionSpec && os == orderSpec &&
              topKOf(cond, rn).exists(_ <= limit) => grandchild
        case other => other
      }
      topKOf(cond, rn) match {
        case Some(k)
            if projList.forall(_.references.subsetOf(source.outputSet)) &&
              partitionSpec.forall(_.references.subsetOf(source.outputSet)) =>
          Project(projList, TopKPerKey(partitionSpec, orderSpec, k, source))
        case _ => p
      }
  }
}

/** Session installer for the heap top-k path: the planner strategy plus
  * the window-rewrite optimizer rule, on any running session (no
  * extensions config needed). Idempotent.
  */
object TopKInstall {
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(RowNumberTopKRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RowNumberTopKRewrite
    }
  }
}
