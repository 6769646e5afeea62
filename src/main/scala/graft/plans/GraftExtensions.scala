package graft.plans

import graft.functions.LongArrayDot

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension hook: makes graft's native expressions callable
  * from SQL text on any cluster via
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`).
  *
  * Only functions live here today; the slot is also where a custom
  * `Rule[LogicalPlan]` / `SparkStrategy` would register if an operator
  * ever outgrows what the DataFrame API + native expressions express.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.longArrayDot)
}

object GraftExtensions {

  /** (name, info, builder) for `long_array_dot(array<bigint>, array<bigint>)`. */
  val longArrayDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("long_array_dot"),
    new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "long_array_dot(a, b) takes exactly two arguments")
      LongArrayDot(args.head, args(1))
    })
}
