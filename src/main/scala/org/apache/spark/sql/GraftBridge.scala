package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters, so
  * graft's native Catalyst expressions (e.g.
  * `graft.functions.LongArrayDot`) can be used as `Column`s with the
  * public DataFrame API. Placing a converter in `org.apache.spark.sql` is
  * the established pattern for third-party expression libraries (the
  * alternative — registering every expression through
  * SparkSessionExtensions and round-tripping through SQL text — adds a
  * parse per call site and no safety).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame over a custom logical plan (the entry point for
    * graft's own operators, e.g. [[graft.plans.TopKPerKey]]).
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Build a DataFrame from already-Catalyst rows, skipping the external
    * Row→InternalRow converter. The columnar kernels' partial emission
    * goes through here: at 100× the bucket-histogram kernel emits ~6M
    * partial rows (|partitions|·|flags|·|buckets|), and the boxed
    * `createDataFrame(Row)` converter path turned that emission into
    * the pass's dominant cost (measured r14: c70 at 100× read 63 s vs
    * the row path's 18.6, entirely the converter — PERF.md r14 kernel
    * section has the post-fix pair). Callers must supply rows matching
    * the schema exactly (UTF8String for strings, null slots for SQL
    * NULL).
    */
  def ofInternalRows(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  /** Register graft's SQL functions on an ALREADY-RUNNING session (the
    * extensions class only applies at session build; a REPL or notebook
    * that already has a session uses this instead).
    */
  def registerFunctions(spark: SparkSession): Unit =
    Seq(graft.plans.GraftExtensions.longArrayDot,
      graft.plans.GraftExtensions.longArrayL1,
      graft.plans.GraftExtensions.simhash64,
      graft.plans.GraftExtensions.minhashBands,
      graft.plans.GraftExtensions.tokenNgrams,
      graft.plans.GraftExtensions.countMinSketch,
      graft.plans.GraftExtensions.qdigestQuantiles,
      graft.plans.GraftExtensions.qdigestQuantilesWeighted).foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}
