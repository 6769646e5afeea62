package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact dot product of two `array<bigint>` columns as a native Catalyst
  * expression with loop codegen.
  *
  * Why this exists: the same computation as a flat 64-term
  * `element_at(a,i) * element_at(b,i)` sum is semantically fine, but the
  * generated Java method is ~41 KB of bytecode — over HotSpot's
  * 8 KB `DontCompileHugeMethods` limit, so the JVM never JITs it and each
  * row pays ~25 µs of bytecode interpretation (measured on the c4
  * candidate-verify join). Spark's `aggregate`/`zip_with` higher-order
  * functions are worse still: CodegenFallback, boxed per element. This
  * expression generates a ~20-line loop the JIT compiles to vectorizable
  * machine code, keeping the surrounding Project/Filter inside
  * whole-stage codegen.
  *
  * Semantics (must stay bit-identical to the DuckDB oracle's decimal-sum
  * formulation): primitive long multiply-add over pre-scaled (×10⁴)
  * embedding elements; |sum| ≤ 64·(10⁵)² < 2^53, so no overflow and the
  * eventual double conversion is exact. A null array or null ELEMENT
  * yields null. Ragged (unequal-length) inputs sum over the common
  * prefix — the same positional-intersection the oracle's `JOIN … ON
  * a.i = b.i` computes (note this differs from `zip_with`, which would
  * null-pad the shorter side and poison the sum; embeddings are fixed
  * 64-dim, so the case is defensive only).
  */
final case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var k = 0
    while (k < n) {
      if (x.isNullAt(k) || y.isNullAt(k)) return null
      sum += x.getLong(k) * y.getLong(k)
      k += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $k = 0; $k < $n; $k++) {
         |  if ($a.isNullAt($k) || $b.isNullAt($k)) { ${ev.isNull} = true; break; }
         |  $sum += $a.getLong($k) * $b.getLong($k);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}
