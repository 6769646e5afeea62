package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact L1 distance of two `array<bigint>` columns as a native Catalyst
  * expression with loop codegen — Σ |aᵢ − bᵢ|, a missing tail position
  * (ragged input) contributing the present side's magnitude, exactly as
  * the sparse union-of-signed-contributions spelling computes it when one
  * side lacks an hour.
  *
  * Why this exists (same rationale as [[LongArrayDot]]): c51's exact
  * verify leg compares candidate user pairs by L1 distance over 24-hour
  * activity profiles in integer cents. The original relational spelling
  * expanded every candidate pair into 48 (pair, hour) contribution rows
  * through a join-union and reduced them with TWO hash aggregates — at
  * 10× data that is ~50 M shuffled rows for ~1 M candidates. Carrying
  * each profile once as a dense `array<bigint>` and evaluating the
  * distance in a fused ~15-line loop keeps the verify inside whole-stage
  * codegen and shuffles one row per candidate instead of 48.
  * `aggregate`/`zip_with` would express the same loop but are
  * CodegenFallback (boxed per element) — the measured ~100× penalty that
  * justified LongArrayDot applies unchanged.
  *
  * Semantics are exact: profile values are integer cents with
  * |v| ≤ Σ|value|·100 ≪ 2^53, so |aᵢ − bᵢ| never overflows and the sum
  * is the same integer the DuckDB oracle's relational spelling produces.
  * A null array or null element yields null (defensive — the dense
  * profiles are built with `coalesce(…, 0)`).
  */
final case class LongArrayL1(left: Expression, right: Expression)
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
  override def prettyName: String = "long_array_l1"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.max(nx, ny)
    var sum = 0L
    var k = 0
    while (k < n) {
      val hasX = k < nx
      val hasY = k < ny
      if ((hasX && x.isNullAt(k)) || (hasY && y.isNullAt(k))) return null
      val xv = if (hasX) x.getLong(k) else 0L
      val yv = if (hasY) y.getLong(k) else 0L
      sum += math.abs(xv - yv)
      k += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val sum = ctx.freshName("sum")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.max($nx, $ny);
         |long $sum = 0L;
         |for (int $k = 0; $k < $n; $k++) {
         |  if (($k < $nx && $a.isNullAt($k)) || ($k < $ny && $b.isNullAt($k))) {
         |    ${ev.isNull} = true; break;
         |  }
         |  long $xv = $k < $nx ? $a.getLong($k) : 0L;
         |  long $yv = $k < $ny ? $b.getLong($k) : 0L;
         |  $sum += java.lang.Math.abs($xv - $yv);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayL1 =
    copy(left = newLeft, right = newRight)
}
