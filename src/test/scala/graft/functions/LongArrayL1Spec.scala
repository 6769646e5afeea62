package graft.functions

import graft.SparkSpec

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LongArrayL1Spec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def l1Col = GraftBridge.column(
    LongArrayL1(GraftBridge.expression(col("a")), GraftBridge.expression(col("b"))))

  test("L1 of long arrays matches the reference fold (codegen path)") {
    val d = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),            // 3+3+3 = 9
      (Seq(-2L, 0L, 7L), Seq(3L, 9L, -1L)),          // 5+9+8 = 22
      (Seq.empty[Long], Seq.empty[Long]))            // 0
      .toDF("a", "b")
    assert(d.select(l1Col).as[Long].collect().toSeq == Seq(9L, 22L, 0L))
  }

  test("L1 agrees with aggregate(zip_with) on random equal-length vectors") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)((Seq.fill(24)(rnd.nextInt(200000).toLong - 100000),
      Seq.fill(24)(rnd.nextInt(200000).toLong - 100000)))
    val d = rows.toDF("a", "b")
    val hof = d.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> abs(x - y)), CAST(0 AS BIGINT), (acc, z) -> acc + z)")
      .as[Long].collect().toSeq
    assert(d.select(l1Col).as[Long].collect().toSeq == hof)
  }

  test("ragged inputs: the missing tail contributes the present side's magnitude") {
    // The sparse union-of-contributions spelling treats an hour present on
    // one side only as |v| — the dense kernel must agree when one array is
    // shorter (defensive; c51 builds fixed 24-length arrays).
    val d = Seq(
      (Seq(5L, -3L, 7L), Seq(5L)),      // 0 + 3 + 7 = 10
      (Seq.empty[Long], Seq(-4L, 9L)))  // 4 + 9 = 13
      .toDF("a", "b")
    assert(d.select(l1Col).as[Long].collect().toSeq == Seq(10L, 13L))
  }

  test("null array or null element yields null") {
    val d = Seq(
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(3L), None))),
      (None: Option[Seq[Option[Long]]], Some(Seq(Some(1L), Some(2L)))))
      .toDF("a", "b")
    assert(d.select(l1Col).collect().forall(_.isNullAt(0)))
  }

  test("SQL registration: long_array_l1 callable from SQL text") {
    org.apache.spark.sql.GraftBridge.registerFunctions(spark)
    val out = spark.sql(
      "SELECT long_array_l1(array(1L, 2L, 3L), array(4L, 0L, 6L)) AS d")
      .as[Long].collect()
    assert(out.toSeq == Seq(8L))
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val e = LongArrayL1(
      Literal.create(Seq(2L, 3L), ArrayType(LongType)),
      Literal.create(Seq(5L, -7L), ArrayType(LongType)))
    assert(e.eval(null) == 13L)
    val ragged = LongArrayL1(
      Literal.create(Seq(2L, 3L, -4L), ArrayType(LongType)),
      Literal.create(Seq(5L), ArrayType(LongType)))
    assert(ragged.eval(null) == 10L)
  }
}
