package graft.functions

import graft.SparkSpec

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LongArrayDotSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def dotCol = GraftBridge.column(
    LongArrayDot(GraftBridge.expression(col("a")), GraftBridge.expression(col("b"))))

  test("dot of long arrays matches the reference fold (codegen path)") {
    val d = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),            // 4+10+18 = 32
      (Seq(-2L, 0L, 7L), Seq(3L, 9L, -1L)),          // -6+0-7 = -13
      (Seq.empty[Long], Seq.empty[Long]))            // 0
      .toDF("a", "b")
    assert(d.select(dotCol).as[Long].collect().toSeq == Seq(32L, -13L, 0L))
  }

  test("dot agrees with aggregate(zip_with) on random vectors") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(50)((Seq.fill(64)(rnd.nextInt(200000).toLong - 100000),
      Seq.fill(64)(rnd.nextInt(200000).toLong - 100000)))
    val d = rows.toDF("a", "b")
    val hof = d.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, z) -> acc + z)")
      .as[Long].collect().toSeq
    assert(d.select(dotCol).as[Long].collect().toSeq == hof)
  }

  test("null array or null element yields null") {
    val d = Seq(
      (Some(Seq(Some(1L), Some(2L))), Some(Seq(Some(3L), None))),
      (None: Option[Seq[Option[Long]]], Some(Seq(Some(1L), Some(2L)))))
      .toDF("a", "b")
    assert(d.select(dotCol).collect().forall(_.isNullAt(0)))
  }

  test("SQL registration: long_array_dot callable from SQL text") {
    org.apache.spark.sql.GraftBridge.registerFunctions(spark)
    val out = spark.sql(
      "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .as[Long].collect()
    assert(out.toSeq == Seq(32L))
  }

  test("interpreted eval matches codegen") {
    val e = LongArrayDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2L, 3L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(5L, 7L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 31L)
  }
}
