package graft.functions

import graft.SparkSpec

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The compiled-method codebook expressions: null-element contract
  * (mirrors [[LongArrayDot]] — null in ⇒ null out, instead of reading
  * an undefined slot) and structural equality of [[CodebookModel]]
  * (Array fields would otherwise make equal codebooks compare unequal,
  * defeating expression canonicalization).
  */
class CodebookOpsSpec extends AnyFunSuite with SparkSpec {

  private def model(): CodebookModel = CodebookModel(
    cids = Array(0L, 1L),
    vecs = Array(Array(100000000L, 0L), Array(0L, 100000000L)),
    norms = Array(1.0, 1.0),
    superVecs = Array(Array(50000000L, 50000000L)),
    superNorms = Array(0.7071),
    members = Array(Array(0, 1)))

  test("CodebookModel equality is structural, not reference") {
    val a = model()
    val b = model()
    assert(a ne b)
    assert(a == b, "identical codebooks must compare equal")
    assert(a.hashCode == b.hashCode)
    val c = b.copy(cids = Array(0L, 2L))
    assert(a != c)
  }

  test("null array element yields null, not a garbage cell (eval + codegen)") {
    val m = model()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ie", ArrayType(LongType, containsNull = true)),
      StructField("nv", DoubleType, nullable = false)))
    val rows = java.util.Arrays.asList(
      Row(1L, Seq[java.lang.Long](100000000L, 0L), 1.0),
      Row(2L, Seq[java.lang.Long](null, 100000000L), 1.0))
    val df = spark.createDataFrame(rows, schema)
    val cellCol = GraftBridge.column(CodebookCellHier(
      GraftBridge.expression(col("ie")), GraftBridge.expression(col("nv")), m))
    val cosCol = GraftBridge.column(CodebookCos(
      GraftBridge.expression(col("ie")), GraftBridge.expression(col("nv")),
      GraftBridge.expression(lit(0L)), m))
    val topCol = GraftBridge.column(CodebookTopCells(
      GraftBridge.expression(col("ie")), GraftBridge.expression(col("nv")), m, 2))
    val out = df.select(col("id"), cellCol.as("cell"), cosCol.as("cc"),
        topCol.as("tc"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getLong(1),
          if (r.isNullAt(2)) null else r.getDouble(2),
          if (r.isNullAt(3)) null else r.getSeq[Long](3)))).toMap
    assert(out(1L)._1 == 0L, "clean vector assigns to its nearest cell")
    assert(out(1L)._2 != null && out(1L)._3 != null)
    assert(out(2L)._1 == null, "null element must null the assignment")
    assert(out(2L)._2 == null, "null element must null the cosine")
    assert(out(2L)._3 == null, "null element must null the probe list")
  }
}
