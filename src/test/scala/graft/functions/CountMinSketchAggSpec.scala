package graft.functions

import graft.SparkSpec

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CountMinSketchAggSpec extends AnyFunSuite with SparkSpec {

  private val (depth, width) = (4, 256)

  private def sketch(df: DataFrame): Array[Long] =
    df.agg(GraftBridge.column(
        CountMinSketchAgg(GraftBridge.expression(col("tok")), depth, width)
          .toAggregateExpression()).as("cms"))
      .head().getSeq[Long](0).toArray

  private def estimate(cms: Array[Long], tok: String): Long =
    (0 until depth).map(d => cms(d * width + CountMinSketchAgg.bucket(d, tok, width))).min

  test("never undercounts, and exact for every token on a small corpus") {
    import spark.implicits._
    val words = Seq.tabulate(2000)(i => s"w${i % 97}")
    val df = words.toDF("tok")
    val cms = sketch(df)
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (tok, n) =>
      val est = estimate(cms, tok)
      assert(est >= n, s"CMS undercounted $tok: $est < $n")
    }
    // total mass per row is preserved exactly
    (0 until depth).foreach { d =>
      assert(cms.slice(d * width, (d + 1) * width).sum == words.size.toLong)
    }
  }

  test("sketch is partitioning-invariant (merge = elementwise add)") {
    import spark.implicits._
    val words = Seq.tabulate(5000)(i => s"tok${i % 311}").toDF("tok")
    val a = sketch(words.repartition(2))
    val b = sketch(words.repartition(16))
    assert(a.toSeq == b.toSeq, "partial merge order must not change the sketch")
  }

  test("callable from SQL text via the extension registration") {
    import spark.implicits._
    org.apache.spark.sql.GraftBridge.registerFunctions(spark)
    Seq.tabulate(300)(i => s"t${i % 7}").toDF("tok").createOrReplaceTempView("cms_toks")
    val viaSql = spark
      .sql(s"SELECT count_min_sketch_exactable(tok, $depth, $width) AS cms FROM cms_toks")
      .head().getSeq[Long](0).toArray
    val direct = sketch(spark.table("cms_toks"))
    assert(viaSql.toSeq == direct.toSeq)
  }

  test("bucket hash matches the SQL conv(substring(md5)) spelling") {
    import spark.implicits._
    val toks = Seq("the", "merge", "a", "zz9").toDF("tok")
    for (d <- 0 until depth) {
      val viaSql = toks.select(col("tok"),
        pmod(conv(substring(md5(concat(lit(s"$d:"), col("tok")).cast("binary")), 1, 4),
          16, 10).cast("long"), lit(width.toLong)).as("b"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      viaSql.foreach { case (tok, b) =>
        assert(CountMinSketchAgg.bucket(d, tok, width).toLong == b,
          s"JVM bucket disagrees with SQL for d=$d tok=$tok")
      }
    }
  }
}
