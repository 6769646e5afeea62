package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct groupBy on skewed data") {
    // heavy hitter: key 1 owns 90% of rows
    val rows = (1 to 9000).map(i => (1L, i.toLong)) ++ (1 to 1000).map(i => ((i % 7 + 2).toLong, i.toLong))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Skew.saltedSum(df, col("k"), Map("sum_v" -> col("v")), salts = 16)
      .select(col("key"), col("n"), col("sum_v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
