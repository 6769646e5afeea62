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

  test("salted join equals the plain join and actually spreads the hot key") {
    val rows = (1 to 9000).map(i => (1L, i.toLong)) ++
      (1 to 1000).map(i => ((i % 7 + 2).toLong, i.toLong))
    val fact = rows.toDF("k", "v").repartition(8)
    val build = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g")).toDF("k", "label")
    val saltedRows = Skew.saltedJoin(fact, build, "k", salts = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted
    val plainRows = fact.join(build, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted
    assert(saltedRows == plainRows && saltedRows.size == 10000)
    // the hot key must occupy many (key, salt) buckets, not one reducer
    val spread = fact.withColumn("__salt",
        pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(16)).cast("int"))
      .filter(col("k") === 1L).select(col("__salt")).distinct().count()
    assert(spread >= 12, s"hot key spread over only $spread of 16 salts")
  }
}
