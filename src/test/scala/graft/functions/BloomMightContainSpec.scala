package graft.functions

import graft.SparkSpec
import graft.operators.RuntimeFilter

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomMightContainSpec extends AnyFunSuite with SparkSpec {

  private def probe(bytes: Array[Byte], key: org.apache.spark.sql.Column) =
    GraftBridge.column(BloomMightContain(GraftBridge.expression(key), bytes))

  test("no false negatives: every build-side key passes the probe") {
    import spark.implicits._
    val build = (0L until 1000L).filter(_ % 3 == 0).toDF("k")
    val bytes = RuntimeFilter.bloomFor(build, "k", expectedItems = 1000)
    val missed = build.filter(!probe(bytes, col("k"))).count()
    assert(missed == 0, "a Bloom filter must never reject a member")
  }

  test("selectivity: most non-members are rejected at 1% fpp") {
    import spark.implicits._
    val build = (0L until 1000L).toDF("k")
    val bytes = RuntimeFilter.bloomFor(build, "k", expectedItems = 1000)
    val nonMembers = (100000L until 110000L).toDF("k")
    val passed = nonMembers.filter(probe(bytes, col("k"))).count()
    // 10k non-members at fpp 0.01 → ~100 expected; 5% is a loose ceiling
    assert(passed < 500, s"$passed of 10000 non-members passed — filter not filtering")
  }

  test("interpreted eval matches codegen eval") {
    import spark.implicits._
    val build = (0L until 100L).toDF("k")
    val bytes = RuntimeFilter.bloomFor(build, "k", expectedItems = 100)
    val ks = (0L until 200L).toDF("k")
    val viaCodegen = ks.filter(probe(bytes, col("k")))
      .collect().map(_.getLong(0)).sorted.toSeq
    // force the interpreted path through the expression's eval
    val e = BloomMightContain(GraftBridge.expression(col("k")), bytes)
    val interpreted = (0L until 200L).filter { v =>
      e.mightContain(v)
    }
    assert(viaCodegen == interpreted)
  }

  test("prefiltered exact join ≡ plain join (false positives killed downstream)") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val li = spark.read.parquet(s"$dir/lineitem.parquet").select("l_orderkey", "l_quantity")
    val bytes = RuntimeFilter.bloomFor(orders, "o_orderkey")
    val pre = RuntimeFilter.prefilter(li, col("l_orderkey"), bytes)
      .join(orders, col("l_orderkey") === col("o_orderkey")).drop("o_orderkey")
    val plain = li.join(orders, col("l_orderkey") === col("o_orderkey")).drop("o_orderkey")
    assert(pre.collect().map(_.toString).sorted.toSeq ==
      plain.collect().map(_.toString).sorted.toSeq)
  }
}
