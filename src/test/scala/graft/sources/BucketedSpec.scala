package graft.sources

import graft.SparkSpec
import graft.queries.Tables

import org.scalatest.funsuite.AnyFunSuite

class BucketedSpec extends AnyFunSuite with SparkSpec {

  test("co-located join on bucketed tables: no Exchange on either side") {
    val dir = "/root/testdata/sf0.001"
    Bucketed.writeBucketed(
      Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice"),
      "bkt_lineitem", "l_orderkey", 4)
    Bucketed.writeBucketed(
      Tables.load(spark, dir, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .select("l_orderkey", "o_totalprice", "o_orderpriority"),
      "bkt_orders", "l_orderkey", 4)
    try {
      // broadcast would hide the co-location win we're asserting
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = Bucketed.colocatedJoin(spark, "bkt_lineitem", "bkt_orders",
          "l_orderkey")
        val plan = joined.queryExecution.sparkPlan
        val planStr = plan.toString
        assert(planStr.contains("SortMergeJoin"))
        assert(!planStr.contains("Exchange"),
          s"bucketed join must not shuffle either side:\n$planStr")
        // and it still computes the right thing
        val n = joined.count()
        assert(n == Tables.load(spark, dir, "lineitem").count(),
          "every lineitem row has exactly one order")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
    }
  }
}
