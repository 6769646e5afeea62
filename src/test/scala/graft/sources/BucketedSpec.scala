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
        assert(!planStr.contains("Sort "),
          s"one-file-per-bucket sortBy must survive the read — a Sort " +
            s"here means multi-file buckets lost the order:\n$planStr")
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

  test("flag-gated backbone: load() resolves lineitem/orders to the " +
      "bucketed layout, declared queries agree row-for-row, and the " +
      "orderkey backbone join carries no exchange on the bucketed sides") {
    val dir = "/root/testdata/sf0.001"
    def run(q: String) = graft.SparkEntry.queries(q)(spark, dir)
      .collect().map(_.toString).toSeq
    // raw-path truth BEFORE the flag flips
    val rawB12 = run("b12_waiting_suppliers")
    val rawB9 = run("b9_local_supplier_volume")
    try {
      val sec = Bucketed.ensureBackbone(spark, dir, 4)
      assert(sec > 0.0, "first build must actually write")
      assert(Bucketed.ensureBackbone(spark, dir, 4) == 0.0,
        "ensureBackbone is idempotent — second call writes nothing")
      spark.conf.set(Bucketed.FlagConf, "true")
      assert(Tables.load(spark, dir, "lineitem").queryExecution.logical
          .toString.contains(Bucketed.tableName(dir, "lineitem")),
        "under the flag, load() must resolve lineitem to the catalog table")
      assert(run("b12_waiting_suppliers") == rawB12,
        "b12 must be layout-invariant")
      assert(run("b9_local_supplier_volume") == rawB9,
        "b9 must be layout-invariant")
      // the backbone join itself: bucketed li ⋈ bucketed ord on orderkey
      // plans with NO exchange on either fact side
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_suppkey")
        val ord = Tables.load(spark, dir, "orders").select("o_orderkey", "o_orderdate")
        val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        val p = j.queryExecution.sparkPlan.toString
        assert(p.contains("SortMergeJoin"), s"expected co-located SMJ:\n$p")
        assert(!p.contains("Exchange"),
          s"the bucketed backbone join must not shuffle either side:\n$p")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.conf.unset(Bucketed.FlagConf)
      Bucketed.Backbone.keys.foreach { n =>
        spark.sql(s"DROP TABLE IF EXISTS ${Bucketed.tableName(dir, n)}")
      }
    }
  }
}
