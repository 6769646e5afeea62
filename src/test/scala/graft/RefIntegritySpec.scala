package graft

import org.scalatest.funsuite.AnyFunSuite

/** d29's two audit directions replayed by independent set arithmetic
  * over collected key columns — the edge list is deliberately
  * re-declared here (not shared with the query) so an accidental edit
  * to either side surfaces as a divergence.
  */
class RefIntegritySpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val edges = Seq(
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"))

  test("d29: both audit directions match independent set arithmetic per edge") {
    def keys(table: String, column: String): Seq[Long] =
      spark.read.parquet(s"$dir/$table.parquet")
        .selectExpr(s"CAST($column AS BIGINT)").collect().map(_.getLong(0)).toSeq

    val expect = edges.map { case (rel, ct, ck, pt, pk) =>
      val child = keys(ct, ck)
      val parent = keys(pt, pk).toSet
      val orphanRows = child.count(!parent(_)).toLong
      val orphanKeys = (child.toSet -- parent).size.toLong
      val unref = (parent -- child.toSet).size.toLong
      (rel, child.length.toLong, orphanRows, orphanKeys, unref)
    }.sortBy(_._1)

    val got = SparkEntry.queries("d29_ref_integrity")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expect,
      s"referential audit diverged from the model:\n got=$got\n exp=$expect")
    // the synthetic star schema is FK-clean but NOT fully covered: the
    // audit must prove both facts, not vacuously pass on an empty diff.
    assert(got.forall(_._3 == 0L), "synthetic data has no orphans")
    assert(got.map(_._5).sum > 0L,
      "at least one dimension row is unreferenced (orders without lineitems)")
  }
}
