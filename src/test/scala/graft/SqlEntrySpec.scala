package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every curated SQL text must be the DataFrame path, re-spelled: same
  * columns, same rows, same order. Both run in THIS engine, so any
  * divergence is a real drift between the two spellings, not dialect
  * noise.
  */
class SqlEntrySpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("curated map covers all four query families") {
    val fams = SqlEntry.sparkSql.keySet.map(_.head)
    assert(Set('a', 'b', 'c', 'd').subsetOf(fams))
    assert(SqlEntry.sparkSql.size >= 5)
  }

  test("the DataFrame-only remainder is exactly the documented excuse list") {
    // Every text names a declared query, and the queries WITHOUT a text
    // are precisely the 12 the SqlEntry scaladoc excuses (custom
    // physical operator / mapPartitions decode / iterative driver
    // loops). A new query landing without either a text or an excuse —
    // or a text for a query that no longer exists — fails here.
    // (c62 left this list in r8: its loop is FIXED 4 rounds, so the
    // text unrolls it as chained CTEs.)
    val excused = Set(
      "b7_asof_events", "b7b_asof_forward", "b7c_asof_nearest", // MergeAsOfExec
      "c11_multimodal", // typed mapPartitions decode
      "c12_ann_ivf", "c31_semdedup", "c34_cluster_profile", // Lloyd loop
      "c56_diverse_sample", "c65_label_outliers", "c66_knn_agreement", // Lloyd loop
      "c15_dedup_groups", "c25_canonical_docs") // fixpoint label propagation
    val declared = SparkEntry.queries.keySet
    assert((SqlEntry.sparkSql.keySet -- declared).isEmpty,
      s"texts for undeclared queries: ${SqlEntry.sparkSql.keySet -- declared}")
    assert((declared -- SqlEntry.sparkSql.keySet) == excused,
      "SQL-text coverage drifted from the documented excuse list: " +
        s"unexcused=${declared -- SqlEntry.sparkSql.keySet -- excused} " +
        s"stale=${excused -- (declared -- SqlEntry.sparkSql.keySet)}")
  }

  for (name <- SqlEntry.sparkSql.keys.toSeq.sorted) {
    test(s"$name: SQL text matches the DataFrame path row-for-row") {
      val viaSql = SqlEntry.sql(spark, dir, name)
      val viaDf = SparkEntry.queries(name)(spark, dir)
      assert(viaSql.schema.fieldNames.toSeq == viaDf.schema.fieldNames.toSeq,
        "column names/order drifted between the two spellings")
      val a = viaSql.collect().map(_.toSeq).toSeq
      val b = viaDf.collect().map(_.toSeq).toSeq
      assert(a == b)
    }
  }
}
