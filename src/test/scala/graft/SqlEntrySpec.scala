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
