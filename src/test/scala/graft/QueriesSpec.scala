package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + determinism for the whole declared inventory at sf0.001: every
  * query runs, and running it twice yields identical rows (catches
  * accidental order- or partitioning-dependence — the determinism
  * contract behind the DuckDB oracle).
  */
class QueriesSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle") {
    // Since r5 even the HLL++ sketch query (c24) is oracle-checked: its
    // output carries only replayable columns (exact count + the
    // engine-computed error-band boolean the oracle pins to TRUE), so
    // the full inventory has a DuckDB twin — no rows-only exceptions.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty, s"queries without oracle: $noOracle")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and is deterministic at sf0.001") {
      val r1 = fn(spark, dir).collect().map(_.toString).toSeq
      val r2 = fn(spark, dir).collect().map(_.toString).toSeq
      assert(r1 == r2, s"$name: two runs differ")
      // Every declared query is substantive at every SF (verified): an
      // empty result would still "hash-match" an empty oracle — guard
      // against silently gutting the gate.
      assert(r1.nonEmpty, s"$name: empty result")
    }
  }
}
