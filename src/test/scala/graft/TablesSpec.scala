package graft

import graft.queries.Tables
import org.scalatest.funsuite.AnyFunSuite

/** The [[graft.queries.Tables]] loader's determinism guards. The events
  * fixture ships `ts` as naive micros (TIMESTAMP_NTZ); the loader casts
  * it to session-zoned timestamp, which is only the identity
  * reinterpretation when the session zone is UTC — any other zone
  * silently shifts every instant, so the loader must refuse.
  */
class TablesSpec extends AnyFunSuite with SparkSpec {

  private def withZone[A](tz: String)(body: => A): A = {
    val orig = spark.conf.get("spark.sql.session.timeZone")
    Tables.invalidate() // drop memoized plans so load() re-decides
    try { spark.conf.set("spark.sql.session.timeZone", tz); body }
    finally { spark.conf.set("spark.sql.session.timeZone", orig); Tables.invalidate() }
  }

  test("NTZ events load fails loudly when the session zone is mis-pinned") {
    val e = intercept[IllegalArgumentException] {
      withZone("America/New_York") {
        Tables.load(spark, "/root/testdata/sf0.001", "events").count()
      }
    }
    assert(e.getMessage.contains("session.timeZone"))
    assert(e.getMessage.contains("America/New_York"))
  }

  test("NTZ events load accepts UTC-equivalent zone spellings") {
    for (tz <- Seq("UTC", "Etc/UTC", "GMT")) {
      val df = withZone(tz) {
        Tables.load(spark, "/root/testdata/sf0.001", "events")
      }
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, s"zone $tz")
    }
  }

  // The s2 contract (Tables.s2 scaladoc): for EVERY value the data can
  // carry — an exact-2-decimal rational stored as the nearest double —
  // ROUND(x·100) recovers the true scaled integer exactly, including
  // negatives (acctbal) and the ×10000 factor variant. Exhaustive over
  // ±2M consecutive cents around zero plus the high end of the price
  // domain; a single miss is a determinism break, so no sampling.
  test("s2 recovers the exact scaled integer for every 2-decimal double") {
    import org.apache.spark.sql.functions._
    val bad = spark.range(-2000000L, 2000000L)
      .select(col("id"), (col("id").cast("double") / 100.0).as("v"))
      .select(col("id"), Tables.s2(col("v")).as("s"),
        expr("CAST(ROUND(v * 10000) AS BIGINT)").as("s4"))
      .filter(col("s") =!= col("id") || col("s4") =!= col("id") * 100)
      .count()
    assert(bad == 0L)
    val badHigh = spark.range(9999000000L, 10001000000L) // ~1e8 currency units
      .select(col("id"), (col("id").cast("double") / 100.0).as("v"))
      .select(col("id"), Tables.s2(col("v")).as("s"))
      .filter(col("s") =!= col("id"))
      .count()
    assert(badHigh == 0L)
  }
}
