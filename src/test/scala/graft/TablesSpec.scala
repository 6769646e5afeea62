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
}
