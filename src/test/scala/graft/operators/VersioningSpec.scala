package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VersioningSpec extends AnyFunSuite with SparkSpec {

  test("diff partitions ids into the four statuses") {
    import spark.implicits._
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val v2 = Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("id", "text")
    val got = Versioning.diff(v1, v2, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("NULL content is a value, not absence") {
    import spark.implicits._
    val v1 = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Some("x"))).toDF("id", "text")
    val v2 = Seq((1L, Option.empty[String]), (2L, Some("b"))).toDF("id", "text")
    val got = Versioning.diff(v1, v2, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1: NULL→NULL is unchanged; 2: NULL→'b' is changed; 3: gone = removed
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed"))
  }

  test("diff of a snapshot against itself is all unchanged") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val d = Versioning.diff(docs, docs, col("doc_id"), col("text"))
    assert(d.filter(col("status") =!= "unchanged").count() == 0)
    assert(d.count() == docs.count())
  }
}
