package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KmvSketchSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def ids(df: org.apache.spark.sql.DataFrame): Map[String, Set[Long]] =
    df.select("lang", "doc_id").collect()
      .groupBy(_.getString(0)).map { case (l, rs) => l -> rs.map(_.getLong(1)).toSet }

  test("sample is the k smallest hashes per group, any partitioning") {
    val k = 8
    val a = ids(KmvSketch.sample(docs, "lang", col("doc_id"), k))
    val b = ids(KmvSketch.sample(docs.repartition(17), "lang", col("doc_id"), k))
    assert(a == b, "sample must be partitioning-invariant")
    // model: sort by (md5(id), id), take k — per group
    val model = docs.select(col("lang"), col("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).map { case (l, rs) =>
        l -> rs.sortBy(r => (r._3, r._2)).take(k).map(_._2).toSet
      }
    assert(a == model)
  }

  test("sketch is mergeable: min-k of parts' min-k equals global min-k") {
    val k = 8
    val p1 = docs.filter(col("doc_id") % 2 === 0)
    val p2 = docs.filter(col("doc_id") % 2 === 1)
    val merged = KmvSketch.sample(
      KmvSketch.sample(p1, "lang", col("doc_id"), k)
        .unionByName(KmvSketch.sample(p2, "lang", col("doc_id"), k)),
      "lang", col("doc_id"), k)
    assert(ids(merged) == ids(KmvSketch.sample(docs, "lang", col("doc_id"), k)))
  }

  test("NULL ids never enter the sample") {
    import spark.implicits._
    val df = Seq((Some(1L), "en"), (Some(2L), "en"), (None, "en"), (None, "en"))
      .toDF("doc_id", "lang")
    val s = KmvSketch.sample(df, "lang", col("doc_id"), 3)
    val got = s.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L), "nulls-first hashes must not crowd out real rows")
  }

  test("plans as the TopKPerKey heap operator, not a window sort") {
    val plan = KmvSketch.sample(docs, "lang", col("doc_id"), 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected heap operator in:\n$plan")
    assert(!plan.contains("Window"), "no window formulation on the sample path")
  }
}
