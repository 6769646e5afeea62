package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.HllDistinct

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchStoreSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def cells(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap

  test("write + append in halves equals sketching the whole corpus") {
    val path = Files.createTempDirectory("sketch-store").toString + "/regs"
    val first = docs.filter(col("doc_id") % 2 === 0)
    val second = docs.filter(col("doc_id") % 2 =!= 0)
    SketchStore.write(first, path)
    SketchStore.append(spark, second, path)
    val oneShot = HllDistinct.registerCore(docs, col("source"), col("text"))
    assert(cells(SketchStore.registers(spark, path)) == cells(oneShot),
      "incrementally appended registers must equal the one-shot sketch")
  }

  test("append is idempotent under batch replay") {
    val path = Files.createTempDirectory("sketch-replay").toString + "/regs"
    SketchStore.write(docs, path)
    val before = cells(SketchStore.registers(spark, path))
    SketchStore.append(spark, docs.filter(col("doc_id") % 3 === 0), path)
    assert(cells(SketchStore.registers(spark, path)) == before,
      "re-ingesting already-sketched documents must not move any register")
  }

  test("overlap readout from the store reproduces c71's estimates") {
    val path = Files.createTempDirectory("sketch-overlap").toString + "/regs"
    SketchStore.write(docs.filter(col("doc_id") % 2 === 0), path)
    SketchStore.append(spark, docs.filter(col("doc_id") % 2 =!= 0), path)
    val fromStore = SketchStore.overlap(spark, path)
      .collect().map(_.toSeq).toSeq
    val declared = graft.SparkEntry
      .queries("c71_overlap_hll")(spark, "/root/testdata/sf0.001")
      .select("source_a", "source_b", "est_a", "est_b", "est_union", "est_shared")
      .collect().map(_.toSeq).toSeq
    assert(fromStore.nonEmpty && fromStore == declared,
      "store readout must reproduce the c71 estimate columns")
  }
}
