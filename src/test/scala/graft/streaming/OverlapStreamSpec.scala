package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

class OverlapStreamSpec extends AnyFunSuite with SparkSpec {

  private val src = "/root/testdata/sf0.001/documents.parquet"

  test("streamed registers equal batch; readout reproduces c71's estimates") {
    val dir = Files.createTempDirectory("overlap-stream").toFile
    Files.copy(new java.io.File(src).toPath,
      new java.io.File(dir, "documents.parquet").toPath)
    val ckpt = Files.createTempDirectory("overlap-ckpt").toFile

    val schema = spark.read.parquet(dir.getAbsolutePath).schema
    val q = OverlapStream.registers(
        spark.readStream.schema(schema).parquet(dir.getAbsolutePath))
      .writeStream.outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("overlap_stream_test").start()
    q.awaitTermination()

    val streamed = spark.table("overlap_stream_test")
    val batch = OverlapStream.registers(spark.read.parquet(dir.getAbsolutePath))
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(cells(streamed) == cells(batch),
      "streamed sparse registers must equal the batch registers cell for cell")

    // readout over the STREAMED state ≡ the declared c71 result's
    // estimate columns (the exact-shared column is the stored-corpus
    // audit leg — it has no incremental twin by design)
    val fromStream = OverlapStream.overlap(streamed)
      .collect().map(_.toSeq).toSeq
    val declared = graft.SparkEntry
      .queries("c71_overlap_hll")(spark, "/root/testdata/sf0.001")
      .select("source_a", "source_b", "est_a", "est_b", "est_union", "est_shared")
      .collect().map(_.toSeq).toSeq
    assert(fromStream.nonEmpty && fromStream == declared,
      "overlap readout over streamed registers must reproduce c71's estimates")
  }
}
