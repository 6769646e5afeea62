package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

class DriftStreamSpec extends AnyFunSuite with SparkSpec {

  private val src = "/root/testdata/sf0.001/documents.parquet"

  test("streamed histogram equals batch; drift readout reproduces c48") {
    val dir = Files.createTempDirectory("drift-stream").toFile
    Files.copy(new java.io.File(src).toPath,
      new java.io.File(dir, "documents.parquet").toPath)
    val ckpt = Files.createTempDirectory("drift-ckpt").toFile

    // the c48 v2 projection, arriving as a stream
    def v2(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("doc_id") % 10 =!= 7)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
    val schema = spark.read.parquet(dir.getAbsolutePath).schema
    val q = DriftStream.histogram(
        v2(spark.readStream.schema(schema).parquet(dir.getAbsolutePath)))
      .writeStream.outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("drift_stream_test").start()
    q.awaitTermination()

    val streamed = spark.table("drift_stream_test")
    val batchDocs = spark.read.parquet(dir.getAbsolutePath)
    val batchH2 = DriftStream.histogram(v2(batchDocs))
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells(streamed) == cells(batchH2),
      "streamed histogram must equal the batch histogram cell for cell")

    // readout from the STREAMED table ≡ the declared c48 result
    val baseline = DriftStream.histogram(batchDocs.filter(col("doc_id") % 10 =!= 3))
    val fromStream = DriftStream.drift(baseline, streamed)
      .collect().map(_.toSeq).toSeq
    val declared = graft.SparkEntry
      .queries("c48_snapshot_drift")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    assert(fromStream.nonEmpty && fromStream == declared,
      "drift readout over streamed state must reproduce c48 exactly")
  }
}
