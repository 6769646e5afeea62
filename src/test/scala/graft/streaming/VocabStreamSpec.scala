package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

class VocabStreamSpec extends AnyFunSuite with SparkSpec {

  test("streamed vocab snapshot equals batch vocab; c59 readout identical") {
    val dir = Files.createTempDirectory("vocab-stream").toFile
    Files.copy(
      new java.io.File("/root/testdata/sf0.001/documents.parquet").toPath,
      new java.io.File(dir, "documents.parquet").toPath)
    val ckpt = Files.createTempDirectory("vocab-ckpt").toFile

    val schema = spark.read.parquet(dir.getAbsolutePath).schema
    val docs = spark.readStream.schema(schema)
      // one file per micro-batch exercises the incremental merge path
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.getAbsolutePath)

    val q = VocabStream.vocabCounts(docs)
      .writeStream.outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("vocab_stream_test").start()
    q.awaitTermination()

    val streamed = spark.table("vocab_stream_test")
    val batch = VocabStream.vocabCounts(spark.read.parquet(dir.getAbsolutePath))

    val sRows = streamed.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val bRows = batch.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sRows == bRows, "streamed vocab must equal the batch vocab row for row")
    assert(sRows.nonEmpty)

    // the BPE readout over the streamed snapshot is bit-identical to the
    // batch query (same spelling by construction — this guards the
    // spelling STAYING shared)
    val fromStream = VocabStream.bpePairs(streamed, 30).collect().map(_.toString).toSeq
    val fromBatch = VocabStream.bpePairs(batch, 30).collect().map(_.toString).toSeq
    assert(fromStream == fromBatch)
  }
}
