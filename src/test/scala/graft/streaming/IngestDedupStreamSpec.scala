package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Dedup

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

class IngestDedupStreamSpec extends AnyFunSuite with SparkSpec {

  test("streamed near-dup hits equal the batch incremental pairs") {
    val src = "/root/testdata/sf0.001/documents.parquet"
    val dir = Files.createTempDirectory("ingest-dedup").toFile
    Files.copy(new java.io.File(src).toPath,
      new java.io.File(dir, "documents.parquet").toPath)
    val ckpt = Files.createTempDirectory("ingest-ckpt").toFile

    val all = spark.read.parquet(src)
    val corpus = all.filter(col("doc_id") % 2 === 0)

    val schema = all.schema
    val stream = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
      .filter(col("doc_id") % 2 === 1)

    val q = IngestDedupStream.hits(stream, corpus, maxHamming = 3)
      .writeStream.outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("ingest_dedup_test").start()
    q.awaitTermination()

    val streamed = spark.table("ingest_dedup_test").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val batchDocs = all.filter(col("doc_id") % 2 === 1)
    val expected = Dedup.incrementalNearDup(corpus, batchDocs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(expected.nonEmpty, "fixture must produce at least one near-dup pair")
    assert(streamed == expected,
      s"stream/batch divergence: only-stream=${streamed -- expected}, " +
        s"only-batch=${expected -- streamed}")
  }
}
