package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

class PurgeStreamSpec extends AnyFunSuite with SparkSpec {

  test("streamed purge gate admits exactly the batch kept set (content closure included)") {
    val src = "/root/testdata/sf0.001/documents.parquet"
    val dir = Files.createTempDirectory("purge-stream").toFile
    Files.copy(new java.io.File(src).toPath,
      new java.io.File(dir, "documents.parquet").toPath)
    val ckpt = Files.createTempDirectory("purge-ckpt").toFile

    val all = spark.read.parquet(src)
    // c63's request rule: ids divisible by 97 are tombstoned — the
    // static set carries HASHES only, so the closure over exact copies
    // comes from the join, not from this projection.
    val tombstones = all.filter(col("doc_id") % 97 === 0)
      .select(md5(col("text").cast("binary")).as("h"))

    val stream = spark.readStream.schema(all.schema).parquet(dir.getAbsolutePath)
    val q = PurgeStream.kept(stream, tombstones)
      .select(col("doc_id"))
      .writeStream.outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("purge_stream_test").start()
    q.awaitTermination()

    val streamed = spark.table("purge_stream_test")
      .collect().map(_.getLong(0)).toSet
    val expected = PurgeStream.kept(all, tombstones)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet

    val total = all.count()
    assert(streamed == expected,
      s"stream/batch divergence: only-stream=${streamed -- expected}, " +
        s"only-batch=${expected -- streamed}")
    assert(streamed.size < total, "the purge must drop at least the request set")
    // the batch c63 audit and the streamed gate must agree on the purge
    // count per construction (same hash closure).
    val purgedBatch = graft.SparkEntry
      .queries("c63_tombstone_purge")(spark, "/root/testdata/sf0.001")
      .agg(sum(col("n_purged"))).collect()(0).getLong(0)
    assert(total - streamed.size == purgedBatch,
      "streamed gate and batch audit disagree on purged-doc count")
  }
}
