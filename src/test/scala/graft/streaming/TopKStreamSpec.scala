package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

class TopKStreamSpec extends AnyFunSuite with SparkSpec {

  test("merge keeps the first K under (value desc, event_id asc), idempotently") {
    def e(id: Long, v: Double) = ScoredEvent("t", id, v)
    val board = TopKStream.merge(Nil, Seq(e(1, 5.0), e(2, 9.0), e(3, 9.0),
      e(4, 1.0), e(5, 7.0), e(6, 3.0)))
    assert(board == Seq(e(2, 9.0), e(3, 9.0), e(5, 7.0), e(1, 5.0), e(6, 3.0)))
    // ties break by event_id; re-merging the same events changes nothing
    // except via the better rows
    assert(TopKStream.merge(board, Seq(e(7, 9.0))) ==
      Seq(e(2, 9.0), e(3, 9.0), e(7, 9.0), e(5, 7.0), e(1, 5.0)))
  }

  test("streamed leaderboard over the real events parquet equals batch d16") {
    // file streaming sources need a DIRECTORY of files
    val dir = Files.createTempDirectory("topk-stream").toFile
    Files.copy(
      new java.io.File("/root/testdata/sf0.001/events.parquet").toPath,
      new java.io.File(dir, "events.parquet").toPath)
    val ckpt = Files.createTempDirectory("topk-ckpt").toFile

    val q = TopKStream.leaderboard(
        EventStream.readEventParquetStream(spark, dir.getAbsolutePath))
      .writeStream.outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("topk_stream_test").start()
    q.awaitTermination()

    // each key's FINAL snapshot = rows carrying its max updates counter
    val emitted = spark.table("topk_stream_test")
    val latest = emitted
      .withColumn("mx", max(col("updates")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))))
      .filter(col("updates") === col("mx"))
    val streamed = latest
      .select(col("event_type"), col("event_id"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    val batch = graft.SparkEntry.queries("d16_topk_native")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, "streamed final leaderboard must equal the batch operator")
  }
}
