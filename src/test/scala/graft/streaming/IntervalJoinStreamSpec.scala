package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IntervalJoinStreamSpec extends AnyFunSuite with SparkSpec {

  test("stream-stream interval join yields the batch d11 pairs on the same data") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("d11-events").toFile
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      new java.io.File(streamDir, "events.parquet").toPath)
    val ckpt = Files.createTempDirectory("d11-ckpt").toFile

    def typed(t: String) = EventStream
      .readEventParquetStream(spark, streamDir.getAbsolutePath)
      .filter(col("event_type") === t)

    val joined = IntervalJoinStream.attribute(typed("purchase"), typed("error"))
    assert(joined.isStreaming)
    val q = joined.writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("d11_stream").start()
    q.awaitTermination()

    // aggregate the streamed pairs batch-side and compare with the
    // batch twin's bucketed equi-join
    val streamed = spark.table("d11_stream")
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_errors"),
        expr("unix_micros(min(e_ts))").as("first_error_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.queries.Relational.queries("d11_interval_join")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
