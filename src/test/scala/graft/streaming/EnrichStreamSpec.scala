package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.queries.Tables

import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

class EnrichStreamSpec extends AnyFunSuite with SparkSpec {

  test("stream-static enrichment equals the batch join row-for-row") {
    val dir = "/root/testdata/sf0.001"
    val batchEvents = Tables.load(spark, dir, "events")
    val stats = EnrichStream.typeStats(batchEvents)

    val streamDir = Files.createTempDirectory("enrich-events").toFile
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      new java.io.File(streamDir, "events.parquet").toPath)
    val ckpt = Files.createTempDirectory("enrich-ckpt").toFile
    val stream = EventStream.readEventParquetStream(spark, streamDir.getAbsolutePath)
    assert(stream.isStreaming)

    val q = EnrichStream.enriched(stream, stats).writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("enrich_stream").start()
    q.awaitTermination()

    val streamed = spark.table("enrich_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3))).toSet
    val batch = EnrichStream.enriched(batchEvents, stats).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.exists(_._4) && streamed.exists(!_._4))
  }
}
