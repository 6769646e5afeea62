package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

import org.scalatest.funsuite.AnyFunSuite

class EventStreamSpec extends AnyFunSuite with SparkSpec {

  test("streaming hourly rollup matches the batch twin on the same data") {
    val dir = Files.createTempDirectory("events-stream").toFile
    val ckpt = Files.createTempDirectory("events-ckpt").toFile
    val lines = Seq(
      """{"event_id":1,"ts":"2024-01-01T00:05:00.000Z","user_id":1,"event_type":"click","value":1.5,"props":"{}"}""",
      """{"event_id":2,"ts":"2024-01-01T00:55:00.000Z","user_id":2,"event_type":"click","value":2.0,"props":"{}"}""",
      """{"event_id":3,"ts":"2024-01-01T01:10:00.000Z","user_id":1,"event_type":"view","value":0.5,"props":"{}"}""",
      """{"event_id":4,"ts":"2024-01-01T01:20:00.000Z","user_id":3,"event_type":"click","value":4.25,"props":"{}"}""")
    Files.write(new java.io.File(dir, "part1.json").toPath, lines.take(2).mkString("\n").getBytes)
    Files.write(new java.io.File(dir, "part2.json").toPath, lines.drop(2).mkString("\n").getBytes)

    val stream = EventStream.readEventStream(spark, dir.getAbsolutePath)
    assert(stream.isStreaming)
    val q = EventStream.start(stream, ckpt.getAbsolutePath)
      .format("memory").queryName("hourly_test").start()
    q.awaitTermination()

    val streamed = spark.table("hourly_test").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventStream.hourlyRollup(
      spark.read.schema(EventStream.eventSchema).json(dir.getAbsolutePath)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(batch == Set(
      ("2024-01-01 00:00:00", "click", 2L, 3.5),
      ("2024-01-01 01:00:00", "view", 1L, 0.5),
      ("2024-01-01 01:00:00", "click", 1L, 4.25)))
  }

  test("streaming the real events parquet equals the b6 batch rollup row-for-row") {
    // The last untested seam between batch and streaming: the b6 query
    // and the stream share hourlyRollup, but only a real readStream over
    // the driver's parquet (TIMESTAMP NANOS and all) proves the two
    // paths agree end to end.
    val dir = "/root/testdata/sf0.001"
    val ckpt = Files.createTempDirectory("b6-ckpt").toFile
    // the file source wants a directory; the testdata table is one file
    val streamDir = Files.createTempDirectory("b6-events").toFile
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      new java.io.File(streamDir, "events.parquet").toPath)
    val stream = EventStream.readEventParquetStream(spark, streamDir.getAbsolutePath)
    assert(stream.isStreaming)
    val q = EventStream.start(stream, ckpt.getAbsolutePath)
      .format("memory").queryName("b6_stream").start()
    q.awaitTermination()

    val streamed = spark.table("b6_stream").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = graft.queries.GroupB.queries("b6_hourly_events")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("footer sniff skips files under hidden directories (_temporary etc)") {
    // A leftover in-progress write (_temporary/0/task_x/part-....parquet)
    // must not be sniffed: its footer may be partial, and Spark's own
    // listing would never read it. The filter has to reject hidden path
    // COMPONENTS, not just hidden file names.
    val dir = "/root/testdata/sf0.001"
    val streamDir = Files.createTempDirectory("sniff-hidden").toFile
    val tmp = new java.io.File(streamDir, "_temporary/0/task_0")
    tmp.mkdirs()
    // a garbage 'parquet' file with a visible name inside the hidden dir
    // — listed FIRST lexicographically, so a name-only filter sniffs it
    Files.write(new java.io.File(tmp, "aaa-part-00000.parquet").toPath,
      Array.fill(128)(0x42.toByte))
    Files.copy(java.nio.file.Paths.get(s"$dir/events.parquet"),
      new java.io.File(streamDir, "events.parquet").toPath)
    // must not throw (sniffing the garbage footer would), and must carry
    // the normalized timestamp schema
    val stream = EventStream.readEventParquetStream(spark, streamDir.getAbsolutePath)
    assert(stream.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }
}
