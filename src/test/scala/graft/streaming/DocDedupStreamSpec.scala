package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class DocDedupStreamSpec extends AnyFunSuite with SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", TimestampType),
    StructField("text", StringType)))

  test("streaming dedup emits first occurrence only; duplicates within watermark dropped") {
    val dir = Files.createTempDirectory("docs-stream").toFile
    val ckpt = Files.createTempDirectory("docs-ckpt").toFile
    val lines = Seq(
      """{"doc_id":1,"ts":"2024-01-01T00:00:00.000Z","text":"alpha body"}""",
      """{"doc_id":2,"ts":"2024-01-01T00:01:00.000Z","text":"bravo body"}""",
      """{"doc_id":3,"ts":"2024-01-01T00:02:00.000Z","text":"alpha body"}""", // dup of 1
      """{"doc_id":4,"ts":"2024-01-01T00:03:00.000Z","text":"charlie body"}""",
      """{"doc_id":5,"ts":"2024-01-01T00:04:00.000Z","text":"bravo body"}""") // dup of 2
    Files.write(new java.io.File(dir, "a.json").toPath, lines.take(3).mkString("\n").getBytes)
    Files.write(new java.io.File(dir, "b.json").toPath, lines.drop(3).mkString("\n").getBytes)

    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).json(dir.getAbsolutePath)
    assert(stream.isStreaming)
    val q = DocDedupStream.firstSeen(stream).writeStream
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("doc_dedup_test").start()
    q.awaitTermination()

    val kept = spark.table("doc_dedup_test").collect().map(_.getAs[Long]("doc_id")).toSet
    // first occurrence of each distinct text survives; 3 and 5 are dropped
    assert(kept == Set(1L, 2L, 4L))
  }
}
