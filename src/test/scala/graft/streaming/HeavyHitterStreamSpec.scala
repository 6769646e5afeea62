package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.CountMinSketchAgg

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

class HeavyHitterStreamSpec extends AnyFunSuite with SparkSpec {

  private val (depth, width) = (4, 256)

  test("streamed CMS counters equal the batch sketch cell for cell") {
    val dir = Files.createTempDirectory("hh-stream").toFile
    Files.copy(
      new java.io.File("/root/testdata/sf0.001/documents.parquet").toPath,
      new java.io.File(dir, "documents.parquet").toPath)
    val ckpt = Files.createTempDirectory("hh-ckpt").toFile

    val schema = spark.read.parquet(dir.getAbsolutePath).schema
    val toks = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
      .select(explode(expr("filter(split(text, ' '), x -> x <> '')")).as("tok"))

    val q = HeavyHitterStream.counters(toks, "tok", depth, width)
      .writeStream.outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("hh_stream_test").start()
    q.awaitTermination()

    val streamed = spark.table("hh_stream_test").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    val batch = spark.read.parquet(dir.getAbsolutePath)
      .select(explode(expr("filter(split(text, ' '), x -> x <> '')")).as("tok"))
      .agg(GraftBridge.column(
        CountMinSketchAgg(GraftBridge.expression(col("tok")), depth, width)
          .toAggregateExpression()).as("cms"))
      .head().getSeq[Long](0)

    for (d <- 0 until depth; b <- 0 until width) {
      val expected = batch(d * width + b)
      val got = streamed.getOrElse((d, b.toLong), 0L)
      assert(got == expected, s"cell ($d, $b): streamed $got != batch $expected")
    }
    // and the stream held no cells the sketch doesn't
    assert(streamed.keys.forall { case (d, b) => batch(d * width + b.toInt) > 0 })
  }
}
