package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** The streamed q-digest must carry its batch error contract: estimates
  * from the stream (state merged across micro-batches in arrival order)
  * and from the one-shot batch aggregate both land within the
  * deterministic rank bound of the exact ranks over everything fed.
  */
class QuantileStreamSpec extends AnyFunSuite with SparkSpec {

  private val bits = 16
  private val k = 64

  test("streamed per-key quantiles stay inside the q-digest rank bound") {
    val rnd = new scala.util.Random(11)
    // two keys, skewed values; three parquet files = three micro-batches
    val rows = (1 to 3000).map { i =>
      val key = if (i % 3 == 0) "a" else "b"
      val v = if (rnd.nextBoolean()) rnd.nextInt(128).toLong
              else rnd.nextInt(1 << bits).toLong
      (key, v, i % 3)
    }
    val dir = Files.createTempDirectory("qd-stream").toFile
    import spark.implicits._
    rows.toDF("key", "v", "part").write
      .partitionBy("part").parquet(new java.io.File(dir, "in").getAbsolutePath)
    val ckpt = Files.createTempDirectory("qd-ckpt").toFile

    val inPath = new java.io.File(dir, "in").getAbsolutePath
    val schema = spark.read.parquet(inPath).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inPath)

    val q = QuantileStream.quantiles(stream, "key", "v", bits, k, Seq(500, 900))
      .writeStream.outputMode(OutputMode.Complete()).trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("qd_stream_test").start()
    q.awaitTermination()

    val streamed = spark.table("qd_stream_test").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap

    for (key <- Seq("a", "b")) {
      val vs = rows.collect { case (g, v, _) if g == key => v }
      val n = vs.size.toLong
      val (gotN, est) = streamed(key)
      assert(gotN == n, s"key=$key streamed n")
      val bound = bits.toLong * (n / k) + 1
      for ((qp, e) <- Seq(500, 900).zip(est)) {
        val target = (qp.toLong * n + 999L) / 1000L
        val rLo = vs.count(_ < e).toLong + 1
        val rHi = vs.count(_ <= e).toLong
        assert(target >= rLo - bound && target <= rHi + bound,
          s"key=$key q=$qp est=$e outside rank band $bound")
      }
    }
  }
}
