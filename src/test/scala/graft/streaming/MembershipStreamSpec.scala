package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.BloomStore

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class MembershipStreamSpec extends AnyFunSuite with SparkSpec {

  private val src = "/root/testdata/sf0.001/documents.parquet"

  test("streamed gate decisions equal the batch probe's, statelessly") {
    val dir = Files.createTempDirectory("member-stream").toFile
    Files.copy(new java.io.File(src).toPath,
      new java.io.File(dir, "documents.parquet").toPath)
    val ckpt = Files.createTempDirectory("member-ckpt").toFile

    val docs = spark.read.parquet(dir.getAbsolutePath)
    // corpus filter: half the docs, PERSISTED then read back — the gate
    // probes the store artifact, not an in-session frame
    val store = Files.createTempDirectory("member-bloom").toString + "/f"
    BloomStore.append(docs.filter(col("doc_id") % 2 === 0),
      MembershipStream.templateKey, store)
    val bits = BloomStore.words(spark, store).localCheckpoint(true)

    val schema = docs.schema
    val q = MembershipStream.gate(
        spark.readStream.schema(schema).parquet(dir.getAbsolutePath), bits)
      .select(col("doc_id"), col("bloom_hit"))
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("member_stream_test").start()
    q.awaitTermination()

    def decisions(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val streamed = decisions(spark.table("member_stream_test"))
    val batch = decisions(
      BloomStore.probe(docs, col("doc_id"), MembershipStream.templateKey, bits)
        .withColumnRenamed("id", "doc_id"))
    assert(streamed == batch,
      "streamed gate must decide exactly as the batch probe")
    // every even (ingested) doc is flagged — no false negatives at the gate
    assert(streamed.filter(_._1 % 2 == 0).values.forall(identity))
    // admitted/flagged split the stream exactly
    val admitted = MembershipStream.admitted(docs, bits).count()
    val flagged = MembershipStream.flagged(docs, bits).count()
    assert(admitted + flagged == docs.count())
    assert(flagged == streamed.values.count(identity))
  }
}
