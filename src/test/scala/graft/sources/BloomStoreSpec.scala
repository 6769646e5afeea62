package graft.sources

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomStoreSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  private val key = md5(col("text").cast("binary"))

  private def hits(probed: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
    probed.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap

  test("no false negatives: every ingested key probes true") {
    val bits = BloomStore.bitsOf(docs, key)
    val h = hits(BloomStore.probe(docs, col("doc_id"), key, bits))
    assert(h.size == docs.count())
    assert(h.values.forall(identity),
      "a key that was ingested can never miss — Bloom's defining contract")
  }

  test("false-positive rate stays inside the (nK/M)^K envelope") {
    val bits = BloomStore.bitsOf(docs, key)
    // disjoint probe universe: keys that were never ingested
    val fresh = spark.range(20000).select(col("id"),
      md5(concat(lit("novel|"), col("id").cast("string")).cast("binary")).as("k"))
    val h = hits(BloomStore.probe(fresh, col("id"), col("k"), bits))
    val fp = h.values.count(identity)
    // n=500 keys, K=5, M=2^20 → rate ≈ (2500/1048576)^5 ≈ 8e-14; even
    // granting 6 orders of magnitude of slack, 20k probes stay clean
    assert(fp == 0, s"$fp false positives in 20k probes at ~1e-13 expected rate")
  }

  test("append in halves equals one-shot; replay and compaction are no-ops") {
    val path = Files.createTempDirectory("bloom-store").toString + "/f"
    BloomStore.append(docs.filter(col("doc_id") % 2 === 0), key, path)
    BloomStore.append(docs.filter(col("doc_id") % 2 =!= 0), key, path)
    def cells = BloomStore.words(spark, path).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oneShot = BloomStore.bitsOf(docs, key).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells == oneShot, "halved ingest must OR to the one-shot filter")
    BloomStore.append(docs.filter(col("doc_id") % 3 === 0), key, path)
    assert(cells == oneShot, "re-ingesting sketched docs moves no bit")
    BloomStore.compact(spark, path)
    assert(cells == oneShot, "compaction must not change the merged filter")
    val probed = hits(BloomStore.probe(docs, col("doc_id"),
      key, BloomStore.words(spark, path)))
    assert(probed.values.forall(identity),
      "the persisted filter answers like the inline one")
  }
}
