package graft.sources

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JsonlSinkSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "lang", "text")

  test("sharded JSONL roundtrip: every row survives, shards are stable") {
    val dir = Files.createTempDirectory("jsonl").toFile.getAbsolutePath
    JsonlSink.write(docs, col("doc_id"), nShards = 4, dir)

    val dirs = new java.io.File(dir).listFiles.filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("shard=0", "shard=1", "shard=2", "shard=3"))

    val back = spark.read.json(dir)
    assert(back.count() == docs.count())
    // row-level equality (shard column added by the partitioned layout)
    val beforeRows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val afterRows = back.select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(afterRows.toSeq == beforeRows.toSeq)

    // every row is in ITS shard (the content-hash contract)
    val misplaced = back
      .withColumn("expect", JsonlSink.shardOf(col("doc_id"), 4))
      .filter(col("shard") =!= col("expect")).count()
    assert(misplaced == 0)

    // a rewrite produces the identical per-shard row sets
    val dir2 = Files.createTempDirectory("jsonl2").toFile.getAbsolutePath
    JsonlSink.write(docs, col("doc_id"), nShards = 4, dir2)
    def shardSets(d: String) = spark.read.json(d)
      // partition discovery types shard= dirs as int; normalize
      .select(col("shard").cast("long"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(shardSets(dir) == shardSets(dir2))
  }

  test("gzip variant writes .gz files readable back") {
    val dir = Files.createTempDirectory("jsonlgz").toFile.getAbsolutePath
    JsonlSink.write(docs, col("doc_id"), nShards = 2, dir, gzip = true)
    val gzFiles = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles).filter(_.getName.endsWith(".json.gz"))
    assert(gzFiles.nonEmpty, "compressed shards must carry the .gz suffix")
    assert(spark.read.json(dir).count() == docs.count())
  }
}
