package graft.sources

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SnapshotManifestSpec extends AnyFunSuite with SparkSpec {

  private def freshDir() =
    Files.createTempDirectory("snapman").toFile.getAbsolutePath

  test("written snapshot validates clean; every shard attested") {
    val dir = freshDir()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    SnapshotManifest.write(docs, col("doc_id"), 8, dir)

    val v = SnapshotManifest.validate(spark, dir).collect()
    assert(v.length == 8, "all 8 shards must appear")
    assert(v.forall(_.getAs[Boolean]("ok")), s"dirty shards: ${v.mkString(", ")}")
    // round trip preserves the data itself
    val back = spark.read.parquet(s"$dir/data").drop("__shard")
    assert(back.count() == docs.count())
  }

  test("tampering flags exactly the touched shard") {
    val dir = freshDir()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    SnapshotManifest.write(docs, col("doc_id"), 8, dir)

    // remove one data file from one shard directory
    val shardDirs = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.startsWith("__shard=")).sortBy(_.getName)
    val victim = shardDirs.head
    val victimShard = victim.getName.stripPrefix("__shard=").toLong
    val parquetFile = victim.listFiles().filter(_.getName.endsWith(".parquet")).head
    assert(parquetFile.delete())

    val v = SnapshotManifest.validate(spark, dir).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[String]("status")).toMap
    assert(v(victimShard) == "missing" || v(victimShard) == "changed",
      s"victim shard must be flagged, got ${v(victimShard)}")
    assert(v.filterNot(_._1 == victimShard).values.forall(_ == "ok"),
      s"untouched shards must stay ok: $v")
  }

  test("changedShards localizes an edit to exactly its shards, no data scan") {
    val v1 = freshDir(); val v2 = freshDir()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    SnapshotManifest.write(docs, col("doc_id"), 8, v1)

    // v2: three docs edited, one deleted — everything else untouched
    val edited = docs
      .withColumn("text",
        when(col("doc_id").isin(3L, 17L, 42L), concat(col("text"), lit(" EDITED")))
          .otherwise(col("text")))
      .filter(col("doc_id") =!= 99L)
    SnapshotManifest.write(edited, col("doc_id"), 8, v2)

    val touched = Seq(3L, 17L, 42L, 99L)
      .map(id => JsonlSink.shardOf(lit(id), 8))
      .map(c => spark.range(1).select(c).head().getLong(0)).toSet

    val d = SnapshotManifest.changedShards(spark, v1, v2).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[String]("status")).toMap
    assert(d.size == 8)
    assert(d.filter(_._2 == "changed").keySet == touched,
      s"changed shards ${d.filter(_._2 == "changed").keySet} != touched $touched")
    assert(d.filterNot(kv => touched(kv._1)).values.forall(_ == "same"),
      s"untouched shards must read same: $d")
  }

  test("vacuum removes exactly the unattested shards and leaves the data valid") {
    val dir = freshDir()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    SnapshotManifest.write(docs, col("doc_id"), 4, dir)

    // plant two orphans: a shard id beyond the manifest's range and a
    // non-shard file that must NOT be touched
    val orphan = new java.io.File(s"$dir/data/__shard=99")
    assert(orphan.mkdirs())
    val junk = new java.io.File(orphan, "part-junk.parquet")
    java.nio.file.Files.write(junk.toPath, Array[Byte](1, 2, 3))
    val stray = new java.io.File(s"$dir/data/notes.txt")
    java.nio.file.Files.write(stray.toPath, "keep".getBytes)

    val before = SnapshotManifest.validate(spark, dir).collect()
      .map(r => r.getAs[Long]("shard") -> r.getAs[String]("status")).toMap
    assert(before(99L) == "unexpected", s"orphan must be flagged first: $before")

    assert(SnapshotManifest.vacuum(spark, dir) == Seq(99L))
    assert(!orphan.exists(), "orphan shard dir must be gone")
    assert(stray.exists(), "non-shard files are not vacuum's business")

    val after = SnapshotManifest.validate(spark, dir).collect()
    assert(after.length == 4 && after.forall(_.getAs[Boolean]("ok")),
      s"post-vacuum snapshot must validate clean: ${after.mkString(", ")}")
    // idempotent: nothing left to remove
    assert(SnapshotManifest.vacuum(spark, dir).isEmpty)
  }

  test("shard assignment is the content-hash rule (stable across runs)") {
    val dir1 = freshDir(); val dir2 = freshDir()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    SnapshotManifest.write(docs, col("doc_id"), 4, dir1)
    // second write from a differently-partitioned input
    SnapshotManifest.write(docs.repartition(13), col("doc_id"), 4, dir2)
    val m1 = spark.read.json(s"$dir1/_manifest").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_rows"), r.getAs[Long]("content_sum"))).toSet
    val m2 = spark.read.json(s"$dir2/_manifest").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("n_rows"), r.getAs[Long]("content_sum"))).toSet
    assert(m1 == m2, "manifest must be a pure function of the data, not its partitioning")
  }
}
