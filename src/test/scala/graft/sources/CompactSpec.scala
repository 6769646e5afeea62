package graft.sources

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactSpec extends AnyFunSuite with SparkSpec {

  test("compaction: many small files become few size-targeted, key-clustered files") {
    import spark.implicits._
    val in = Files.createTempDirectory("compact-in").toFile.getAbsolutePath
    val out = Files.createTempDirectory("compact-out").toFile.getAbsolutePath

    // 40 small files of shuffled keys
    (1 to 4000).map(i => (i.toLong * 2654435761L % 4096, s"payload $i"))
      .toDF("k", "v")
      .repartition(40)
      .write.mode("overwrite").parquet(in)
    val smallFiles = new java.io.File(in).listFiles
      .count(f => f.getName.endsWith(".parquet"))
    assert(smallFiles == 40)

    val inBytes = new java.io.File(in).listFiles
      .filter(f => f.getName.endsWith(".parquet")).map(_.length).sum
    val n = Compact.compactParquet(spark, in, out, "k", targetBytes = inBytes / 4)

    val outFiles = new java.io.File(out).listFiles
      .filter(f => f.getName.endsWith(".parquet"))
    assert(n >= 4 && n <= 6, s"expected ~4-ish partitions, got $n")
    assert(outFiles.length == n, "one file per range partition")

    // content survives byte-for-byte
    val before = spark.read.parquet(in).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val after = spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before)

    // key-clustered: per-file key ranges must not overlap (range
    // partitioning + in-file sort = selective row-group statistics)
    val ranges = outFiles.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath).agg(min(col("k")), max(col("k"))).head()
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, "file key ranges overlap")
      case _                       => ()
    }
  }
}
