package graft.sources

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusSinkSpec extends AnyFunSuite with SparkSpec {

  test("sharded corpus: lang-partitioned dirs, content preserved, reads prune by lang") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Files.createTempDirectory("graft-corpus").toString
    CorpusSink.writeSharded(docs, out, "lang", col("doc_id"), shards = 4)

    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.forall(_.startsWith("lang=")), s"expected lang= partition dirs, got ${dirs.toSeq}")
    assert(dirs.length > 1, "multiple language partitions")

    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // round trip preserves every row (lang comes back from the dir key)
    val a = docs.select(col("doc_id"), col("lang")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = back.select(col("doc_id"), col("lang")).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    // partition pruning: a single-lang read only touches that lang's files
    val one = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      "lang filter must prune partitions, not scan all dirs")
  }
}
