package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.HllDistinct

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchStoreSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def cells(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap

  private def batchDirs(path: String): Seq[String] =
    new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch-"))
      .map(_.getName).toSeq

  test("write + append in halves equals sketching the whole corpus") {
    val path = Files.createTempDirectory("sketch-store").toString + "/regs"
    SketchStore.write(docs.filter(col("doc_id") % 2 === 0), path)
    SketchStore.append(docs.filter(col("doc_id") % 2 =!= 0), path)
    val oneShot = HllDistinct.registerCore(docs, col("source"), col("text"))
    assert(cells(SketchStore.registers(spark, path)) == cells(oneShot),
      "incrementally appended registers must equal the one-shot sketch")
  }

  test("append never touches existing batch dirs; replay is a merged no-op") {
    val path = Files.createTempDirectory("sketch-replay").toString + "/regs"
    SketchStore.write(docs, path)
    val firstBatch = batchDirs(path)
    val before = cells(SketchStore.registers(spark, path))
    SketchStore.append(docs.filter(col("doc_id") % 3 === 0), path)
    assert(batchDirs(path).toSet.intersect(firstBatch.toSet) == firstBatch.toSet,
      "append must only ADD batch dirs — the existing state is never rewritten")
    assert(cells(SketchStore.registers(spark, path)) == before,
      "re-ingesting already-sketched documents must not move any register")
  }

  test("compact folds batches without changing the view; interrupted " +
      "compaction (merged dir present, inputs not yet removed) is harmless") {
    val path = Files.createTempDirectory("sketch-compact").toString + "/regs"
    SketchStore.write(docs.filter(col("doc_id") % 2 === 0), path)
    SketchStore.append(docs.filter(col("doc_id") % 2 =!= 0), path)
    val before = cells(SketchStore.registers(spark, path))
    // simulate the crash window: a fully-committed merged dir coexists
    // with all its inputs — the max-merge makes the duplicate state a
    // no-op at read time
    SketchStore.registers(spark, path).localCheckpoint(true)
      .write.parquet(path + "/batch-crashsim")
    assert(cells(SketchStore.registers(spark, path)) == before,
      "duplicate merged state must not move the view")
    SketchStore.compact(spark, path)
    assert(batchDirs(path).size == 1, "compaction folds to one batch dir")
    assert(cells(SketchStore.registers(spark, path)) == before,
      "compaction must not change the merged view")
  }

  test("a batch appended DURING compaction survives into the next merge") {
    // The r8 TOCTOU (found in review): the merged view's file index was
    // snapshotted when the caller built it, but the delete set was
    // re-listed inside compact — a batch committed between those points
    // was deleted unmerged. The fixed BatchDirs.compact enumerates ONCE
    // and both merges and deletes exactly that list; this test lands a
    // concurrent append inside the merge callback (i.e. after the
    // enumeration, before the delete walk — the worst possible moment)
    // and asserts no register is lost.
    val path = Files.createTempDirectory("sketch-race").toString + "/regs"
    SketchStore.write(docs.filter(col("doc_id") % 2 === 0), path)
    BatchDirs.compact(spark, path, { raw =>
      // a streaming ingest lands mid-compaction
      SketchStore.append(docs.filter(col("doc_id") % 2 =!= 0), path)
      raw.groupBy(col("g"), col("bucket")).agg(max(col("mj")).as("mj"))
    })
    val oneShot = HllDistinct.registerCore(docs, col("source"), col("text"))
    assert(cells(SketchStore.registers(spark, path)) == cells(oneShot),
      "the concurrently appended batch must survive compaction")
    assert(batchDirs(path).size == 2,
      "exactly the folded dir + the concurrent batch dir remain")
  }

  test("an append is invisible until its parquet commit: a half-written " +
      "batch is neither merged-as-empty nor deleted by compact") {
    // The r9-advice window: the parquet writer CREATES its target dir
    // immediately (holding only _temporary task files until job
    // commit), so writing straight to batch-* let a concurrent compact
    // enumerate the dir, merge it as empty, and delete it — losing a
    // batch whose writer went on to report success. The fixed append
    // writes under a hidden .inprogress-* name and publishes with an
    // atomic rename AFTER the commit; this test plants a dir in exactly
    // that mid-flight state and asserts compact neither reads nor
    // removes it.
    val path = Files.createTempDirectory("sketch-inflight").toString + "/regs"
    SketchStore.write(docs.filter(col("doc_id") % 2 === 0), path)
    val inflight = new java.io.File(path, ".inprogress-crashsim")
    assert(inflight.mkdirs())
    Files.writeString(new java.io.File(inflight, "_temporary").toPath, "")
    val before = cells(SketchStore.registers(spark, path))
    SketchStore.compact(spark, path)
    assert(cells(SketchStore.registers(spark, path)) == before,
      "an uncommitted batch must not contribute to the merged view")
    assert(inflight.exists,
      "compact must never delete an append that has not published")
    assert(batchDirs(path).forall(d =>
        new java.io.File(s"$path/$d/_SUCCESS").exists),
      "a visible batch-* dir implies a completed parquet job commit")
  }

  test("overlap readout from the store reproduces c71's estimates") {
    val path = Files.createTempDirectory("sketch-overlap").toString + "/regs"
    SketchStore.write(docs.filter(col("doc_id") % 2 === 0), path)
    SketchStore.append(docs.filter(col("doc_id") % 2 =!= 0), path)
    val fromStore = SketchStore.overlap(spark, path)
      .collect().map(_.toSeq).toSeq
    val declared = graft.SparkEntry
      .queries("c71_overlap_hll")(spark, "/root/testdata/sf0.001")
      .select("source_a", "source_b", "est_a", "est_b", "est_union", "est_shared")
      .collect().map(_.toSeq).toSeq
    assert(fromStore.nonEmpty && fromStore == declared,
      "store readout must reproduce the c71 estimate columns")
  }
}
