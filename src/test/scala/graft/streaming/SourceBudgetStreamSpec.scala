package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SourceBudgetStreamSpec extends AnyFunSuite with SparkSpec {

  test("advance: admits while spent is under budget, keeps the crossing doc") {
    def d(id: Long, n: Long) = BudgetDoc("s", id, n)
    val (spent, adm) = SourceBudgetStream.advance(10L, 0L, Seq(d(1, 4), d(2, 5), d(3, 2), d(4, 1)))
    // 4 (cum 4) + 5 (cum 9) admitted; 2 crosses the budget (9 < 10) and
    // is KEPT (cum 11) — the c33 rule; 1 arrives with budget spent.
    assert(adm.map(a => (a.doc_id, a.cum_tokens)) == List((1L, 4L), (2L, 9L), (3L, 11L)))
    assert(spent == 11L)
    // resuming from state: budget already spent, nothing admitted
    val (spent2, adm2) = SourceBudgetStream.advance(10L, spent, Seq(d(5, 1)))
    assert(adm2.isEmpty && spent2 == 11L)
  }

  test("streaming admission caps each source across micro-batches") {
    val dir = Files.createTempDirectory("budget-stream").toFile
    val ckpt = Files.createTempDirectory("budget-ckpt").toFile
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("source", StringType),
      StructField("text", StringType)))
    def line(id: Long, src: String, nTok: Int) =
      s"""{"doc_id":$id,"source":"$src","text":"${Seq.fill(nTok)("w").mkString(" ")}"}"""
    // srcA: 3+3 tokens in micro-batch 1 (admitted, cum 6), 3 more in
    // micro-batch 2 — state says 6 >= budget 5, dropped. srcB stays
    // under budget in both. maxFilesPerTrigger=1 forces two sequential
    // micro-batches within ONE query run (a memory-sink query cannot
    // restart from its checkpoint); explicit mtimes pin the file order.
    val fa = new java.io.File(dir, "a.json")
    val fb = new java.io.File(dir, "b.json")
    Files.write(fa.toPath,
      Seq(line(1, "srcA", 3), line(2, "srcA", 3), line(3, "srcB", 2)).mkString("\n").getBytes)
    Files.write(fb.toPath,
      Seq(line(4, "srcA", 3), line(5, "srcB", 2)).mkString("\n").getBytes)
    fa.setLastModified(1000000000000L)
    fb.setLastModified(1000000060000L)
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).json(dir.getAbsolutePath)
    val q = SourceBudgetStream.admitted(stream, budget = 5L)
      .writeStream.outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .format("memory").queryName("budget_test").start()
    q.awaitTermination()

    val all = spark.table("budget_test").collect()
      .map(r => (r.getLong(1), r.getString(0), r.getLong(3))).toSet
    // batch 1: doc 1 (cum 3), doc 2 (cum 6, crossing doc kept), doc 3
    // (srcB cum 2); batch 2: doc 4 DROPPED (srcA spent 6 >= 5), doc 5
    // admitted (srcB cum 4).
    assert(all == Set((1L, "srcA", 3L), (2L, "srcA", 6L), (3L, "srcB", 2L), (5L, "srcB", 4L)))
  }
}
