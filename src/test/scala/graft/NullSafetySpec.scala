package graft

import graft.functions.TextAnalysis
import graft.operators.Dedup
import graft.streaming.VocabStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The testdata carries no nulls, so the oracle gate can never exercise
  * them — but a library user's corpus will. This spec runs the core
  * operator surfaces over a hostile frame (null text, empty text,
  * whitespace-only text, null lang/source) and pins the BEHAVIOR, not
  * just survival: null/empty docs must drop out of token-derived
  * results rather than crash or fabricate rows.
  */
class NullSafetySpec extends AnyFunSuite with SparkSpec {

  private lazy val hostile = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("lang",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rows = Seq(
      org.apache.spark.sql.Row(0L, "a normal little document", "en", "web", 24L),
      org.apache.spark.sql.Row(1L, null, "en", "web", 0L),
      org.apache.spark.sql.Row(2L, "", null, "web", 0L),
      org.apache.spark.sql.Row(3L, "   ", "en", null, 3L),
      org.apache.spark.sql.Row(4L, "a normal little document", null, null, 24L))
    spark.createDataFrame(rows.asJava, schema)
  }

  test("vocab counts: null/empty/whitespace docs contribute no tokens") {
    val v = VocabStream.vocabCounts(hostile).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("a" -> 2L, "normal" -> 2L, "little" -> 2L, "document" -> 2L),
      s"got $v")
  }

  test("minhash near-dup: degenerate docs produce no bands, pipeline still verifies") {
    val out = Dedup.minhashVerified(hostile, 1).collect()
    // docs 0 and 4 are identical → exactly one candidate pair at J=1.0;
    // the null/empty/whitespace docs must be absent, not paired at 0.
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 4L)))
    assert(out.head.getDouble(3) == 1.0)
  }

  test("quality decisions: every row gets exactly one verdict, nulls included") {
    val d = TextAnalysis.qualityDecisions(hostile)
    val rows = d.collect()
    assert(rows.length == hostile.count().toInt,
      "the gate must classify every row — dropping nulls silently loses data")
    assert(rows.map(_.getAs[String]("reason")).forall(_ != null),
      "every verdict must carry a reason")
  }

  test("HLL registers: null text and null source rows leave no state behind") {
    // null keys would otherwise persist as a junk (g, null, null)
    // register row in OverlapStream's streamed state / SketchStore's
    // parquet (frame completion only hides it at readout)
    val regs = graft.operators.HllDistinct
      .registerCore(hostile, col("source"), col("text")).collect()
    assert(regs.forall(r => !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2)),
      "no register row may carry a null group, bucket or rank")
    // docs 0 and 2 survive (non-null text AND non-null source — the
    // empty string is a real key, the b1 rule); 1 drops on null text,
    // 3/4 on null source. All surviving state belongs to source=web.
    assert(regs.nonEmpty && regs.forall(_.getString(0) == "web"))
    assert(regs.length <= 2, "two surviving docs touch at most two buckets")
  }

  test("exact dedup hash groups nulls together without crashing") {
    val g = hostile
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(g(None) == 1L, "null text hashes to null, its own group")
    assert(g.values.sum == 5L)
  }
}
