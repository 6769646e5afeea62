package graft.functions

import graft.SparkSpec

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The winnowing KERNEL must select bit-identically to the relational
  * spelling it replaced (posexplode → md5 → per-doc window min → filter
  * window starts → distinct) — that spelling is what the DuckDB oracle
  * still runs for c68, so any selection drift is an oracle break.
  * DedupSpec pins the kernel against an independent in-memory model;
  * this spec pins it against the RELATIONAL plan on real corpus text
  * and on adversarial token shapes.
  */
class WinnowOpsSpec extends AnyFunSuite with SparkSpec {

  /** The pre-r13 relational spelling, verbatim. */
  private def relational(docs: DataFrame, k: Int, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .select(col("doc_id"), GraftBridge.column(graft.functions.TokenNgrams(
        GraftBridge.expression(col("text")),
        n = k, maxStarts = Int.MaxValue, skipEmpty = true)).as("gs"))
      .select(col("doc_id"), size(col("gs")).cast("long").as("ng"),
        posexplode(col("gs")))
      .select(col("doc_id"), col("ng"), col("pos").cast("long").as("pos"),
        md5(col("col").cast("binary")).as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    grams.withColumn("wmin", min(col("h")).over(win))
      .filter(col("pos") <= greatest(lit(0L), col("ng") - w))
      .select(col("doc_id"), col("wmin").as("fp"))
      .distinct()
  }

  private def kernel(docs: DataFrame, k: Int, w: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(GraftBridge.column(graft.functions.WinnowFingerprints(
        GraftBridge.expression(col("text")), k, w))).as("fp"))

  private def assertSame(docs: DataFrame, k: Int, w: Int): Unit = {
    val a = kernel(docs, k, w)
    val b = relational(docs, k, w)
    val extra = a.exceptAll(b).count()
    val missing = b.exceptAll(a).count()
    assert(extra == 0 && missing == 0,
      s"kernel vs relational winnowing diverged (k=$k w=$w): " +
        s"$extra extra, $missing missing")
  }

  test("kernel selection equals the relational spelling on real corpus text") {
    val docs = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    assertSame(docs, 4, 8)
  }

  test("kernel equals the relational spelling on other (k, w) shapes") {
    val docs = graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    assertSame(docs, 2, 3)
    assertSame(docs, 1, 1) // w=1: every shingle hash is a fingerprint
    assertSame(docs, 5, 64) // w > every doc: one truncated window each
  }

  test("kernel equals the relational spelling on adversarial token shapes") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // tiny vocab forces repeated shingles (distinct + tie paths), plus
    // empty-ish and whitespace-heavy rows through the skip-empty
    // tokenizer
    val rows = (0L until 200L).map { i =>
      val n = rnd.nextInt(30)
      val toks = Seq.fill(n)(s"t${rnd.nextInt(5)}")
      (i, toks.mkString(if (i % 7 == 0) "  " else " "))
    } :+ (200L, "") :+ (201L, "   ") :+ (202L, "one two three")
    assertSame(rows.toDF("doc_id", "text"), 4, 8)
  }

  test("null text yields null array; empty text yields no fingerprints") {
    import spark.implicits._
    val d = Seq((0L, Some("a b c d e")), (1L, None), (2L, Some("")))
      .toDF("doc_id", "text")
    val arr = d.select(col("doc_id"),
      GraftBridge.column(graft.functions.WinnowFingerprints(
        GraftBridge.expression(col("text")), 4, 8)).as("fps"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[String](1)))
      .toMap
    assert(arr(0L).nonEmpty)
    assert(arr(1L) == null)
    assert(arr(2L) != null && arr(2L).isEmpty)
  }
}
