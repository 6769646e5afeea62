package graft.plans

import graft.SparkSpec
import graft.queries.Tables

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("TopK.perKey matches the window row_number formulation exactly") {
    val ev = Tables.load(spark, dir, "events")
    val native = TopK.perKey(ev, Seq("event_type"),
        Seq("value" -> false, "event_id" -> true), 5)
      .select(col("event_type"), col("event_id"), col("value"))
      .orderBy(col("event_type"), col("value").desc, col("event_id"))
      .collect().toSeq
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    val windowed = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("event_type"), col("event_id"), col("value"))
      .orderBy(col("event_type"), col("value").desc, col("event_id"))
      .collect().toSeq
    assert(native == windowed)
  }

  test("TopK.perKey handles keys with fewer than k rows and multi-column keys") {
    import spark.implicits._
    val df = Seq(
      ("a", 1, 1L), ("a", 1, 2L), ("a", 2, 3L),
      ("b", 1, 4L)).toDF("g1", "g2", "v")
    val out = TopK.perKey(df, Seq("g1", "g2"), Seq("v" -> false), 2)
      .orderBy(col("g1"), col("g2"), col("v").desc)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(out == Seq(("a", 1, 2L), ("a", 1, 1L), ("a", 2, 3L), ("b", 1, 4L)))
  }

  test("plan: two-phase heaps around one key exchange, no sort of the input") {
    val ev = Tables.load(spark, dir, "events")
    val df = TopK.perKey(ev, Seq("event_type"),
      Seq("value" -> false, "event_id" -> true), 5)
    // sparkPlan, not executedPlan: AdaptiveSparkPlanExec hides children
    // from collect() before execution (the c20 lesson).
    val p = df.queryExecution.sparkPlan
    val topks = p.collect { case t: TopKPerKeyExec => t }
    assert(topks.map(_.partial).sorted == Seq(false, true),
      "one partial (map-side) and one final TopKPerKeyExec")
    val sorts = p.collect { case s: org.apache.spark.sql.execution.SortExec => s }
    assert(sorts.isEmpty,
      "no SortExec anywhere: the whole point is heaps instead of sorting every row")
    // exchanges are inserted by preparations — count them on the final
    // post-execution plan string
    df.collect()
    // AQE's toString carries Final + Initial sections; count the final only
    val exec = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(exec.split("Exchange hashpartitioning").length == 2,
      s"exactly one key exchange between the phases:\n$exec")
    assert(!exec.contains("Sort "), s"no sort in the executed plan:\n$exec")
  }

  test("optimizer rule rewrites window rn<=k filters to TopKPerKey when rn is dropped") {
    TopKInstall.install(spark)
    val ev = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    def windowed(k: Int) = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("event_type"), col("event_id"), col("value"))
    val df = windowed(5)
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collect { case t: TopKPerKey => t }.nonEmpty,
      s"rule must fire on the rn<=k shape:\n$opt")
    assert(opt.collect {
      case wd: org.apache.spark.sql.catalyst.plans.logical.Window => wd
    }.isEmpty, "the window must be gone")
    assert(opt.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit => g
    }.isEmpty, "the inferred WindowGroupLimit must be subsumed, not kept")
    // row-identical to the un-rewritten formulation (fresh session state
    // not needed: compare against TopK.perKey's direct operator output)
    val direct = TopK.perKey(ev, Seq("event_type"),
        Seq("value" -> false, "event_id" -> true), 5)
      .select(col("event_type"), col("event_id"), col("value"))
      .orderBy(col("event_type"), col("value").desc, col("event_id"))
      .collect().toSeq
    assert(df.orderBy(col("event_type"), col("value").desc, col("event_id"))
      .collect().toSeq == direct)
  }

  test("optimizer rule leaves rank-preserving and global-window shapes alone") {
    TopKInstall.install(spark)
    val ev = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id").asc)
    // rn survives into the output → must stay a window
    val keepsRank = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("event_type"), col("event_id"), col("rn"))
    assert(keepsRank.queryExecution.optimizedPlan
      .collect { case t: TopKPerKey => t }.isEmpty,
      "rank-preserving top-k must not be rewritten (heap emits no rank)")
    // global window (no partition keys) → must stay a window
    val global = ev.withColumn("rn",
        row_number().over(Window.orderBy(col("value").desc, col("event_id"))))
      .filter(col("rn") <= 5)
      .select(col("event_type"), col("event_id"))
    assert(global.queryExecution.optimizedPlan
      .collect { case t: TopKPerKey => t }.isEmpty,
      "global top-k is TakeOrdered's territory, not TopKPerKey's")
  }

  test("partial phase bounds what the exchange moves to k rows per key per partition") {
    import spark.implicits._
    val df = (1 to 10000).map(i => ("k" + (i % 2), i.toLong)).toDF("g", "v")
      .repartition(4)
    val out = TopK.perKey(df, Seq("g"), Seq("v" -> false), 3)
    // correctness of the bound: the final result is still the true top-3
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val expect = Set(("k0", 10000L), ("k0", 9998L), ("k0", 9996L),
      ("k1", 9999L), ("k1", 9997L), ("k1", 9995L))
    assert(got == expect)
  }
}
