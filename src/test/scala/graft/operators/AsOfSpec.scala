package graft.operators

import graft.SparkSpec
import graft.queries.Tables

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("merge-scan as-of equals the join-then-window formulation") {
    val ev = Tables.load(spark, dir, "events")
    // the declarative model the merge scan replaced (kept here as the
    // independent spec model, like DedupSpec does for the native kernels)
    val anchors = ev.filter(col("event_id") % 20 === 0)
      .select(col("event_id").as("anchor_id"), col("user_id"), col("ts").as("anchor_ts"))
    val prior = ev.select(col("user_id"), col("event_id").as("prev_id"),
      col("event_type").as("prev_type"), col("ts").as("prev_ts"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("prev_ts").desc, col("prev_id").desc)
    val model = anchors.join(prior, Seq("user_id"))
      .filter(col("prev_ts") < col("anchor_ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("anchor_id"), col("user_id"), expr("unix_micros(anchor_ts)"),
        col("prev_id"), col("prev_type"), expr("unix_micros(prev_ts)"))
      .orderBy(col("anchor_id"))
      .collect().map(_.toSeq).toSeq

    val merged = AsOf.latestPrior(ev, 20)
      .orderBy(col("anchor_id"))
      .collect().map(r => Seq(r.anchor_id, r.user_id, r.anchor_us,
        r.prev_id, r.prev_type, r.prev_us)).toSeq

    assert(merged.nonEmpty && merged == model)
  }

  test("forward as-of with tolerance equals the join-then-window model") {
    val ev = Tables.load(spark, dir, "events")
    val tolUs = 3600L * 1000000L
    val anchors = ev.filter(col("event_id") % 20 === 0)
      .select(col("event_id").as("anchor_id"), col("user_id"), col("ts").as("anchor_ts"))
    val later = ev.select(col("user_id"), col("event_id").as("next_id"),
      col("event_type").as("next_type"), col("ts").as("next_ts"))
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("next_ts"), col("next_id"))
    val model = anchors.join(later, Seq("user_id"))
      .filter(col("next_ts") > col("anchor_ts") &&
        expr("unix_micros(next_ts) - unix_micros(anchor_ts)") <= tolUs)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("anchor_id"), col("user_id"), expr("unix_micros(anchor_ts)"),
        col("next_id"), col("next_type"), expr("unix_micros(next_ts)"))
      .orderBy(col("anchor_id"))
      .collect().map(_.toSeq).toSeq

    val merged = AsOf.nextWithin(ev, 20, tolUs)
      .orderBy(col("anchor_id"))
      .collect().map(r => Seq(r.anchor_id, r.user_id, r.anchor_us,
        r.prev_id, r.prev_type, r.prev_us)).toSeq

    assert(merged.nonEmpty && merged == model)
    // the tolerance actually bites: unbounded forward matches more anchors
    val unbounded = AsOf.nextWithin(ev, 20, Long.MaxValue).count()
    assert(unbounded > merged.size, "1h tolerance should exclude some matches")
  }

  test("backward tolerance inside the operator equals filter-after-join") {
    val ev = Tables.load(spark, dir, "events")
    val tolUs = 1800L * 1000000L
    // model: unbounded latestPrior then filter the gap — equivalent ONLY
    // because the carried event is the closest prior; the operator's
    // internal single comparison must agree with it
    val model = AsOf.latestPrior(ev, 20)
      .filter(col("anchor_us") - col("prev_us") <= tolUs)
      .orderBy(col("anchor_id")).collect().toSeq
    val op = AsOf.latestPriorWithin(ev, 20, tolUs)
      .orderBy(col("anchor_id")).collect().toSeq
    assert(op == model && op.nonEmpty)
    assert(op.size < AsOf.latestPrior(ev, 20).count(), "the bound should bite")
  }

  test("nearest as-of equals the min-distance join-then-window model, ties backward") {
    val ev = Tables.load(spark, dir, "events")
    val tolUs = 3600L * 1000000L
    // independent model: ALL in-tolerance neighbors either side, ranked
    // by (distance, direction: backward first, then id order within the
    // direction's tie rule) — rank 1 is the nearest with backward ties
    val anchors = ev.filter(col("event_id") % 20 === 0)
      .select(col("event_id").as("anchor_id"), col("user_id"), col("ts").as("anchor_ts"))
    val cand = ev.select(col("user_id"), col("event_id").as("c_id"),
      col("event_type").as("c_type"), col("ts").as("c_ts"))
    val dist = abs(expr("unix_micros(c_ts) - unix_micros(anchor_ts)"))
    val isBack = expr("unix_micros(c_ts) < unix_micros(anchor_ts)")
    // within equal distance: backward beats forward; among equal-ts
    // backward events the HIGHEST id wins (b7 rule), among forward the
    // LOWEST id wins (b7b rule)
    val w = Window.partitionBy(col("anchor_id")).orderBy(col("d"),
      col("back").desc, when(col("back"), -col("c_id")).otherwise(col("c_id")))
    val model = anchors.join(cand, Seq("user_id"))
      .filter(col("c_ts") =!= col("anchor_ts") && dist <= tolUs)
      .withColumn("d", dist).withColumn("back", isBack)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("anchor_id"), col("user_id"), expr("unix_micros(anchor_ts)"),
        col("c_id"), col("c_type"), expr("unix_micros(c_ts)"))
      .orderBy(col("anchor_id"))
      .collect().map(_.toSeq).toSeq

    val merged = AsOf.nearestWithin(ev, 20, tolUs)
      .orderBy(col("anchor_id"))
      .collect().map(r => Seq(r.anchor_id, r.user_id, r.anchor_us,
        r.prev_id, r.prev_type, r.prev_us)).toSeq
    assert(merged.nonEmpty && merged == model)
    // nearest covers at least every anchor either direction matched
    val nBack = AsOf.latestPriorWithin(ev, 20, tolUs).count()
    val nFwd = AsOf.nextWithin(ev, 20, tolUs).count()
    assert(merged.size >= math.max(nBack, nFwd))
  }

  test("plan: the MergeAsOf physical operator, no window or join, no encoders") {
    val p = AsOf.latestPrior(Tables.load(spark, dir, "events"), 20)
      .queryExecution.executedPlan.toString
    assert(p.contains("MergeAsOf"), s"the custom operator must plan:\n$p")
    assert(!p.contains("WindowExec") && !p.toLowerCase.contains("mergejoin") &&
      !p.contains("HashJoin"), "the merge scan must not re-grow a join/window")
    assert(!p.contains("SerializeFromObject") && !p.contains("DeserializeToObject"),
      "rows must stay InternalRow end to end (no object encoders)")
  }

  test("anchor at the exact ts of another event excludes it (strict inequality)") {
    import spark.implicits._
    // user 1: event 10 @t=100, event 11 @t=200, anchor-eligible event
    // 20 @t=200 (same ts as 11). Strict rule: anchor 20 must match
    // event 10 (ts 100), not 11 (ts 200) — equal ts is NOT earlier.
    val ev = Seq(
      (1L, 100L, "a", 10L),
      (1L, 200L, "b", 11L),
      (1L, 200L, "c", 20L))
      .toDF("user_id", "us", "event_type", "event_id")
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"),
        col("event_type"), col("event_id"))
    val hits = AsOf.latestPrior(ev, 20).collect()
    assert(hits.length == 1)
    assert(hits.head.anchor_id == 20L && hits.head.prev_id == 10L &&
      hits.head.prev_us == 100L)
  }
}
