package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One matched anchor: its latest strictly-earlier same-user event. */
final case class AsOfHit(anchor_id: Long, user_id: Long, anchor_us: Long,
    prev_id: Long, prev_type: String, prev_us: Long)

/** As-of join as a co-partitioned MERGE SCAN — the 100 TB shape.
  *
  * The join-then-window formulation (anchors ⋈ all earlier same-user
  * events, then row_number = 1) materializes O(k²/anchorMod) candidate
  * rows per k-event user before the window throws all but one away —
  * quadratic in per-user history. Here both sides co-partition on
  * user_id (ONE exchange), sort within partitions by (user, ts, tag,
  * id), and a single linear pass emits each anchor's answer directly:
  * zero candidate blow-up, no window, memory O(1) per partition.
  *
  * Ordering encodes the semantics exactly:
  *  - anchors (tag 0) sort BEFORE events (tag 1) at the same timestamp,
  *    so an anchor never sees events at its own ts — the strict
  *    `prev_ts < anchor_ts` rule (an anchor is itself an event row; this
  *    also stops self-matching);
  *  - events at equal ts overwrite in ascending id order, so the carried
  *    `last` is the (max ts, max id) event — the `ORDER BY prev_ts DESC,
  *    prev_id DESC` tiebreak of the window formulation.
  *
  * The merge runs as [[graft.plans.MergeAsOfExec]], a first-class
  * physical operator: it DECLARES ClusteredDistribution(user) +
  * child ordering (user, ts, tag, id) and EnsureRequirements plans the
  * exchange and sort, exactly how SortMergeJoin acquires its inputs —
  * rows stay InternalRow end to end (no object encoders). QueriesSpec +
  * the unchanged b7 oracle prove the operator bit-identical to the
  * declarative window formulation it replaced.
  */
object AsOf {

  /** For each `anchorMod`-th event, the user's latest strictly-earlier
    * event. Anchors with no earlier event are dropped (inner-join
    * semantics, matching the window formulation).
    */
  def latestPrior(ev: DataFrame, anchorMod: Int): Dataset[AsOfHit] =
    asOfJoin(ev, anchorMod, forward = false, toleranceUs = Long.MaxValue)

  /** Backward as-of with tolerance: [[latestPrior]] restricted to
    * matches no more than `toleranceUs` behind the anchor. Inside the
    * operator this is one comparison at the anchor — valid because the
    * carried event is the closest prior, so if IT fails the bound, every
    * other prior does too.
    */
  def latestPriorWithin(ev: DataFrame, anchorMod: Int, toleranceUs: Long): Dataset[AsOfHit] =
    asOfJoin(ev, anchorMod, forward = false, toleranceUs = toleranceUs)

  /** Forward as-of with tolerance: for each anchor, the user's EARLIEST
    * strictly-later event no more than `toleranceUs` ahead (pandas
    * merge_asof direction='forward' with allow_exact_matches=False —
    * an equal-ts event is NOT a match; among equal-ts later events the
    * ascending id wins). Same single merge scan — the carry
    * direction flips via the operator's descending ts ordering, and the
    * tolerance is one comparison at the anchor since the carried event
    * is always the closest candidate.
    */
  def nextWithin(ev: DataFrame, anchorMod: Int, toleranceUs: Long): Dataset[AsOfHit] =
    asOfJoin(ev, anchorMod, forward = true, toleranceUs = toleranceUs)

  /** NEAREST as-of with tolerance (pandas merge_asof
    * direction='nearest' with allow_exact_matches=False): each anchor
    * takes the CLOSER of its backward and forward matches within
    * `toleranceUs`; on an exact distance tie the PRIOR event wins
    * (pandas resolves nearest ties backward). Spelled as the two merge
    * scans composed through a full-outer pick on the anchor id — each
    * direction keeps its optimal one-exchange linear shape, and the
    * pick join moves only matched-anchor rows (|events|/anchorMod at
    * most). A single-pass nearest inside the exec would need an
    * unbounded pending-anchor buffer (an anchor's forward match is
    * unknown until a later event arrives), so the composition IS the
    * scale-safe shape.
    */
  def nearestWithin(ev: DataFrame, anchorMod: Int, toleranceUs: Long): Dataset[AsOfHit] = {
    val spark = ev.sparkSession
    import spark.implicits._
    val b = latestPriorWithin(ev, anchorMod, toleranceUs).toDF()
      .select(col("anchor_id"), col("user_id").as("b_user"),
        col("anchor_us").as("b_anchor_us"), col("prev_id").as("b_id"),
        col("prev_type").as("b_type"), col("prev_us").as("b_us"))
    val f = nextWithin(ev, anchorMod, toleranceUs).toDF()
      .select(col("anchor_id"), col("user_id").as("f_user"),
        col("anchor_us").as("f_anchor_us"), col("prev_id").as("f_id"),
        col("prev_type").as("f_type"), col("prev_us").as("f_us"))
    val useBack = col("f_id").isNull || (col("b_id").isNotNull &&
      (col("b_anchor_us") - col("b_us")) <= (col("f_us") - col("f_anchor_us")))
    b.join(f, Seq("anchor_id"), "full_outer")
      .select(col("anchor_id"),
        coalesce(col("b_user"), col("f_user")).as("user_id"),
        coalesce(col("b_anchor_us"), col("f_anchor_us")).as("anchor_us"),
        when(useBack, col("b_id")).otherwise(col("f_id")).as("prev_id"),
        when(useBack, col("b_type")).otherwise(col("f_type")).as("prev_type"),
        when(useBack, col("b_us")).otherwise(col("f_us")).as("prev_us"))
      .as[AsOfHit]
  }

  private def asOfJoin(
      ev: DataFrame, anchorMod: Int,
      forward: Boolean, toleranceUs: Long): Dataset[AsOfHit] = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.{LongType, StringType}
    val spark = ev.sparkSession
    import spark.implicits._
    val events = ev.select(col("user_id"), expr("unix_micros(ts)").as("ts_us"),
      lit(1).as("tag"), col("event_id").as("id"), col("event_type").as("etype"))
    val anchors = ev.filter(col("event_id") % anchorMod === 0)
      .select(col("user_id"), expr("unix_micros(ts)").as("ts_us"),
        lit(0).as("tag"), col("event_id").as("id"),
        lit(null).cast("string").as("etype"))
    val union = events.union(anchors)
    val analyzed = union.queryExecution.analyzed
    def attr(n: String) = analyzed.output.find(_.name == n).getOrElse(
      throw new IllegalStateException(s"missing column $n"))
    if (!spark.experimental.extraStrategies.contains(graft.plans.MergeAsOfStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.MergeAsOfStrategy
    }
    val out = Seq(
      AttributeReference("anchor_id", LongType, nullable = false)(),
      AttributeReference("user_id", LongType, nullable = false)(),
      AttributeReference("anchor_us", LongType, nullable = false)(),
      AttributeReference("prev_id", LongType, nullable = false)(),
      AttributeReference("prev_type", StringType, nullable = true)(),
      AttributeReference("prev_us", LongType, nullable = false)())
    GraftBridge.ofRows(spark, graft.plans.MergeAsOf(
      attr("user_id"), attr("ts_us"), attr("tag"), attr("id"), attr("etype"),
      out, analyzed, forward, toleranceUs)).as[AsOfHit]
  }
}
