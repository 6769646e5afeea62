package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Merge-scan as-of join input row: anchors (tag 0) and candidate prior
  * events (tag 1) in one relation, timestamps as unix micros.
  */
final case class AsOfIn(user_id: Long, ts_us: Long, tag: Int, id: Long, etype: String)

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
  * mapPartitions is justified here (the brief's last-resort clause):
  * the merge is genuinely per-partition imperative state — one carried
  * row — that no built-in operator expresses without the quadratic
  * intermediate. QueriesSpec + the unchanged b7 oracle prove the
  * rewrite bit-identical to the declarative window formulation.
  */
object AsOf {

  /** For each `anchorMod`-th event, the user's latest strictly-earlier
    * event. Anchors with no earlier event are dropped (inner-join
    * semantics, matching the window formulation).
    */
  def latestPrior(ev: DataFrame, anchorMod: Int): Dataset[AsOfHit] = {
    val spark = ev.sparkSession
    import spark.implicits._
    val events = ev.select(col("user_id"), expr("unix_micros(ts)").as("ts_us"),
      lit(1).as("tag"), col("event_id").as("id"), col("event_type").as("etype"))
      .as[AsOfIn]
    val anchors = ev.filter(col("event_id") % anchorMod === 0)
      .select(col("user_id"), expr("unix_micros(ts)").as("ts_us"),
        lit(0).as("tag"), col("event_id").as("id"),
        lit(null).cast("string").as("etype"))
      .as[AsOfIn]
    events.union(anchors)
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"), col("tag"), col("id"))
      .mapPartitions { it =>
        var curUser = Long.MinValue
        var last: AsOfIn = null
        it.flatMap { r =>
          if (r.user_id != curUser) { curUser = r.user_id; last = null }
          if (r.tag == 1) { last = r; Iterator.empty }
          else if (last == null) Iterator.empty
          else Iterator.single(
            AsOfHit(r.id, r.user_id, r.ts_us, last.id, last.etype, last.ts_us))
        }
      }
  }
}
