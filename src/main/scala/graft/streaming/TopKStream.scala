package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One scored event entering the leaderboard. */
final case class ScoredEvent(event_type: String, event_id: Long, value: Double)

/** A leaderboard row: `rank` is 1-based within the key. `updates` counts
  * state revisions so a consumer (and the spec) can identify each key's
  * LATEST emission among the per-trigger snapshots Update mode produces.
  */
final case class LeaderRow(
    event_type: String, rank: Int, event_id: Long, value: Double, updates: Long)

/** Per-key leaderboard state between micro-batches (top-level so the
  * state encoder can construct it).
  */
final case class BoardState(rows: Seq[ScoredEvent], updates: Long)

/** Streaming per-key top-k — the live twin of the batch d16 query
  * (`plans.TopKPerKey`): `mapGroupsWithState` folds each micro-batch
  * into a bounded k-row leaderboard per key and emits the refreshed
  * snapshot. State is k rows per key — the same `keys × k` bound as the
  * batch operator's heaps, constant in stream length, so the query runs
  * forever. Ordering matches d16 exactly: value descending, event_id
  * ascending tiebreak.
  */
object TopKStream {

  val K = 5

  /** Pure fold: merge new events into a leaderboard (exposed for unit
    * tests). Keeps the first K under (value desc, event_id asc).
    */
  def merge(current: Seq[ScoredEvent], incoming: Seq[ScoredEvent]): Seq[ScoredEvent] =
    (current ++ incoming)
      .sortBy(e => (-e.value, e.event_id))
      .take(K)

  private def transition(
      key: String,
      events: Iterator[ScoredEvent],
      state: GroupState[BoardState]): Iterator[LeaderRow] = {
    val prev = state.getOption.getOrElse(BoardState(Nil, 0L))
    val next = BoardState(merge(prev.rows, events.toSeq), prev.updates + 1)
    state.update(next)
    next.rows.iterator.zipWithIndex.map { case (e, i) =>
      LeaderRow(key, i + 1, e.event_id, e.value, next.updates)
    }
  }

  /** Wire the leaderboard over a (streaming) events frame. */
  def leaderboard(events: DataFrame): Dataset[LeaderRow] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_type"), col("event_id"), col("value"))
      .as[ScoredEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(transition)
  }
}
