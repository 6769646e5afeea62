package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

import graft.functions.QDigestAgg

/** Streaming twin of the c70 q-digest quantiles: the digest is a
  * MERGEABLE aggregate, so a keyed streaming `groupBy(...).agg(...)` is
  * the whole operator — Structured Streaming keeps the
  * TypedImperativeAggregate buffer (≤ 6k+1 nodeId→count entries per
  * key) in the state store via the aggregate's own serialize/
  * deserialize, merges each micro-batch's map-side partials into it,
  * and re-emits per-key estimates every trigger. No custom state
  * operator, state bounded regardless of stream length — the live
  * "p50/p99 latency per route" monitor shape at any scale.
  *
  * Same contract caveat as batch c70: the ESTIMATES depend on merge
  * order (here: batch arrival order), so cross-run comparisons assert
  * the rank-error band, not estimate equality — QuantileStreamSpec
  * feeds the same rows streamed-in-batches vs batch-at-once and
  * asserts BOTH land inside the deterministic bits·⌊n/k⌋+1 bound of
  * the exact ranks.
  */
object QuantileStream {

  /** `qdigest_quantiles(valueCol, bits, k, permille…)` as a Column, for
    * batch or streaming aggregation alike.
    */
  def digestCol(valueCol: Column, bits: Int, k: Int,
      permille: Seq[Int]): Column =
    GraftBridge.column(QDigestAgg(
      GraftBridge.expression(valueCol), bits, k, permille)
      .toAggregateExpression())

  /** Per-key streaming quantile estimates: one row per key with
    * `n` and the estimate array, updated every trigger.
    */
  def quantiles(rows: DataFrame, keyCol: String, valueCol: String,
      bits: Int, k: Int, permille: Seq[Int]): DataFrame =
    rows.groupBy(col(keyCol))
      // count(valueCol), not count(*): the digest skips null values, and
      // n must describe the same multiset the digest ingested or a
      // consumer's target rank ceil(q·n/1000) points past the digest's
      // actual mass.
      .agg(count(col(valueCol)).as("n"),
        digestCol(col(valueCol), bits, k, permille).as("est"))
}
