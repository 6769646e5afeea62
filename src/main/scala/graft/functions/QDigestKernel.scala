package graft.functions

/** Per-partition q-digest building blocks for callers OUTSIDE Spark's
  * aggregation machinery (the c70 columnar kernel builds one digest per
  * (scan partition, flag) directly off ColumnVectors, then merges the
  * bounded partials on the driver in deterministic partition order —
  * see [[graft.operators.ColumnarKernel]]). Thin façade over
  * [[QDigestAgg]]'s `private[functions]` routines so the algorithm has
  * exactly one implementation: the same compress invariant, the same
  * quantile walk, the same serialized layout as the SQL aggregate —
  * the rank-error bound proven in QDigestAggSpec covers both callers.
  */
object QDigestKernel {

  /** Fold the buffer under the ⌊n/k⌋ invariant (deterministic). */
  def compress(buf: LongLongCountMap, k: Int): Unit =
    QDigestAgg.compress(buf, k)

  /** The aggregate's compress trigger: call [[compress]] when
    * `buf.size` exceeds this.
    */
  def compressTrigger(k: Int): Int = QDigestAgg.compressTrigger(k)

  /** Serialize at steady-state size — DELEGATES to the aggregate's own
    * shuffle-layout routine, so the 16-byte entry format and the fold
    * rule have exactly one implementation and the kernel's partials can
    * never drift from what [[QDigestMergeAgg]] deserializes.
    */
  def serialize(buf: LongLongCountMap, k: Int): Array[Byte] =
    QDigestAgg.serializeSteady(buf, k)

  /** Merge a serialized partial into `into` (compressing on trigger). */
  def mergeInto(into: LongLongCountMap, bytes: Array[Byte], k: Int): Unit = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) into.addTo(bb.getLong, bb.getLong)
    if (into.size > QDigestAgg.compressTrigger(k)) QDigestAgg.compress(into, k)
  }

  /** Quantile estimates for permille targets (the aggregate's walk). */
  def quantiles(buf: LongLongCountMap, bits: Int,
      permille: Seq[Int]): Array[Long] =
    QDigestAgg.quantiles(buf, bits, permille)
}
