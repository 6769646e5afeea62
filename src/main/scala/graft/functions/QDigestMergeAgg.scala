package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Merge of SERIALIZED q-digest partials into quantile estimates — the
  * reduce side of the columnar digest kernel
  * ([[graft.operators.ColumnarKernel.flagStatsDigestPartials]] emits one
  * bounded serialized digest per (scan partition, flag); this aggregate
  * folds them). Input rows are O(partitions·flags) — tiny — so the
  * TypedImperativeAggregate's interpreted per-row path costs nothing
  * here, while the 6M-row ingest it replaces ran vectorized in the
  * kernel. Same buffer layout, same compress invariant, same quantile
  * walk as [[QDigestAgg]] (shared via [[QDigestKernel]]); merging
  * serialized partials is exactly what QDigestAgg's own shuffle path
  * does between partial and final aggregation, so the rank-error bound
  * (QDigestAggSpec) carries over unchanged — estimates depend on merge
  * order, which is why every caller surfaces only exact values plus an
  * in-band boolean (the c24/c70 contract).
  *
  * Scale note: this is what keeps the kernel 100 TB-sane — partials
  * tree-reduce through ordinary Spark aggregation (map-side partials,
  * one exchange of O(flags) digests), never a driver-side merge loop
  * over O(partitions) buffers.
  */
final case class QDigestMergeAgg(
    child: Expression,
    bits: Int,
    k: Int,
    quantilesPermille: Seq[Int],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongLongCountMap] {

  require(bits > 0 && bits <= 40, "universe is [0, 2^bits): bits in (0, 40]")
  require(k >= 8, "compression factor k must be >= 8")
  require(quantilesPermille.nonEmpty &&
    quantilesPermille.forall(q => q >= 1 && q <= 1000),
    "quantiles are permille ranks in [1, 1000]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary serialized digest, got ${dt.catalogString}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "qdigest_merge"

  override def createAggregationBuffer(): LongLongCountMap = new LongLongCountMap()

  override def update(buf: LongLongCountMap,
      input: InternalRow): LongLongCountMap = {
    val v = child.eval(input)
    if (v != null) {
      QDigestKernel.mergeInto(buf, v.asInstanceOf[Array[Byte]], k)
    }
    buf
  }

  override def merge(b1: LongLongCountMap,
      b2: LongLongCountMap): LongLongCountMap = {
    b2.foreachEntry((id, c) => b1.addTo(id, c))
    if (b1.size > QDigestKernel.compressTrigger(k)) QDigestKernel.compress(b1, k)
    b1
  }

  override def eval(buf: LongLongCountMap): Any =
    if (buf.size == 0) null
    else new GenericArrayData(QDigestKernel.quantiles(buf, bits, quantilesPermille))

  override def serialize(buf: LongLongCountMap): Array[Byte] =
    QDigestKernel.serialize(buf, k)

  override def deserialize(bytes: Array[Byte]): LongLongCountMap = {
    val m = new LongLongCountMap()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) m.addTo(bb.getLong, bb.getLong)
    m
  }

  override def withNewMutableAggBufferOffset(offset: Int): QDigestMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QDigestMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QDigestMergeAgg =
    copy(child = newChildren.head)
}
