package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** q-digest quantile sketch as a native mergeable aggregate (Shrivastava
  * et al., "Medians and Beyond", SenSys 2004 — public) — the 100 TB
  * shape for rank statistics: O(k · log U) longs of state per partial
  * aggregate regardless of row count, counts-add merge, one pass, no
  * sort, no value shuffle (only digests move). This closes the sketch
  * quartet next to Count-Min (frequency, c42), HLL (distinct, c45) and
  * KMV (quantile SAMPLE, c47): q-digest gives deterministic WORST-CASE
  * rank error, `|rank(estimate) − target_rank| ≤ bits·⌊n/k⌋ + 1`,
  * because a value's count can only be absorbed by its ≤ `bits`
  * ancestors and each compressed node holds ≤ ⌊n/k⌋ + sibling mass
  * under the compress invariant.
  *
  * Universe: `[0, 2^bits)` over non-negative longs (callers pre-scale —
  * the c70 query feeds exact price cents). Tree nodes use heap ids
  * (root 1, children 2i/2i+1, leaf for value v = 2^bits + v); state is
  * a nodeId→count map compressed whenever it exceeds 3k entries: any
  * child pair whose (children + parent) mass fits under ⌊n/k⌋ folds
  * into the parent, bottom-up, ids ascending — deterministic for a
  * given buffer. Quantile queries scan nodes in (interval-hi, deeper
  * first) order accumulating counts and report the first node whose
  * running mass reaches the target rank — the classic post-order walk.
  *
  * Estimates are NOT cross-engine replayable (intermediate compressions
  * depend on Spark's nondeterministic merge order), so the c70 query
  * follows the c24 contract: it outputs the EXACT percentiles (oracle-
  * replayable) plus an engine-computed in-band boolean the oracle pins
  * TRUE — the error bound above is the promise a quantile sketch can
  * honestly make cross-engine, and QDigestAggSpec pins the bound under
  * adversarial merge splits.
  */
final case class QDigestAgg(
    child: Expression,
    bits: Int,
    k: Int,
    quantilesPermille: Seq[Int],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Long, Long]] {

  require(bits > 0 && bits <= 40, "universe is [0, 2^bits): bits in (0, 40]")
  require(k >= 8, "compression factor k must be >= 8")
  require(quantilesPermille.nonEmpty &&
    quantilesPermille.forall(q => q >= 1 && q <= 1000),
    "quantiles are permille ranks in [1, 1000]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint column, got ${dt.catalogString}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "qdigest_quantiles"

  private val leafBase = 1L << bits

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long](4 * k)

  override def update(buf: java.util.HashMap[Long, Long],
      input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      require(x >= 0 && x < leafBase,
        s"qdigest value $x outside universe [0, $leafBase) — rescale or raise bits")
      buf.merge(leafBase + x, 1L, (a, b) => a + b)
      if (buf.size > 3 * k) QDigestAgg.compress(buf, k)
    }
    buf
  }

  override def merge(b1: java.util.HashMap[Long, Long],
      b2: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      b1.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (b1.size > 3 * k) QDigestAgg.compress(b1, k)
    b1
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(
      QDigestAgg.quantiles(buf, bits, quantilesPermille))

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val m = new java.util.HashMap[Long, Long](4 * k)
    while (bb.hasRemaining) m.put(bb.getLong, bb.getLong)
    m
  }

  override def withNewMutableAggBufferOffset(offset: Int): QDigestAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QDigestAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QDigestAgg =
    copy(child = newChildren.head)
}

object QDigestAgg {

  /** heap level of a node id (root = 0, leaves = bits). */
  private def level(id: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(id)

  /** Upper bound of the value interval covered by `id` in a
    * `bits`-level tree.
    */
  private[functions] def hi(id: Long, bits: Int): Long = {
    val l = level(id)
    val shift = bits - l
    ((id - (1L << l)) << shift) + (1L << shift) - 1L
  }

  /** Bottom-up deterministic compression: fold any (children, parent)
    * triple whose mass ≤ ⌊n/k⌋ into the parent. Levels deepest-first,
    * ids ascending within a level, so the result is a pure function of
    * the buffer contents.
    */
  private[functions] def compress(buf: java.util.HashMap[Long, Long], k: Int): Unit = {
    var n = 0L
    val vit = buf.values().iterator()
    while (vit.hasNext) n += vit.next()
    val t = n / k
    if (t <= 0) return
    import scala.jdk.CollectionConverters._
    // ids sorted descending ⇒ deepest level first, and within a level we
    // visit the even (left) child of each present pair exactly once.
    val ids = buf.keySet().asScala.toArray.sorted(Ordering[Long].reverse)
    var i = 0
    while (i < ids.length) {
      val id = ids(i)
      // a missing id was already folded this sweep (as the sibling of an
      // earlier id) — skip.
      if (id > 1 && buf.containsKey(id)) {
        val c = buf.get(id)
        val sib = id ^ 1L
        val par = id >>> 1
        val sc = buf.getOrDefault(sib, 0L)
        val pc = buf.getOrDefault(par, 0L)
        if (c + sc + pc <= t) {
          buf.remove(id)
          buf.remove(sib)
          buf.put(par, c + sc + pc)
        }
      }
      i += 1
    }
  }

  /** Quantile estimates for permille targets: scan nodes in (interval
    * hi ascending, deeper node first on tie) order, accumulate counts,
    * report each node's interval-hi when the running mass reaches
    * ceil(q·n/1000).
    */
  private[functions] def quantiles(buf: java.util.HashMap[Long, Long],
      bits: Int, permille: Seq[Int]): Array[Long] = {
    import scala.jdk.CollectionConverters._
    var n = 0L
    val vit = buf.values().iterator()
    while (vit.hasNext) n += vit.next()
    val nodes = buf.entrySet().asScala.toArray
      .map(e => (hi(e.getKey, bits), -level(e.getKey), e.getValue))
      .sortBy(x => (x._1, x._2))
    // The scan needs ascending targets; callers may list quantiles in
    // any order, so sort (target, slot) pairs and write through the
    // original slot index.
    val targets = permille.zipWithIndex
      .map { case (q, slot) => ((q.toLong * n + 999L) / 1000L, slot) }
      .sortBy(_._1)
    val out = new Array[Long](permille.size)
    var qi = 0
    var acc = 0L
    var i = 0
    while (i < nodes.length && qi < targets.size) {
      acc += nodes(i)._3
      while (qi < targets.size && acc >= targets(qi)._1) {
        out(targets(qi)._2) = nodes(i)._1
        qi += 1
      }
      i += 1
    }
    // n ≥ 1 here (eval guards empty) and targets ≤ n, so the scan always
    // fills every slot; the loop structure just makes that explicit.
    out
  }
}
