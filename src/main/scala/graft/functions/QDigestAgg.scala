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
  * a nodeId→count map compressed whenever it exceeds 6k entries (see
  * [[QDigestAgg.compressTrigger]] for the amortization argument): any
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
    weight: Expression = org.apache.spark.sql.catalyst.expressions.Literal(1L),
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongLongCountMap] {

  require(bits > 0 && bits <= 40, "universe is [0, 2^bits): bits in (0, 40]")
  require(k >= 8, "compression factor k must be >= 8")
  require(quantilesPermille.nonEmpty &&
    quantilesPermille.forall(q => q >= 1 && q <= 1000),
    "quantiles are permille ranks in [1, 1000]")

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, weight.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (dt, wt) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint value, bigint weight), got " +
          s"${dt.catalogString} and ${wt.catalogString}")
    }

  override def children: Seq[Expression] = Seq(child, weight)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "qdigest_quantiles"

  private val leafBase = 1L << bits

  override def createAggregationBuffer(): LongLongCountMap = new LongLongCountMap()

  override def update(buf: LongLongCountMap,
      input: InternalRow): LongLongCountMap = {
    val v = child.eval(input)
    if (v != null) {
      // Weighted ingest (a pre-aggregated (value, count) table is the
      // same multiset): a null or zero weight skips the row, like a
      // null value — including the universe check, so a skipped row
      // can't fail the aggregation.
      val w = weight.eval(input)
      if (w != null) {
        val wl = w.asInstanceOf[Long]
        require(wl >= 0, s"qdigest weight $wl is negative")
        if (wl > 0) {
          val x = v.asInstanceOf[Long]
          require(x >= 0 && x < leafBase,
            s"qdigest value $x outside universe [0, $leafBase) — rescale or raise bits")
          buf.addTo(leafBase + x, wl)
          if (buf.size > QDigestAgg.compressTrigger(k)) QDigestAgg.compress(buf, k)
        }
      }
    }
    buf
  }

  override def merge(b1: LongLongCountMap,
      b2: LongLongCountMap): LongLongCountMap = {
    b2.foreachEntry((id, c) => b1.addTo(id, c))
    if (b1.size > QDigestAgg.compressTrigger(k)) QDigestAgg.compress(b1, k)
    b1
  }

  override def eval(buf: LongLongCountMap): Any =
    if (buf.size == 0) null
    else new GenericArrayData(
      QDigestAgg.quantiles(buf, bits, quantilesPermille))

  override def serialize(buf: LongLongCountMap): Array[Byte] =
    QDigestAgg.serializeSteady(buf, k)

  override def deserialize(bytes: Array[Byte]): LongLongCountMap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val m = new LongLongCountMap()
    while (bb.hasRemaining) m.addTo(bb.getLong, bb.getLong)
    m
  }

  override def withNewMutableAggBufferOffset(offset: Int): QDigestAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QDigestAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QDigestAgg =
    copy(child = newChildren.head, weight = newChildren(1))
}

object QDigestAgg {

  /** Compress fires at 6k entries, not at the ~3k the digest converges
    * to after compression: a trigger at the steady-state size makes
    * nearly EVERY insert re-fold the whole buffer (the 3k-trigger cut
    * of c70 measured 6.8 s at sf0.1; 6k trigger + cascading compress +
    * primitive map → digest leg 1.2 s, measured in C70Ab). At 6k the
    * buffer accepts ≥ 3k fresh leaves between folds — amortized
    * O(log) work per insert — while the state stays ≤ 6k+1 entries
    * (~16 B each; ≤ ~200 KB per partial buffer at k = 2048). A 24k
    * trigger was A/B'd in r12 (fewer, larger folds — amortized fold
    * entries per insert 2× → 1.14×) and measured NO change on the
    * nearly-unique price ingest (1.36 vs 1.45 s digest pass at 10×,
    * noise) — the fold is not the marginal cost there — so the
    * smaller-memory setting stays.
    */
  private[functions] def compressTrigger(k: Int): Int = 6 * k

  /** THE serialized partial layout (16-byte (id, count) entries at
    * steady-state ≤ 3k size) — shared by the aggregate's shuffle path
    * and [[QDigestKernel.serialize]] so the kernel's partial format can
    * never drift from what [[QDigestMergeAgg]] expects to merge.
    *
    * Ship partials at steady-state size: a buffer sitting between the
    * 3k post-compress floor and the 6k trigger halves its shuffle
    * bytes by folding first. Safe at any time — each fold respects the
    * same ⌊n/k⌋ invariant the error bound charges against.
    */
  private[functions] def serializeSteady(
      buf: LongLongCountMap, k: Int): Array[Byte] = {
    if (buf.size > 3 * k) compress(buf, k)
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    buf.foreachEntry((id, c) => { bb.putLong(id); bb.putLong(c) })
    bb.array()
  }

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

  /** Bottom-up deterministic CASCADING compression: fold any (children,
    * parent) triple whose mass ≤ ⌊n/k⌋ into the parent, level by level
    * deepest-first with ids ascending within a level; a parent CREATED
    * by a fold joins its level's worklist, so mass keeps climbing in
    * one call until it meets a triple over threshold (the first cut of
    * this routine swept the pre-existing ids once without revisiting
    * fold-created parents — on value-spread data, where siblings rarely
    * co-occur, a sweep then barely shrank the buffer, the size trigger
    * re-fired on every insert, and c70 at sf0.1 cost 6.8 s in repeated
    * O(size log size) sweeps). The result is a pure function of the
    * buffer contents: every visit order is sorted, every fold decision
    * is arithmetic.
    */
  private[functions] def compress(buf: LongLongCountMap, k: Int): Unit = {
    var n = 0L
    buf.foreachEntry((_, c) => n += c)
    val t = n / k
    if (t <= 0) return
    // PRIMITIVE in-place fold (r14 — the original staged the fold in a
    // boxed java.util.HashMap, and at ~1 compress per 3k inserts that
    // boxing was the digest ingest's dominant amortized cost, measured
    // ~200 ns/insert in the ColumnarAb coldig leg). Two observations
    // make the boxed staging unnecessary: (1) heap-id levels occupy
    // NUMERICALLY CONTIGUOUS ranges [2^L, 2^{L+1}), so one primitive
    // sort of the snapshot yields every level's ascending worklist;
    // (2) folding never needs structural remove — zeroing a folded
    // child's count in place (addTo with a negative delta) is
    // equivalent, because counts are otherwise ≥ 1, and the final
    // rebuild drops the zombies. Fold ORDER is identical to the boxed
    // version (deepest level first, ids ascending within a level,
    // fold-created parents merged into their level's worklist in
    // ascending order), so the result is bit-for-bit the same pure
    // function of the buffer contents.
    val size0 = buf.size
    val ids = new Array[Long](size0)
    var w = 0
    buf.foreachEntry { (id, c) => if (c != 0L) { ids(w) = id; w += 1 } }
    val m0 = w
    java.util.Arrays.sort(ids, 0, m0)
    if (m0 == 0) return
    // first index in [0, m0) with ids(i) >= x
    def lowerBound(x: Long): Int = {
      var lo = 0; var hi = m0
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ids(mid) < x) lo = mid + 1 else hi = mid
      }
      lo
    }
    val maxLevel = 63 - java.lang.Long.numberOfLeadingZeros(ids(m0 - 1))
    // parents created while folding level L, ascending by construction
    // (par = id >>> 1 is monotone in id); merged into level L-1's pass
    var created = new Array[Long](64)
    var createdN = 0
    var foldedAny = false
    var lvl = maxLevel
    while (lvl >= 1) {
      val from = lowerBound(1L << lvl)
      val until =
        if (lvl == 63) m0 else lowerBound(1L << (lvl + 1))
      val prevCreated = created
      val prevCreatedN = createdN
      created = new Array[Long](64)
      createdN = 0
      // two-pointer merge of the pre-existing block (ascending) with
      // the parents created one level deeper (ascending)
      var i = from
      var j = 0
      while (i < until || j < prevCreatedN) {
        val id =
          if (j >= prevCreatedN || (i < until && ids(i) <= prevCreated(j))) {
            val x = ids(i); i += 1; x
          } else { val x = prevCreated(j); j += 1; x }
        val c = buf.get(id)
        // c == 0: folded earlier this call (as a sibling), or the
        // merge visited a created parent equal to a pre-existing id
        // twice — either way nothing to do
        if (c != 0L) {
          val sib = id ^ 1L
          val par = id >>> 1
          val sc = buf.get(sib)
          val pc = buf.get(par)
          if (c + sc + pc <= t) {
            foldedAny = true
            buf.addTo(id, -c)
            if (sc != 0L) buf.addTo(sib, -sc)
            if (pc == 0L) {
              if (createdN == created.length)
                created = java.util.Arrays.copyOf(created, createdN * 2)
              created(createdN) = par
              createdN += 1
            }
            buf.addTo(par, c + sc)
          }
        }
      }
      lvl -= 1
    }
    // rebuild without the zero-count zombies (clear keeps capacity);
    // nothing folded ⇒ the buffer is untouched, skip the rebuild
    if (!foldedAny) return
    var liveN = 0
    buf.foreachEntry((_, c) => if (c != 0L) liveN += 1)
    val outIds = new Array[Long](liveN)
    val outCs = new Array[Long](liveN)
    w = 0
    buf.foreachEntry { (id, c) =>
      if (c != 0L) { outIds(w) = id; outCs(w) = c; w += 1 }
    }
    buf.clear()
    var z = 0
    while (z < w) { buf.addTo(outIds(z), outCs(z)); z += 1 }
  }

  /** Quantile estimates for permille targets: scan nodes in (interval
    * hi ascending, deeper node first on tie) order, accumulate counts,
    * report each node's interval-hi when the running mass reaches
    * ceil(q·n/1000).
    */
  private[functions] def quantiles(buf: LongLongCountMap,
      bits: Int, permille: Seq[Int]): Array[Long] = {
    var n = 0L
    buf.foreachEntry((_, c) => n += c)
    val nb = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    buf.foreachEntry((id, c) => nb += ((hi(id, bits), -level(id), c)))
    val nodes = nb.toArray.sortBy(x => (x._1, x._2))
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

/** Open-addressing primitive long→long counter map — the q-digest
  * aggregation buffer. The per-row hot path (`addTo`) is a linear probe
  * over two flat long arrays: no boxing, no Entry objects, no lambda
  * allocation — a boxed `java.util.HashMap` here made the digest update
  * the dominant cost of the whole c70 query. Key 0 is the empty-slot
  * sentinel (q-digest node ids are ≥ 1, counts are ≥ 1). Grows at 0.6
  * load; `clear` keeps capacity (the buffer is immediately refilled by
  * compress). Not thread-safe — a Spark aggregation buffer is
  * single-task.
  */
final class LongLongCountMap(initialCapacity: Int = 4096) extends Serializable {

  private var cap = Integer.highestOneBit(math.max(16, initialCapacity))
  if (cap < initialCapacity) cap <<= 1
  private var mask = cap - 1
  private var ks = new Array[Long](cap)
  private var vs = new Array[Long](cap)
  private var n = 0

  def size: Int = n

  private def slot(key: Long): Int = {
    // splitmix64-style finalizer so adjacent node ids spread
    var h = key * -7046029254386353131L
    h ^= h >>> 32
    h.toInt & mask
  }

  def addTo(key: Long, delta: Long): Unit = {
    // key 0 would silently alias the empty-slot sentinel (vs bumped on
    // an "empty" slot, n not incremented — a corrupt map, not an
    // error). Node ids are ≥ 1 by construction, but deserialize() feeds
    // addTo straight from shuffle bytes, so fail loudly instead of
    // degrading silently; one perfectly-predicted branch on the hot path.
    require(key != 0L, "key 0 is the empty-slot sentinel (node ids are >= 1)")
    var i = slot(key)
    while (true) {
      val kk = ks(i)
      if (kk == key) { vs(i) += delta; return }
      if (kk == 0L) {
        ks(i) = key
        vs(i) = delta
        n += 1
        if (n * 5L >= cap * 3L) grow()
        return
      }
      i = (i + 1) & mask
    }
  }

  def get(key: Long): Long = {
    var i = slot(key)
    while (true) {
      val kk = ks(i)
      if (kk == key) return vs(i)
      if (kk == 0L) return 0L
      i = (i + 1) & mask
    }
    0L
  }

  def foreachEntry(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < cap) {
      if (ks(i) != 0L) f(ks(i), vs(i))
      i += 1
    }
  }

  /** Empty the map, KEEPING the allocated capacity. */
  def clear(): Unit = {
    java.util.Arrays.fill(ks, 0L)
    n = 0
  }

  private def grow(): Unit = {
    val oldKs = ks
    val oldVs = vs
    val oldCap = cap
    cap <<= 1
    mask = cap - 1
    ks = new Array[Long](cap)
    vs = new Array[Long](cap)
    n = 0
    var i = 0
    while (i < oldCap) {
      if (oldKs(i) != 0L) addTo(oldKs(i), oldVs(i))
      i += 1
    }
  }
}
