package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a native mergeable aggregate — the 100 TB shape
  * for frequency estimation: fixed `depth × width` longs of state per
  * partial aggregate regardless of cardinality, elementwise-add merge,
  * one pass, no token shuffle (only sketches move). Point estimates are
  * `min over d of counter[d][bucket_d(token)]` — never an undercount,
  * overcount bounded by ~N/width per row.
  *
  * Unlike Spark's built-in `count_min_sketch` (and every library
  * sketch), the bucket hash here is REPLAYABLE CROSS-ENGINE: bucket =
  * first 4 md5 hex digits of `"<d>:<token>"` mod width. That makes the
  * whole sketch — not just its error bound — oracle-checkable: the c42
  * DuckDB twin rebuilds every counter with the same arithmetic and
  * hash-matches the estimates. md5-per-update is slower than murmur,
  * which is the price of bit-exact verifiability (same trade as the
  * MinHash/SimHash kernels; at scale the scan dominates either hash).
  *
  * State is `Array[Long]` (row-major, `d * width + b`), serialized as
  * packed big-endian longs between partials.
  */
final case class CountMinSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth > 0 && width > 0 && width <= 65536,
    "bucket ids come from 16 md5 bits: width must be in (0, 65536]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${dt.catalogString}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min_sketch_exactable"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String].toString
      var d = 0
      while (d < depth) {
        buf(d * width + CountMinSketchAgg.bucket(d, tok, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketchAgg =
    copy(child = newChildren.head)
}

object CountMinSketchAgg {

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** The bucket arithmetic as a Column — THE one SQL spelling of
    * [[bucket]] (c42's point-estimate probe and the streaming twin both
    * call this, so batch/stream/oracle can never drift apart;
    * CountMinSketchAggSpec pins it to the JVM hash).
    */
  def bucketColumn(d: Int, tok: org.apache.spark.sql.Column, width: Int)
      : org.apache.spark.sql.Column = {
    require(width > 0 && width <= 65536,
      "bucket ids come from 16 md5 bits: width must be in (0, 65536]")
    import org.apache.spark.sql.{functions => F}
    F.pmod(
      F.conv(F.substring(F.md5(F.concat(F.lit(s"$d:"), tok).cast("binary")), 1, 4), 16, 10)
        .cast("long"),
      F.lit(width.toLong))
  }

  /** bucket(d, tok) = int(first 2 md5 bytes of "d:tok") mod width —
    * identical to SQL `conv(substring(md5('<d>:' || tok), 1, 4), 16, 10)
    * % width` in Spark and the instr-decoded digits in DuckDB.
    */
  def bucket(d: Int, tok: String, width: Int): Int = {
    val m = md5.get()
    m.reset()
    val h = m.digest((d.toString + ":" + tok).getBytes("UTF-8"))
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % width
  }
}
