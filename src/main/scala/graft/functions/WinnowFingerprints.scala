package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) of a
  * text column as ONE native kernel pass per document: tokenize →
  * k-token shingles (the [[NgramOps]] skip-empty semantics) → md5 per
  * shingle → sliding w-window minimum → per-doc distinct — returning
  * `array<string>` of the distinct window-min md5 hex fingerprints.
  *
  * Why this exists: the relational spelling of the same pipeline
  * (posexplode → md5 expression → `min over (partition by doc order by
  * pos rows w-1 following)` → filter window starts → distinct) pays a
  * FULL SORT of the corpus-sized (doc_id, pos) shingle table inside
  * WindowExec plus a corpus-wide distinct exchange — per-document work
  * the kernel does in one L1-resident pass (10× interleaved A/B on c68:
  * the fingerprint table build drops from the window plan to a scan,
  * see PERF.md r13). Selection is BIT-IDENTICAL to the relational
  * spelling the DuckDB oracle still runs: md5 hex of the UTF-8 shingle
  * bytes, and lexicographic order over equal-length lowercase hex
  * strings IS unsigned numeric order of the 128-bit digest, so the
  * kernel compares two raw longs per step and materializes hex only for
  * selected minima.
  *
  * Window semantics replayed exactly (see Dedup.winnowFingerprints's
  * original spelling): window STARTS are shingle positions
  * 0 … max(0, n−w); a document with fewer than w shingles keeps the
  * single truncated window at position 0 (no non-empty doc fingerprints
  * to ∅); a document with no shingles yields an empty array.
  */
final case class WinnowFingerprints(
    child: Expression,
    k: Int,
    w: Int) extends UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")
  require(w >= 1, s"w must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowOps.fingerprints(input.asInstanceOf[UTF8String].getBytes, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.WinnowOps.fingerprints(
         |  $c.getBytes(), $k, $w);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Compiled winnowing kernel, shared by interpreted eval and codegen. */
object WinnowOps {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexDigits = "0123456789abcdef".getBytes

  /** Distinct window-min md5 fingerprints of the k-token shingles of
    * `bytes` under a w-shingle sliding window; empty when no shingles.
    */
  def fingerprints(bytes: Array[Byte], k: Int, w: Int): ArrayData = {
    val grams = NgramOps.ngrams(bytes, k, Int.MaxValue, skipEmpty = true)
    val n = grams.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // 128-bit digests as (hi, lo) unsigned longs — lexicographic order
    // of the equal-length lowercase hex strings equals unsigned numeric
    // order, so min-selection never needs the hex form.
    val hi = new Array[Long](n)
    val lo = new Array[Long](n)
    val md = md5.get()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(grams.getUTF8String(i).getBytes)
      var h = 0L
      var l = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      while (b < 16) { l = (l << 8) | (d(b) & 0xffL); b += 1 }
      hi(i) = h; lo(i) = l
      i += 1
    }
    @inline def less(a: Int, b: Int): Boolean = {
      val c = java.lang.Long.compareUnsigned(hi(a), hi(b))
      c < 0 || (c == 0 && java.lang.Long.compareUnsigned(lo(a), lo(b)) < 0)
    }
    // monotonic deque over window [p, p+w-1] for p = 0 .. max(0, n-w);
    // ties keep the EARLIEST index (strict less on push-eviction), which
    // selects the same VALUE as the relational MIN either way.
    val lastStart = math.max(0, n - w)
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    val seen = new java.util.LinkedHashSet[(Long, Long)]
    val picked = new java.util.ArrayList[Int]
    var p = 0
    i = 0
    while (p <= lastStart) {
      val end = math.min(p + w - 1, n - 1) // truncated first window
      while (i <= end) {
        while (tail > head && less(i, deque(tail - 1))) tail -= 1
        deque(tail) = i; tail += 1
        i += 1
      }
      while (deque(head) < p) head += 1
      val m = deque(head)
      // distinct on the FULL 128-bit digest value (a boxed pair per
      // selected window — ~2/(w+1) of shingles, not per shingle)
      if (seen.add((hi(m), lo(m)))) picked.add(m)
      p += 1
    }
    // materialize hex only for the selected minima
    val out = new Array[Any](picked.size)
    var o = 0
    while (o < picked.size) {
      val m = picked.get(o)
      val buf = new Array[Byte](32)
      var b = 0
      while (b < 8) {
        buf(b * 2) = HexDigits(((hi(m) >>> (56 - b * 8)) & 0xf0L).toInt >> 4)
        buf(b * 2 + 1) = HexDigits(((hi(m) >>> (56 - b * 8)) & 0x0fL).toInt)
        b += 1
      }
      while (b < 16) {
        buf(b * 2) = HexDigits(((lo(m) >>> (56 - (b - 8) * 8)) & 0xf0L).toInt >> 4)
        buf(b * 2 + 1) = HexDigits(((lo(m) >>> (56 - (b - 8) * 8)) & 0x0fL).toInt)
        b += 1
      }
      out(o) = UTF8String.fromBytes(buf)
      o += 1
    }
    new GenericArrayData(out)
  }
}
