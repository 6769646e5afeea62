package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a whitespace-tokenized text column as a native
  * Catalyst expression.
  *
  * Semantics are bit-identical to the declarative formulation the DuckDB
  * oracle replays (tokens = `split(text, ' ')` minus empties; per token
  * the first 16 hex digits of `md5(tok)`; signed bit sums s_j over token
  * instances; fingerprint bit j−1 set iff s_j > 0). The hex-digit
  * decomposition collapses to a byte identity: bit j of a token is bit
  * `7−((j−1) mod 8)` of md5 byte `(j−1) div 8` — the big-endian
  * bitstream of the first 8 digest bytes — so the inner loop reads
  * digest bytes directly, no hex string.
  *
  * Why native: the DataFrame formulation explodes one row per token and
  * evaluates 16 digit-decodes plus 64 conditional aggregates per row —
  * a 64-buffer aggregation whose generated update method sits near
  * HotSpot's JIT size limit (see [[LongArrayDot]] for the cliff). This
  * expression computes the whole fingerprint in one compiled loop per
  * document inside whole-stage codegen: no explode, no 64-column
  * partials, no aggregation shuffle.
  *
  * Returns null for a text with no tokens (the declarative pipeline
  * drops such docs at the explode), so callers filter `isNotNull` to
  * keep the row sets identical.
  */
final case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashOps.compute(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("fp")
      s"""
         |java.lang.Long $r = graft.functions.SimHashOps.compute($c.getBytes());
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Compiled SimHash kernel, shared by interpreted eval and codegen (the
  * generated code calls the static forwarder).
  */
object SimHashOps {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** SimHash of UTF-8 `bytes`; null if there are no tokens. Tokens are
    * maximal runs between 0x20 bytes — identical to regex-splitting the
    * string on " " (a UTF-8 continuation byte is ≥ 0x80, so 0x20 only
    * ever encodes a real space).
    */
  def compute(bytes: Array[Byte]): java.lang.Long = {
    val counts = new Array[Int](64)
    val md = digests.get()
    var tokens = 0
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        if (i > start) {
          tokens += 1
          md.update(bytes, start, i - start)
          val h = md.digest() // completes AND resets the digest
          var j = 0
          while (j < 64) {
            val bit = (h(j >> 3) >> (7 - (j & 7))) & 1
            counts(j) += (bit << 1) - 1
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (tokens == 0) null
    else {
      var fp = 0L
      var j = 0
      while (j < 64) {
        if (counts(j) > 0) fp |= 1L << j
        j += 1
      }
      java.lang.Long.valueOf(fp)
    }
  }
}
