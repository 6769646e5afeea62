package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined n-grams of a whitespace-tokenized text column as a
  * native Catalyst expression, replacing the
  * `transform(sequence(...), i -> array_join(slice(toks, i, n), ' '))`
  * higher-order-function formulation — HOFs are CodegenFallback: the
  * lambda is interpreted per ELEMENT with boxed indices, and the split
  * array materializes per row. This expression walks the raw UTF-8
  * bytes once; a raw-adjacency n-gram is even emitted zero-copy (its
  * byte span in the source IS the n-gram).
  *
  * Two tokenization modes, matching the two declarative shapes the
  * suite oracle-checks (both replayed bit-for-bit by DuckDB):
  *
  *  - `skipEmpty = false` (the c23 bigram shape): positions are the RAW
  *    `split(text, ' ')` slots; an n-gram at start i is kept iff all n
  *    member tokens are non-empty, and i is capped at `maxStarts`
  *    starts. Doubled spaces therefore BREAK adjacency — exactly the
  *    `filter(transform(sequence(0, least(size(a)-2, cap)), …))`
  *    semantics.
  *  - `skipEmpty = true` (the c10 shingle shape): positions are the
  *    non-empty tokens (empties removed first), n-grams join n
  *    CONSECUTIVE kept tokens with a single space regardless of the
  *    original separator run length.
  */
final case class TokenNgrams(
    child: Expression,
    n: Int,
    maxStarts: Int,
    skipEmpty: Boolean) extends UnaryExpression {

  require(n >= 1, s"n must be >= 1, got $n")
  require(maxStarts >= 1, s"maxStarts must be >= 1, got $maxStarts")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "token_ngrams"

  override def nullSafeEval(input: Any): Any =
    NgramOps.ngrams(input.asInstanceOf[UTF8String].getBytes, n, maxStarts, skipEmpty)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.NgramOps.ngrams(
         |  $c.getBytes(), $n, $maxStarts, $skipEmpty);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
}

/** Compiled n-gram kernel, shared by interpreted eval and codegen. */
object NgramOps {

  /** All n-gram strings of `bytes` under the [[TokenNgrams]] semantics;
    * an empty array when fewer than n (valid) positions exist.
    */
  def ngrams(bytes: Array[Byte], n: Int, maxStarts: Int, skipEmpty: Boolean): ArrayData = {
    // token slots: starts(t) .. ends(t) (exclusive); raw split yields
    // empty slots at doubled/leading/trailing spaces
    var nTok = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var start = 0
    var i = 0
    val len = bytes.length
    while (i <= len) {
      if (i == len || bytes(i) == 0x20) {
        if (!skipEmpty || i > start) {
          if (nTok == starts.length) {
            starts = java.util.Arrays.copyOf(starts, nTok * 2)
            ends = java.util.Arrays.copyOf(ends, nTok * 2)
          }
          starts(nTok) = start
          ends(nTok) = i
          nTok += 1
        }
        start = i + 1
      }
      i += 1
    }
    val lastStart = math.min(nTok - n, maxStarts - 1)
    if (lastStart < 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](lastStart + 1)
    var s = 0
    while (s <= lastStart) {
      var ok = true
      if (!skipEmpty) {
        var t = s
        while (ok && t < s + n) {
          if (ends(t) == starts(t)) ok = false
          t += 1
        }
      }
      if (ok) {
        if (!skipEmpty) {
          // raw adjacency: the source byte span IS the n-gram
          out.add(UTF8String.fromBytes(bytes, starts(s), ends(s + n - 1) - starts(s)))
        } else {
          var sz = n - 1
          var t = s
          while (t < s + n) { sz += ends(t) - starts(t); t += 1 }
          val buf = new Array[Byte](sz)
          var p = 0
          t = s
          while (t < s + n) {
            if (t > s) { buf(p) = 0x20; p += 1 }
            val l = ends(t) - starts(t)
            System.arraycopy(bytes, starts(t), buf, p, l)
            p += l
            t += 1
          }
          out.add(UTF8String.fromBytes(buf))
        }
      }
      s += 1
    }
    new GenericArrayData(out.toArray)
  }
}
