package graft.functions

import java.security.MessageDigest
import java.util.{HashSet => JHashSet}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash LSH band values of a whitespace-tokenized text column as a
  * native Catalyst expression: band b is the concatenation of hex
  * minhashes m_{4b}..m_{4b+3}, where m_j = min over DISTINCT tokens of
  * lowercase-hex md5("j|" ++ tok) — bit-identical to the declarative
  * postings formulation (min over token instances equals min over the
  * distinct token set; lexicographic order on lowercase hex equals
  * unsigned byte order on the digest, so the kernel compares raw digest
  * bytes and hex-encodes once at the end).
  *
  * Why native: the DataFrame formulation explodes one row per token,
  * DISTINCTs the postings (a shuffle), then aggregates 8 string-mins of
  * `md5(concat("j|", tok))` per posting (a second shuffle). This
  * expression computes all band values in one compiled pass per document
  * — the LSH candidate-generation path becomes scan → native kernel →
  * band join, with NO shuffle before the join. At 100 TB that deletes
  * two full-corpus token shuffles from every dedup run.
  *
  * Returns null for a text with no tokens (such docs have no postings,
  * so the declarative pipeline dropped them); generators skip null, so
  * `posexplode(minhash_bands(text))` reproduces the row set exactly.
  */
final case class MinHashBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHashOps.computeBands(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("bands")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.MinHashOps.computeBands($c.getBytes());
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** Compiled MinHash kernel (parameters fixed to the c1 contract:
  * 8 hashes × 4 per band = 2 bands), shared by interpreted eval and
  * codegen via the static forwarder.
  */
object MinHashOps {

  val NumHashes = 8
  val HashesPerBand = 4
  val NumBands: Int = NumHashes / HashesPerBand

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(NumHashes)(j => s"$j|".getBytes("UTF-8"))

  private val hexChars = "0123456789abcdef".toCharArray

  /** Unsigned lexicographic a < b over equal-length digests. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Band values for UTF-8 `bytes`; null if there are no tokens. Tokens
    * are maximal runs between 0x20 bytes (= regex-split on " "); each
    * distinct token is hashed once per hash function — the HashSet
    * mirrors the postings DISTINCT, saving repeated md5 work on
    * duplicated tokens.
    */
  def computeBands(bytes: Array[Byte]): ArrayData = {
    val md = digests.get()
    val seen = new JHashSet[String]()
    val mins = new Array[Array[Byte]](NumHashes)
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        if (i > start) {
          val tok = new String(bytes, start, i - start, "UTF-8")
          if (seen.add(tok)) {
            var j = 0
            while (j < NumHashes) {
              md.update(prefixes(j))
              md.update(bytes, start, i - start)
              val h = md.digest()
              if (mins(j) == null || less(h, mins(j))) mins(j) = h
              j += 1
            }
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (seen.isEmpty) null
    else {
      val bands = new Array[Any](NumBands)
      var b = 0
      while (b < NumBands) {
        val sb = new java.lang.StringBuilder(HashesPerBand * 32)
        var k = 0
        while (k < HashesPerBand) {
          val h = mins(b * HashesPerBand + k)
          var p = 0
          while (p < 16) {
            sb.append(hexChars((h(p) & 0xf0) >> 4))
            sb.append(hexChars(h(p) & 0x0f))
            p += 1
          }
          k += 1
        }
        bands(b) = UTF8String.fromString(sb.toString)
        b += 1
      }
      new GenericArrayData(bands)
    }
  }
}
