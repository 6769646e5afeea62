package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter, as a native
  * Catalyst expression — the scan-side half of a runtime join filter.
  *
  * Why this exists: in a `fact ⋈ filtered_dim` join at 100 TB, most fact
  * rows die in the join — but only AFTER being read, shuffled, and
  * sorted. Probing a Bloom filter of the dim keys inside the fact scan's
  * Filter kills those rows before the exchange, which is where the
  * reference pattern (Spark's own `InjectRuntimeFilter`, Parquet
  * row-group bloom pruning) spends its effort too. This expression makes
  * the pattern explicit and composable: build the filter from any
  * (already filtered) build side with [[graft.operators.RuntimeFilter]],
  * probe it anywhere a boolean Column fits.
  *
  * The filter bytes travel with the expression (serialized plan →
  * executors) and deserialize once per JVM via the transient lazy val;
  * codegen references THIS expression object and calls
  * [[mightContain]], so the probe stays inside whole-stage codegen with
  * no per-row boxing. False positives are possible by construction —
  * callers must keep an exact join downstream (the c36 query's inner
  * join does); false negatives are not, so no matching row is ever lost.
  */
final case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key, got ${dt.catalogString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Public for generated code. */
  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(v: Any): Any = mightContain(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContain($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  // Array[Byte] is reference-equal under the case-class equals, so two
  // probes built from identical filter bytes would never canonicalize
  // together (defeating subexpression elimination / plan reuse).
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)
}

object BloomMightContain {
  /** Round-trip helper: the sketch's own serialization, so the bytes in
    * the expression are exactly what `BloomFilter.readFrom` expects.
    */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
