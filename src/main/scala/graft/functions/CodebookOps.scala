package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Large-codebook cell assignment as a COMPILED METHOD CALL instead of
  * an unrolled expression tree.
  *
  * The ≤ HierThreshold paths build the argmax as an `array_max` over
  * one literal-centroid cosine per element — ideal for codegen at 8
  * cells, but the generated source grows linearly in nCells: at 80
  * cells the unrolled 89-dot source cost ~20 s of Janino compilation
  * PER STAGE (measured r7: one ivfTopK call = 24 s driver time, 0.1 s
  * execution), and forcing those trees interpreted (CodegenFallback)
  * traded the compile bomb for ~90 s of boxed tree-walking on the hot
  * path. This file is the third option: the codebook lives in ONE
  * referenced object, the expression's generated code is a single
  * `references[i].cellHier(vec, nv)` call, and the loops are plain
  * Scala that scalac compiled and HotSpot JITs — constant source size
  * in nCells, primitive arithmetic at runtime, identical in codegen and
  * interpreted mode.
  *
  * Semantics are bit-compatible with the expression forms they replace
  * (same cosine arithmetic `(dot/1e8)/(nv·cn)`, ties to the lowest
  * index via strict Double.compare over ascending ids — exactly
  * Spark's struct-max NaN-greatest ordering): [[CodebookCellHier]]
  * mirrors the two-level super→member argmax, [[CodebookTopCells]]
  * mirrors the global explode+window rank-≤-k probe list.
  */
final case class CodebookModel(
    cids: Array[Long],
    vecs: Array[Array[Long]],
    norms: Array[Double],
    superVecs: Array[Array[Long]],
    superNorms: Array[Double],
    members: Array[Array[Int]]) extends Serializable {

  /** Case-class equality over Array fields is reference-based, which
    * would defeat Catalyst's expression canonicalization and
    * subexpression elimination for two expressions built from identical
    * codebooks (correctness unaffected, but equal work would be done
    * twice). Structural equality restores `semanticEquals`.
    */
  override def equals(o: Any): Boolean = o match {
    case that: CodebookModel =>
      java.util.Arrays.equals(cids, that.cids) &&
        java.util.Arrays.equals(norms, that.norms) &&
        java.util.Arrays.equals(superNorms, that.superNorms) &&
        vecs.length == that.vecs.length &&
        vecs.indices.forall(i => java.util.Arrays.equals(vecs(i), that.vecs(i))) &&
        superVecs.length == that.superVecs.length &&
        superVecs.indices.forall(i =>
          java.util.Arrays.equals(superVecs(i), that.superVecs(i))) &&
        members.length == that.members.length &&
        members.indices.forall(i => java.util.Arrays.equals(members(i), that.members(i)))
    case _ => false
  }

  override def hashCode(): Int =
    31 * java.util.Arrays.hashCode(cids) + java.util.Arrays.hashCode(norms)

  /** true iff any slot of the array is null. [[graft.functions.LongArrayDot]]
    * returns null on any null element; the codebook expressions mirror
    * that contract (null in ⇒ null out) instead of reading an undefined
    * slot — see each expression's null guard.
    */
  def hasNullElement(ie: ArrayData): Boolean = {
    val n = ie.numElements()
    var k = 0
    while (k < n) {
      if (ie.isNullAt(k)) return true
      k += 1
    }
    false
  }

  private def dotPrefix(ie: ArrayData, v: Array[Long]): Long = {
    val n = math.min(ie.numElements(), v.length)
    var s = 0L
    var k = 0
    while (k < n) {
      s += ie.getLong(k) * v(k)
      k += 1
    }
    s
  }

  private def cos(ie: ArrayData, v: Array[Long], cn: Double, nv: Double): Double =
    (dotPrefix(ie, v).toDouble / 1.0e8) / (nv * cn)

  /** Two-level assignment: argmax super, then argmax over that super's
    * member cells only — O(√nCells + |members|) dots per row.
    */
  def cellHier(ie: ArrayData, nv: Double): Long = {
    var bestS = 0
    var bestSc = Double.NegativeInfinity
    var s = 0
    while (s < superVecs.length) {
      val c = cos(ie, superVecs(s), superNorms(s), nv)
      if (java.lang.Double.compare(c, bestSc) > 0) { bestSc = c; bestS = s }
      s += 1
    }
    val ms = members(bestS)
    var best = ms(0)
    var bestC = Double.NegativeInfinity
    var i = 0
    while (i < ms.length) {
      val m = ms(i)
      val c = cos(ie, vecs(m), norms(m), nv)
      if (java.lang.Double.compare(c, bestC) > 0) { bestC = c; best = m }
      i += 1
    }
    cids(best)
  }

  @transient private lazy val cidIndex: java.util.HashMap[Long, Integer] = {
    val m = new java.util.HashMap[Long, Integer](cids.length * 2)
    var i = 0
    while (i < cids.length) { m.put(cids(i), i); i += 1 }
    m
  }

  /** Cosine of the vector to the centroid of cell `cid` (NaN for an
    * unknown cid — callers only pass cids produced by [[cellHier]]).
    */
  def cosToCell(ie: ArrayData, nv: Double, cid: Long): Double = {
    val i = cidIndex.get(cid)
    if (i == null) Double.NaN else cos(ie, vecs(i), norms(i), nv)
  }

  /** The `k` globally best cells by cosine (ties → lowest cid), in rank
    * order — the multi-probe list. O(k·nCells) per QUERY row only.
    */
  def topCells(ie: ArrayData, nv: Double, k: Int): ArrayData = {
    val n = vecs.length
    val cs = new Array[Double](n)
    var i = 0
    while (i < n) { cs(i) = cos(ie, vecs(i), norms(i), nv); i += 1 }
    val taken = new Array[Boolean](n)
    val out = new Array[Long](math.min(k, n))
    var r = 0
    while (r < out.length) {
      var best = -1
      var bestC = Double.NegativeInfinity
      i = 0
      while (i < n) {
        if (!taken(i) &&
          (best < 0 || java.lang.Double.compare(cs(i), bestC) > 0)) {
          bestC = cs(i); best = i
        }
        i += 1
      }
      taken(best) = true
      out(r) = cids(best)
      r += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait CodebookExpr { self: BinaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, double), got " +
        s"${l.catalogString} and ${r.catalogString}")
  }
}

/** cell = two-level codebook argmax of the (pre-scaled) vector column —
  * see [[CodebookModel.cellHier]].
  */
final case class CodebookCellHier(left: Expression, right: Expression,
    model: CodebookModel) extends BinaryExpression with CodebookExpr {

  override def dataType: DataType = LongType
  override def prettyName: String = "codebook_cell_hier"

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any, n: Any): Any = {
    val ie = v.asInstanceOf[ArrayData]
    if (model.hasNullElement(ie)) null
    else model.cellHier(ie, n.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val m = ctx.addReferenceObj("codebookModel", model,
        classOf[CodebookModel].getName)
      s"""
         |if ($m.hasNullElement($v)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $m.cellHier($v, $n);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodebookCellHier =
    copy(left = newLeft, right = newRight)
}

/** double cosine of the vector to the centroid of the cell in the third
  * operand — see [[CodebookModel.cosToCell]]. Powers the farthest-member
  * pass of the empty-slot reseeding (split candidates are the members
  * FARTHEST from their centroid).
  */
final case class CodebookCos(first: Expression, second: Expression,
    third: Expression, model: CodebookModel)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), DoubleType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, double, bigint), got " +
          s"${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "codebook_cos"

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any, n: Any, c: Any): Any = {
    val ie = v.asInstanceOf[ArrayData]
    if (model.hasNullElement(ie)) null
    else model.cosToCell(ie, n.asInstanceOf[Double], c.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n, c) => {
      val m = ctx.addReferenceObj("codebookModel", model,
        classOf[CodebookModel].getName)
      s"""
         |if ($m.hasNullElement($v)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $m.cosToCell($v, $n, $c);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): CodebookCos =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** array<bigint> of the `k` best cells in rank order — see
  * [[CodebookModel.topCells]].
  */
final case class CodebookTopCells(left: Expression, right: Expression,
    model: CodebookModel, k: Int) extends BinaryExpression with CodebookExpr {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "codebook_top_cells"

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any, n: Any): Any = {
    val ie = v.asInstanceOf[ArrayData]
    if (model.hasNullElement(ie)) null
    else model.topCells(ie, n.asInstanceOf[Double], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val m = ctx.addReferenceObj("codebookModel", model,
        classOf[CodebookModel].getName)
      s"""
         |if ($m.hasNullElement($v)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $m.topCells($v, $n, $k);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodebookTopCells =
    copy(left = newLeft, right = newRight)
}
