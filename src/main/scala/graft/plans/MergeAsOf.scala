package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.unsafe.types.UTF8String

/** As-of join as a first-class physical operator (the second custom
  * operator after [[TopKPerKey]], exercising the OTHER required-property
  * axis: `requiredChildOrdering`).
  *
  * Input: one unioned relation of events (tag 1) and anchors (tag 0)
  * with columns (user, ts, tag, id, etype). The operator declares
  * ClusteredDistribution(user) + ordering (user, ts, tag, id) and lets
  * EnsureRequirements plan the exchange and sort — exactly how
  * SortMergeJoin acquires its inputs — then a single streaming pass per
  * partition carries the latest prior event per user and emits one
  * output row per matched anchor. Anchors sort BEFORE events at equal
  * ts (strict prev < anchor rule); ascending id overwrite gives the
  * (ts DESC, id DESC) tiebreak of the window formulation it replaces.
  *
  * vs the typed-Dataset `mapPartitions` version this supersedes: no
  * object encoders anywhere — rows stay Unsafe/Internal end to end,
  * and the carried state is three primitives + one cloned UTF8String.
  */
final case class MergeAsOf(
    user: Expression, ts: Expression, tag: Expression,
    evId: Expression, etype: Expression,
    outputAttrs: Seq[Attribute],
    child: LogicalPlan,
    forward: Boolean = false,
    toleranceUs: Long = Long.MaxValue) extends UnaryNode {
  override def output: Seq[Attribute] = outputAttrs
  // the output attributes are MINTED here (they don't come from the
  // child) — without this the analyzer's missing-attribute check rejects
  // the node
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outputAttrs)
  override protected def withNewChildInternal(newChild: LogicalPlan): MergeAsOf =
    copy(child = newChild)
}

object MergeAsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case MergeAsOf(user, ts, tag, evId, etype, out, child, fwd, tol) =>
      MergeAsOfExec(user, ts, tag, evId, etype, out, planLater(child), fwd, tol) :: Nil
    case _ => Nil
  }
}

/** Physical merge scan. `forward = false` (the default) matches each
  * anchor to its latest strictly-EARLIER event; `forward = true` scans
  * time DESCENDING and matches the earliest strictly-LATER event (the
  * carry only overwrites on strictly-smaller ts, so equal-ts events
  * resolve to the ascending-id winner — pandas merge_asof
  * direction='forward' with allow_exact_matches=False: an equal-ts
  * event never matches in either direction). `toleranceUs` bounds the match gap:
  * because the carried event is by construction the CLOSEST candidate
  * in scan direction, one comparison at the anchor suffices — if it
  * fails, no candidate can pass.
  */
final case class MergeAsOfExec(
    user: Expression, ts: Expression, tag: Expression,
    evId: Expression, etype: Expression,
    outputAttrs: Seq[Attribute],
    child: SparkPlan,
    forward: Boolean = false,
    toleranceUs: Long = Long.MaxValue) extends UnaryExecNode {

  override def output: Seq[Attribute] = outputAttrs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outputAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(user)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(user, Ascending),
      SortOrder(ts, if (forward) org.apache.spark.sql.catalyst.expressions.Descending
                    else Ascending),
      SortOrder(tag, Ascending), SortOrder(evId, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val exprs = Seq(user, ts, tag, evId, etype)
    val childOutput = child.output
    child.execute().mapPartitions ({ iter =>
      val proj = UnsafeProjection.create(exprs, childOutput)
      val toUnsafe = UnsafeProjection.create(outputAttrs, outputAttrs)
      val buf = new GenericInternalRow(6)
      var curUser = 0L
      var hasUser = false
      var lastId = 0L; var lastTs = 0L
      var lastType: UTF8String = null
      var hasLast = false
      iter.flatMap { raw =>
        val r = proj(raw) // reused buffer — read everything before next()
        val u = r.getLong(0)
        if (!hasUser || u != curUser) { curUser = u; hasUser = true; hasLast = false }
        if (r.getInt(2) == 1) {
          // backward: every event overwrites (carry = max ts, max id).
          // forward (ts-descending scan): overwrite only on strictly
          // smaller ts, so equal-ts events keep the FIRST (min id) — the
          // (ts ASC, id ASC) tiebreak of the window formulation.
          if (!forward || !hasLast || r.getLong(1) < lastTs) {
            lastTs = r.getLong(1)
            lastId = r.getLong(3)
            lastType = if (r.isNullAt(4)) null else r.getUTF8String(4).clone()
            hasLast = true
          }
          Iterator.empty
        } else if (!hasLast) Iterator.empty
        else {
          val anchorTs = r.getLong(1)
          val gap = if (forward) lastTs - anchorTs else anchorTs - lastTs
          if (gap > toleranceUs) Iterator.empty
          else {
            buf.update(0, r.getLong(3)) // anchor_id
            buf.update(1, u)
            buf.update(2, anchorTs)
            buf.update(3, lastId)
            buf.update(4, lastType)
            buf.update(5, lastTs)
            Iterator.single(toUnsafe(buf).copy())
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): MergeAsOfExec =
    copy(child = newChild)
}
