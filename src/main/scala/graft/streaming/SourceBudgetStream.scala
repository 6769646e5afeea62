package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document at the admission gate. */
final case class BudgetDoc(source: String, doc_id: Long, n_tokens: Long)

/** An admitted document with the source's running token total AFTER it. */
final case class AdmittedDoc(source: String, doc_id: Long, n_tokens: Long, cum_tokens: Long)

/** Streaming per-source token-budget admission — the ingest-time twin of
  * the batch c33_token_budget pass: each source may contribute at most
  * `budget` tokens to the corpus; once a source's running total reaches
  * the budget, its later documents are dropped at the gate instead of
  * accumulating for a compaction pass to remove.
  *
  * Admission rule matches c33 exactly (`spent_before < budget` admits, so
  * the budget-crossing document is kept and everything after it dropped);
  * the ORDER differs by design: the batch pass draws in content-hash
  * order (a replayable pseudo-random sample over a corpus at rest), a
  * stream admits in arrival order — within a micro-batch, deterministic
  * doc_id order (the group iterator's order is not guaranteed, so the
  * transition sorts). First-come admission is the only order an
  * unbounded stream can offer without buffering the world.
  *
  * State is ONE long per source, never evicted (`NoTimeout` — a budget
  * has no event-time horizon): bounded by |sources|, the same cardinality
  * the batch groupBy shuffles. At 100 TB/day rates the stateful shuffle
  * is hash-partitioned on `source`; a hot source funnels its admission
  * decisions through one task by necessity (the running total is a
  * serial dependency), but carries only (source, doc_id, n_tokens) rows
  * — the text column never enters the stateful operator.
  */
object SourceBudgetStream {

  /** Pure per-group transition: fold docs into the running total,
    * admitting while the total BEFORE each doc is under budget. Exposed
    * for direct unit testing.
    */
  def advance(budget: Long, spent: Long, sorted: Seq[BudgetDoc]): (Long, List[AdmittedDoc]) = {
    // prepend + reverse: linear in group size (a hot source's group can
    // be large, and List :+ is O(n) per append)
    val (next, rev) = sorted.foldLeft((spent, List.empty[AdmittedDoc])) { case ((s, acc), d) =>
      if (s < budget)
        (s + d.n_tokens, AdmittedDoc(d.source, d.doc_id, d.n_tokens, s + d.n_tokens) :: acc)
      else (s, acc)
    }
    (next, rev.reverse)
  }

  private def transition(budget: Long)(
      source: String,
      docs: Iterator[BudgetDoc],
      state: GroupState[Long]): Iterator[AdmittedDoc] = {
    val sorted = docs.toSeq.sortBy(_.doc_id)
    val (next, admitted) = advance(budget, state.getOption.getOrElse(0L), sorted)
    state.update(next)
    admitted.iterator
  }

  /** Wire the admission gate over a (streaming) documents frame carrying
    * `source`, `doc_id`, `text` — token counting matches c33's
    * definition (non-empty whitespace tokens).
    */
  def admitted(docs: DataFrame, budget: Long): Dataset[AdmittedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("source"), col("doc_id"),
        size(array_remove(split(col("text"), " "), "")).cast("long").as("n_tokens"))
      .as[BudgetDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        transition(budget))
  }
}
