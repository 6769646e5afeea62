package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.HllDistinct

/** Streaming cross-source overlap monitor — the ingest-time twin of c71.
  *
  * c71 estimates pairwise source overlap from per-source HLL registers
  * over a STORED corpus. In production the corpus is arriving; what the
  * monitor maintains incrementally is exactly the register table — a
  * (source, bucket, max-rank) groupBy-max whose streaming state is
  * bounded by |sources|·[[HllDistinct.M]] rows no matter how many
  * documents stream through (the [[DriftStream]]/[[HeavyHitterStream]]
  * split: stream the incrementally-maintainable aggregate, batch the
  * readout). `max` is duplicate-insensitive and order-free, so
  * re-delivered or re-ordered micro-batches can never move a register —
  * the same property that makes the batch sketch partition-invariant.
  *
  * The pairwise union/inclusion-exclusion readout then runs at any
  * cadence over the maintained table via the ONE spelling
  * [[HllDistinct.pairwiseOverlap]] shares with the c71 batch query, so
  * the live monitor and the stored-corpus audit cannot drift.
  * OverlapStreamSpec proves the streamed registers equal the batch
  * registers cell-for-cell and the readout reproduces c71's estimate
  * columns row-for-row.
  */
object OverlapStream {

  /** Incrementally-kept sparse register table of a document stream
    * (works identically on a batch frame — the spec's model).
    */
  def registers(docs: DataFrame): DataFrame =
    HllDistinct.registerCore(docs, col("source"), col("text"))

  /** Overlap readout over the maintained (streamed) register table:
    * frame-complete the sparse state, then c71's pairwise algebra.
    */
  def overlap(regs: DataFrame): DataFrame =
    HllDistinct.pairwiseOverlap(HllDistinct.frameComplete(regs))
}
