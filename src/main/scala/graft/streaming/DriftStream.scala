package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming snapshot-drift monitor — the ingest-time twin of c48.
  *
  * c48 compares two STORED snapshots' token-count histograms per lang
  * (L1 distance). In production the "new" snapshot is usually arriving
  * as a stream; what the monitor maintains incrementally is exactly the
  * histogram — a (lang, n_tokens) count table whose state is bounded by
  * |langs|·|token-count domain| regardless of corpus size (the d8/c47
  * value-domain discipline carried into streaming state). The
  * L1-vs-baseline compare then runs as a cheap batch join over the
  * maintained table at any cadence — the [[HeavyHitterStream]] split:
  * stream the incrementally-maintainable aggregate, batch the readout.
  * DriftStreamSpec proves the streamed table equals the batch histogram
  * cell-for-cell and that the readout reproduces c48's drift report
  * bit-for-bit.
  */
object DriftStream {

  /** Incrementally-kept (lang, n_tokens, cnt) histogram of a document
    * stream (works identically on a batch frame — the spec's model).
    */
  def histogram(docs: DataFrame): DataFrame =
    docs.select(col("lang"), expr(
        "CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT)").as("n_tokens"))
      .groupBy(col("lang"), col("n_tokens"))
      .agg(count(lit(1)).as("cnt"))

  /** Drift readout: per-lang L1 distance between a baseline histogram
    * and a (streamed) current histogram — c48's exact join + aggregate,
    * factored so batch and streaming feed the same spelling. Missing
    * cells on either side count 0 (full-outer + coalesce — the
    * HeavyHitterStream absent-cell rule).
    */
  def drift(baseline: DataFrame, current: DataFrame): DataFrame =
    baseline.select(col("lang"), col("n_tokens"), col("cnt").as("c1"))
      .join(current.select(col("lang"), col("n_tokens"), col("cnt").as("c2")),
        Seq("lang", "n_tokens"), "full_outer")
      .select(col("lang"),
        coalesce(col("c1"), lit(0L)).as("c1"),
        coalesce(col("c2"), lit(0L)).as("c2"))
      .groupBy(col("lang"))
      .agg(sum(expr("abs(c1 - c2)")).as("l1_drift"),
        sum(col("c1")).as("n_v1"), sum(col("c2")).as("n_v2"))
      .orderBy(col("lang"))
}
