package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming twin of c44's incremental near-dup: ingest-time admission
  * gating of a live document stream against an existing corpus.
  *
  * Shape: a stream-static equi-join. The static corpus side is the
  * SimHash bands table (at 100 TB precomputed and persisted — exactly
  * the artifact c44's batch path reads), exploded to (band_id, value)
  * keys WITH its full band vector carried along; the streaming side
  * fingerprints each micro-batch's docs the same way. An inner join on
  * (band_id, bv) — stateless for stream-static, no watermark needed —
  * yields candidates with both band vectors in hand, so the exact
  * Hamming verify runs inline in the same projection (no second join,
  * unlike the batch path which joins candidates back to two band
  * tables). One keyed aggregation then collapses multi-band candidate
  * duplicates; its state is bounded by the number of FLAGGED pairs, not
  * stream length — near-dup hits are the rare case by construction.
  *
  * Recall contract is c44's: 4 × 16-bit bands give full recall up to
  * Hamming 3 by pigeonhole (see [[Dedup.simhashNearDup]]).
  */
object IngestDedupStream {

  /** (da = stream doc, db = corpus doc, hamming) for every stream doc
    * within `maxHamming` of a corpus doc. `batch` may be a streaming
    * DataFrame; `corpus` must be static.
    */
  def hits(batch: DataFrame, corpus: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming=$maxHamming exceeds the 4-band recall guarantee (max 3)")
    val cBanded = Dedup.simhashBands(corpus).selectExpr(
      "doc_id AS db", "b0 AS e0", "b1 AS e1", "b2 AS e2", "b3 AS e3",
      Dedup.BandStackSql)
    val bBanded = Dedup.simhashBands(batch).selectExpr(
      "doc_id AS da", "b0 AS a0", "b1 AS a1", "b2 AS a2", "b3 AS a3",
      Dedup.BandStackSql)
    bBanded.join(cBanded, Seq("band_id", "bv"))
      .select(col("da"), col("db"), Dedup.hammingExpr.as("hamming"))
      .filter(col("hamming") <= maxHamming)
      // same pair can match on several bands; min == the value (the
      // Hamming distance of a pair is band-independent)
      .groupBy(col("da"), col("db"))
      .agg(min(col("hamming")).as("hamming"))
  }
}
