package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.BloomStore

/** Streaming membership admission gate — the ingest-time twin of c72.
  *
  * c72 audits a stored eval split against the training corpus's Bloom
  * filter. In production the same question is asked of ARRIVING data:
  * "have we already got this?" — and the answer must not cost a corpus
  * scan per micro-batch. The gate probes each incoming document's key
  * against the persisted [[BloomStore]] words table via
  * [[BloomStore.probeJoined]] — K stream-static broadcast joins,
  * STATELESS (append mode, no watermark, no state store), unlike
  * [[IngestDedupStream]]'s candidate aggregation or the keyed-state
  * monitors. A stream restart resumes with zero recovery cost because
  * there is nothing to recover.
  *
  * False positives drop a genuinely-new document (rate is the filter's
  * (nK/M)^K contract — size MBits accordingly); false negatives are
  * impossible, so nothing already ingested ever passes the gate. A
  * NULL key admits (it has no template to match — the c72 rule).
  * MembershipStreamSpec proves the streamed decisions equal the batch
  * probe's row-for-row.
  */
object MembershipStream {

  /** The b1b 4-token-prefix template key c72 gates on. The split is
    * LIMITED to 5 fields: only the first 4 tokens are kept, so
    * tokenizing the other ~50 of an average document (and at real
    * scale, thousands) into throwaway array slots is pure allocation —
    * limit 5 leaves the remainder unsplit in the 5th slot the slice
    * drops. First-4 semantics are identical at any token count.
    */
  def templateKey: Column =
    md5(array_join(slice(split(col("text"), " ", 5), 1, 4), " ").cast("binary"))

  /** Input rows + `bloom_hit` (works identically on a batch frame —
    * the spec's model).
    */
  def gate(batch: DataFrame, bits: DataFrame, key: Column = templateKey): DataFrame =
    BloomStore.probeJoined(batch, key, bits)

  /** Only the documents NOT already present: the admission side. */
  def admitted(batch: DataFrame, bits: DataFrame, key: Column = templateKey): DataFrame =
    gate(batch, bits, key).filter(!col("bloom_hit")).drop("bloom_hit")

  /** Only the suspected re-ingests: the review/reject side. */
  def flagged(batch: DataFrame, bits: DataFrame, key: Column = templateKey): DataFrame =
    gate(batch, bits, key).filter(col("bloom_hit")).drop("bloom_hit")
}
