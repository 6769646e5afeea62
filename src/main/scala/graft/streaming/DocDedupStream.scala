package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact-dedup twin of the batch B1 query: emit each document
  * the FIRST time its content hash is seen, drop every later duplicate.
  * The batch pass dedups a corpus at rest; this is the same decision
  * applied at ingest time, so a continuously-fed corpus never
  * accumulates duplicates in the first place.
  *
  * Mechanics: `dropDuplicatesWithinWatermark` on the content hash keyed
  * by sha2(text) — state holds one (hash → latest-seen-ts) entry per
  * distinct document inside the watermark horizon and is evicted beyond
  * it, so state is bounded by (distinct docs per watermark window), not
  * by stream length. Exact global dedup over an unbounded stream would
  * need unbounded state on ANY engine; bounding by event-time horizon is
  * the standard trade, and the batch b1 pass catches cross-horizon dups
  * during periodic compaction.
  *
  * At scale: state is hash-partitioned on the 32-byte content hash
  * (RocksDB state store on a real cluster); the text column itself never
  * enters state.
  */
object DocDedupStream {

  /** Shared transform: stable content identity for a document row. */
  def withContentHash(docs: DataFrame): DataFrame =
    docs.withColumn("content_hash", sha2(col("text"), 256))

  /** First-seen filter over a streaming (or batch, for parity tests)
    * frame carrying an event-time column `ts`.
    */
  def firstSeen(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    withContentHash(docs)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
