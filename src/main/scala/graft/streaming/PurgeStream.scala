package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of c63's deletion-request propagation: the
  * right-to-be-forgotten purge applied at ingest time, so deleted
  * content never re-enters the corpus through a re-crawl or mirror.
  *
  * Shape: a stream-static LEFT ANTI join on the 16-byte content hash.
  * The static side is the distinct tombstone-hash set (at scale the
  * persisted artifact c63's batch audit produces); the streaming side
  * hashes each micro-batch's text inline. Like c63, the gate closes
  * over CONTENT, not ids — an exact copy of a deleted document is
  * rejected no matter what doc_id the new crawl assigned it. The join
  * is stateless for stream-static (no watermark, no state store), so
  * the gate adds one broadcast-or-keyed lookup per micro-batch and
  * nothing else; document text never shuffles (the hash is computed
  * in the scan projection).
  */
object PurgeStream {

  /** Documents surviving the purge. `docs` may be a streaming DataFrame
    * with a `text` column; `tombstoneHashes` must be static with an `h`
    * column of md5 hex strings (dedup'd here defensively).
    */
  def kept(docs: DataFrame, tombstoneHashes: DataFrame): DataFrame =
    docs.withColumn("h", md5(col("text").cast("binary")))
      .join(tombstoneHashes.select(col("h")).distinct(), Seq("h"), "left_anti")
      .drop("h")
}
