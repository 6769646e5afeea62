package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque bytes + typed metadata — the multimodal column
  * model (image/audio/video as `binary` with a kind tag). At 100 TB the
  * payload stays columnar (parquet binary, never stringified) and decode
  * runs batched per partition.
  */
final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

/** Decoded features. Decode itself is a STUB (no image/audio libs in this
  * container): [[Multimodal.decodeStub]] derives deterministic fake
  * dimensions from the bytes. The Spark-side plumbing — schema, typed
  * Dataset, per-partition batching, feature extraction shape — is real
  * and tested.
  */
final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    sampled_frames: Int)

object Multimodal {

  /** Deterministic fake decode: dimensions derived from byte length, as a
    * placeholder for a real image/audio decoder (which would run here,
    * batched per partition, exactly this shape).
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.payload.length.toLong
    val frames = (n % 24).toInt + 1
    MediaFeatures(r.media_id, r.kind, n,
      width = (n % 640).toInt, height = ((n * 7) % 480).toInt,
      n_frames = frames, sampled_frames = math.min(frames, 8))
  }

  /** Decode/feature-extract over a typed media Dataset. mapPartitions so a
    * real decoder amortizes model/codec init once per partition.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Demo media table derived from `documents` (text bytes as the opaque
    * payload) — the testdata has no real media; the plumbing is the point.
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
      concat(lit("img/"), col("source")).as("kind"),
      col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Per-kind feature rollup — integer-only aggregates, so the DuckDB
    * oracle can replay the stubbed decode arithmetic exactly.
    */
  def featureSummary(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(spark, docs))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"),
        sum(col("n_frames").cast("long")).as("sum_frames"),
        sum(col("sampled_frames").cast("long")).as("sum_sampled"))
      .orderBy(col("kind"))
  }
}
