package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the live twin of the batch
  * `d11_interval_join` query (errors attributed to the 30-minute window
  * after each purchase).
  *
  * Structured Streaming's stream-stream join requires BOTH sides
  * watermarked plus a time-range join condition so state is evictable:
  * a purchase row is held only until the error watermark passes
  * `p_ts + 30 min`, an error row until the purchase watermark passes its
  * own timestamp — state is bounded by (event rate × watermark + window),
  * not by stream length. The join condition is the EXACT range predicate
  * of the batch query; Spark derives the state-cleanup bounds from it.
  *
  * Spark REQUIRES an equality predicate on stream-stream joins (state
  * is keyed by it), which is exactly the batch twin's time-bucket key:
  * the purchase side explodes to the ≤ 2 buckets its interval covers,
  * the error side keeps its single bucket, and the exact range filter
  * rides the same join — identical pairs to the batch plan, asserted by
  * the spec on identical data.
  */
object IntervalJoinStream {

  private val BucketUs = 30L * 60 * 1000000

  /** Join watermarked purchase/error streams on the 30-minute interval.
    * Inputs need columns (event_id, ts) for purchases and (ts) for
    * errors, pre-filtered by type.
    */
  def attribute(purchases: DataFrame, errors: DataFrame): DataFrame = {
    val p = purchases
      .select(col("event_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
      .withColumn("bkt", explode(array(
        expr(s"unix_micros(p_ts) div $BucketUs"),
        expr(s"unix_micros(p_ts) div $BucketUs + 1"))))
    val e = errors
      .select(col("ts").as("e_ts"))
      .withWatermark("e_ts", "1 hour")
      .withColumn("bkt", expr(s"unix_micros(e_ts) div $BucketUs"))
    p.join(e,
      p("bkt") === e("bkt") &&
        col("e_ts") >= col("p_ts") &&
        col("e_ts") < col("p_ts") + expr("INTERVAL 30 MINUTES"))
      .drop("bkt")
  }
}
