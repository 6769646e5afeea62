package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-STATIC join — the Structured Streaming join mode the other
  * twins don't cover: live events enriched against a static (batch)
  * dimension. No watermark and no state store are involved: the static
  * side is planned like any batch relation (broadcast when small — the
  * classic streaming-enrichment shape), and each micro-batch joins
  * against the CURRENT static plan.
  *
  * The transform is one definition used by both paths, so stream and
  * batch enrichment cannot drift (the EventStream discipline); the
  * above-average test is the same integer cross-multiplication as the
  * batch c29 query (vc·n > tot — no division, exact).
  *
  * At scale: the static stats table is groups-sized (tiny) and
  * broadcast into every micro-batch; the stream side never shuffles
  * for the join at all.
  */
object EnrichStream {

  /** Per-type totals from a BATCH events frame (the static side). */
  def typeStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("vc"))
      .groupBy(col("event_type"))
      .agg(sum(col("vc")).as("tot"), count(lit(1)).as("n"))

  /** Enrich events (batch OR stream) against the static stats: each row
    * gains its type's totals and an exact above-average flag.
    */
  def enriched(events: DataFrame, stats: DataFrame): DataFrame =
    events
      .withColumn("vc", expr("CAST(ROUND(value * 100) AS BIGINT)"))
      .join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"), col("vc"),
        (col("vc") * col("n") > col("tot")).as("above_avg"))
}
