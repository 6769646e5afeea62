package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.CountMinSketchAgg

/** Streaming twin of the c42 Count-Min sketch: the sketch IS a keyed
  * count. Each token updates `depth` (d, bucket) cells; maintained as a
  * `groupBy(d, b).count()`, the counter table is a distributive
  * aggregate Structured Streaming keeps incrementally — no custom state
  * operator, ≤ depth×width rows of state total regardless of stream
  * length, and partial aggregation still combines map-side within every
  * micro-batch.
  *
  * The bucket arithmetic is the SQL spelling pinned (by
  * CountMinSketchAggSpec) to `CountMinSketchAgg.bucket`, so the final
  * streamed counter table equals the batch sketch array cell for cell —
  * HeavyHitterStreamSpec asserts exactly that. A point estimate is then
  * `min over d of cnt` exactly as in batch — with the caveat that this
  * table only materializes cells with cnt > 0: a token whose (d, b)
  * cell is ABSENT has count 0 there, and the min must include it. Probe
  * with a LEFT join + coalesce(cnt, 0) (as the spec does), never an
  * inner join, or a zero cell silently drops out of the min and the
  * estimate overcounts. Ingest-time heavy-hitter gating (e.g. "flag
  * tokens past a threshold while loading") reads the same table.
  */
object HeavyHitterStream {

  /** (d, b, cnt) counters for a (possibly streaming) frame of tokens.
    * One pass: each row explodes to its `depth` cells inline. Bucket
    * arithmetic comes from [[CountMinSketchAgg.bucketColumn]] — the one
    * spelling shared with c42's probe, which also enforces the 16-bit
    * width bound (a wider `width` would silently leave buckets ≥ 65536
    * unreachable).
    */
  def counters(tokens: DataFrame, tokCol: String, depth: Int, width: Int): DataFrame =
    tokens
      .select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"),
          CountMinSketchAgg.bucketColumn(d, col(tokCol), width).as("b"))): _*)).as("cell"))
      .select(col("cell.d").as("d"), col("cell.b").as("b"))
      .groupBy(col("d"), col("b"))
      .agg(count(lit(1)).as("cnt"))
}
