package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the co-located-join path at 100 TB.
  *
  * A fact-to-fact join (lineitem ⋈ orders on orderkey) shuffles BOTH
  * sides every time it runs; at 100 TB that shuffle dominates the job.
  * Writing both tables bucketed (and sorted) by the join key pays the
  * shuffle ONCE at write time: every subsequent join on that key reads
  * matching buckets task-for-task — no Exchange on either side, no sort
  * for the merge join when `sortBy` matches the key. The read-side plan
  * is asserted Exchange-free in BucketedSpec; this is the layout every
  * repeatedly-joined table pair should ship with.
  *
  * Buckets also bound task memory: pick `buckets` so one bucket of the
  * LARGER table fits an executor (e.g. 100 TB / 8192 buckets ≈ 12 GB —
  * file-split further by row groups on read).
  */
object Bucketed {

  /** Write `df` as a bucketed, bucket-sorted parquet table registered in
    * the session catalog (bucketing metadata lives in the catalog — a
    * bare parquet path loses the bucket spec, so co-located reads MUST
    * go through a table name).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket specs Catalyst plans a SortMergeJoin with NO Exchange on
    * either side (and no Sort beyond the in-bucket order).
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
