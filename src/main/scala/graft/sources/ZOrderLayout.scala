package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Multi-dimensional clustered parquet layout: range-partition + sort on
  * the z-curve key, so parquet footer min/max stats prune on EITHER
  * dimension. The two-dimensional sibling of [[Compact]]'s single-key
  * layout: `repartitionByRange` samples the z keyspace for balanced
  * files (skew in the raw dims doesn't unbalance the output), the
  * within-partition sort keeps each file a contiguous z-range, and the
  * helper column is dropped before write so the layout is invisible in
  * the schema — exactly how a table maintenance job would run it.
  */
object ZOrderLayout {

  /** Write `df` z-clustered by (x, y) into `nFiles` parquet files. */
  def write(df: DataFrame, x: Column, y: Column, nFiles: Int, path: String): Unit =
    df.withColumn("__z", ZOrder.zvalue16(x, y))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
