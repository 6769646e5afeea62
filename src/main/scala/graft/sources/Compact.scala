package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-files compaction — the maintenance operator every long-lived
  * corpus needs. A per-file pipeline (the exec operator, streaming
  * ingest, incremental appends) accretes thousands of small files;
  * downstream scans then pay a task + open + footer read per file, and
  * the NameNode pays an object per file. Compaction rewrites a parquet
  * directory into ~`targetBytes` files, key-clustered so parquet min/max
  * row-group statistics stay selective.
  *
  * Shape: `repartitionByRange(n, key)` (one shuffle, range-balanced by
  * sampled key quantiles — size-balanced output without a driver-side
  * size table) + `sortWithinPartitions` (clustered row groups). `n` is
  * derived from the ACTUAL input bytes / target, so the operator is
  * idempotent-ish: recompacting compacted data is a no-op-sized job.
  */
object Compact {

  /** Rewrite `inDir`'s parquet as ~`targetBytes` files under `outDir`,
    * clustered by `key`. Returns the partition count written.
    */
  def compactParquet(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      key: String,
      targetBytes: Long): Int = {
    val inPath = new Path(inDir)
    val fs = inPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(inPath)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartitionByRange(n, col(key))
      .sortWithinPartitions(col(key))
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    n
  }
}
