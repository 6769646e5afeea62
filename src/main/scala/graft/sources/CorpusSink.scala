package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

/** Write-side of the corpus pipeline: shard a documents table to parquet
  * in a layout the READ side can prune.
  *
  * Layout decisions, each a 100 TB lever:
  *  - `partitionBy(stratum)` (e.g. lang) → directory-level partition
  *    pruning: a per-language training run never opens other languages'
  *    files;
  *  - `repartition(shards, key)` → each output partition holds one
  *    hash-bucket of the key, so downstream exact-dedup / join-on-key
  *    passes can co-locate without a shuffle (bucketed-by-convention;
  *    Hive bucketing metadata needs a metastore, which a bare parquet
  *    tree doesn't carry);
  *  - `sortWithinPartitions(key)` → clustered row groups give parquet
  *    min/max statistics real selectivity for key-range scans;
  *  - `maxRecordsPerFile` caps file size so a skewed stratum splits into
  *    several files instead of one multi-GB straggler.
  */
object CorpusSink {

  def writeSharded(
      df: DataFrame,
      path: String,
      stratum: String,
      key: Column,
      shards: Int,
      maxRecordsPerFile: Long = 1000000L): Unit =
    df.repartition(shards, key)
      .sortWithinPartitions(key)
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(stratum)
      .parquet(path)
}
