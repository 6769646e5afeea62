package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sharded JSONL corpus export — the interchange format LLM training
  * stacks ingest (one JSON object per line, optionally gzipped, split
  * into a fixed number of shards).
  *
  * Shard assignment is a CONTENT hash of the caller's key (the
  * [[graft.operators.Sampling.hashGate]] md5 discipline), not
  * `spark_partition_id`: the same row lands in the same shard on every
  * run, every retry, and every engine — so downstream loaders can cache,
  * diff, or resume per shard. `repartition(n, shard)` makes shard
  * placement the ONLY shuffle, and the within-partition sort makes each
  * file's line order deterministic too — including among DUPLICATE
  * keys: the sort carries a content-hash tiebreak (md5 of the whole
  * row's json), so key ties still land in one fixed order, and rows
  * identical in every column are interchangeable by construction.
  * Parquet stays the processing
  * format ([[CorpusSink]]); this is the hand-off boundary.
  */
object JsonlSink {

  /** Deterministic shard in [0, nShards): first 8 md5 hex digits of the
    * key, mod n.
    */
  def shardOf(key: Column, nShards: Int): Column =
    pmod(conv(substring(md5(key.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(nShards.toLong))

  /** Write `df` as `path/shard=K/part-*.json[.gz]`. */
  def write(
      df: DataFrame,
      key: Column,
      nShards: Int,
      path: String,
      gzip: Boolean = false): Unit = {
    val out = df.withColumn("shard", shardOf(key, nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), key,
        md5(to_json(struct(df.columns.map(col): _*))))
    val w = out.write.mode("overwrite").partitionBy("shard")
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }
}
