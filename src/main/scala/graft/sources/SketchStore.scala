package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.HllDistinct

/** Persisted, incrementally-mergeable HLL register store — the
  * sketch-once/merge-forever layout behind c71's overlap audit.
  *
  * At 100 TB nobody recomputes per-source registers from the corpus on
  * every audit: the registers ARE the audit state. This store persists
  * the sparse (g, bucket, mj) table ([[HllDistinct.registerCore]]'s
  * exact shape, |sources|·M rows) as plain parquet, and [[append]]
  * folds a NEW document batch in by unioning its batch-local registers
  * with the stored table under element-wise `max` — the same merge the
  * streaming twin ([[graft.streaming.OverlapStream]]) applies
  * micro-batch by micro-batch and HllDistinctSpec proves equal to
  * sketching the concatenated corpus directly. `max` is idempotent and
  * commutative, so replayed batches, reordered backfills and
  * overlapping re-ingests can never corrupt a register — the store
  * needs no dedup log, no ordering metadata, no tombstones.
  *
  * Readout at any time: [[overlap]] = frame-complete + the ONE
  * pairwise-overlap spelling shared with the c71 batch query. Only the
  * ingest ever touches documents; every audit after that reads
  * |sources|·M longs.
  */
object SketchStore {

  /** Initialize (or overwrite) the store from a document frame. */
  def write(docs: DataFrame, path: String): Unit =
    HllDistinct.registerCore(docs, col("source"), col("text"))
      .write.mode("overwrite").parquet(path)

  /** Fold a new batch into the stored registers: batch-local registers
    * unioned with the stored table under element-wise max. A parquet
    * overwrite cannot read its own input mid-write, so the (tiny)
    * merged table materializes through `localCheckpoint` before the
    * rewrite.
    */
  def append(spark: SparkSession, docs: DataFrame, path: String): Unit = {
    val stored = spark.read.parquet(path)
    val batch = HllDistinct.registerCore(docs, col("source"), col("text"))
    val merged = stored.union(batch)
      .groupBy(col("g"), col("bucket")).agg(max(col("mj")).as("mj"))
      .localCheckpoint(true)
    merged.write.mode("overwrite").parquet(path)
  }

  /** The stored sparse register table. */
  def registers(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Pairwise overlap readout over the stored registers — c71's
    * estimate columns, corpus untouched.
    */
  def overlap(spark: SparkSession, path: String): DataFrame =
    HllDistinct.pairwiseOverlap(HllDistinct.frameComplete(registers(spark, path)))
}
