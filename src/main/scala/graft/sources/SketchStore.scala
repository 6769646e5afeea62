package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.HllDistinct

/** Persisted, incrementally-mergeable HLL register store — the
  * sketch-once/merge-forever layout behind c71's overlap audit.
  *
  * At 100 TB nobody recomputes per-source registers from the corpus on
  * every audit: the registers ARE the audit state. The layout is
  * APPEND-ONLY: each ingested batch writes its own `batch-<id>/`
  * parquet dir of sparse (g, bucket, mj) rows
  * ([[HllDistinct.registerCore]]'s exact shape, ≤ |sources|·M rows per
  * batch) and NEVER touches existing data — there is no
  * delete-then-rewrite window in which a crash can lose the only copy
  * of the state. [[registers]] merges all batch dirs under
  * element-wise `max` at read time; because `max` is idempotent and
  * commutative, replayed batches, reordered backfills, overlapping
  * re-ingests, and even a [[compact]] that crashes after writing its
  * merged dir but before removing the inputs all leave the MERGED view
  * unchanged — the store needs no dedup log, no ordering metadata, no
  * tombstones, and its only failure mode is harmless duplicate rows.
  *
  * Readout at any time: [[overlap]] = frame-complete + the ONE
  * pairwise-overlap spelling shared with the c71 batch query and the
  * streaming twin ([[graft.streaming.OverlapStream]]). Only ingest
  * ever touches documents; every audit after that reads a few
  * batches × |sources|·M longs.
  */
object SketchStore {

  /** Ingest a document batch: sketch it and append a NEW batch dir.
    * Existing batch dirs are never read, rewritten or deleted
    * ([[BatchDirs]]).
    */
  def append(docs: DataFrame, path: String): Unit =
    BatchDirs.append(
      HllDistinct.registerCore(docs, col("source"), col("text")), path)

  /** Initialize a store from a first batch (same as [[append]] on an
    * empty path; kept for intent at call sites).
    */
  def write(docs: DataFrame, path: String): Unit = append(docs, path)

  /** The register merge: element-wise max per (g, bucket). The ONE
    * spelling shared by reads and compaction, so the folded state can
    * never drift from what a read would have computed.
    */
  private def mergeRegisters(raw: DataFrame): DataFrame =
    raw.groupBy(col("g"), col("bucket")).agg(max(col("mj")).as("mj"))

  /** The merged register view across all batch dirs. Sparse — frame
    * completion happens at readout.
    */
  def registers(spark: SparkSession, path: String): DataFrame =
    mergeRegisters(
      spark.read.option("recursiveFileLookup", "true").parquet(path))

  /** Fold all batch dirs into one. Safe by construction under crashes
    * AND concurrent appends: [[BatchDirs.compact]] enumerates the dirs
    * once, merges exactly that list, commits the merged dir, then
    * removes exactly that list — an interrupted removal leaves
    * duplicates the next read merges away under the same `max`, and a
    * batch appended mid-compaction survives untouched into the next
    * merge.
    */
  def compact(spark: SparkSession, path: String): Unit =
    BatchDirs.compact(spark, path, mergeRegisters)

  /** Pairwise overlap readout over the stored registers — c71's
    * estimate columns, corpus untouched.
    */
  def overlap(spark: SparkSession, path: String): DataFrame =
    HllDistinct.pairwiseOverlap(HllDistinct.frameComplete(registers(spark, path)))
}
