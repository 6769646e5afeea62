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

  /** The merged register view across all batch dirs: element-wise max
    * per (g, bucket). Sparse — frame completion happens at readout.
    */
  def registers(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(path)
      .groupBy(col("g"), col("bucket")).agg(max(col("mj")).as("mj"))

  /** Fold all batch dirs into one. Crash-safe by construction: the
    * merged dir is fully committed BEFORE any input dir is removed, and
    * if removal is interrupted the leftover inputs are re-merged by the
    * next read under the same `max` — duplicate state is a no-op, not
    * corruption.
    */
  def compact(spark: SparkSession, path: String): Unit =
    BatchDirs.compact(registers(spark, path), path)

  /** Pairwise overlap readout over the stored registers — c71's
    * estimate columns, corpus untouched.
    */
  def overlap(spark: SparkSession, path: String): DataFrame =
    HllDistinct.pairwiseOverlap(HllDistinct.frameComplete(registers(spark, path)))
}
