package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed, persisted Bloom membership filter — the production
  * "have we already trained on this?" gate behind the c27/c72
  * contamination audits.
  *
  * The filter is a TABLE, not a driver-side bitset: (w, bits) rows
  * where w indexes 32-bit words of an [[MBits]]-bit filter and `bits`
  * carries the OR of the set bit masks in that word. Everything about
  * it is Spark-first and oracle-replayable:
  *
  *   - the [[K]] bit positions of a key are md5-derived 60-bit integers
  *     mod [[MBits]] (the c42/c45 discipline — any engine that can hash
  *     can recompute them, so DuckDB replays the WHOLE filter);
  *   - building is one `bit_or` aggregate — OR is idempotent,
  *     commutative and duplicate-insensitive, so partials combine
  *     map-side and the shuffle carries at most min(n·K, MBits/32)
  *     words regardless of corpus size;
  *   - probing is an equi-join of the probe batch's (w, mask) pairs
  *     against the words table — at |filter| ≪ |batch| the words side
  *     broadcasts; there is no driver materialization at any size
  *     (Spark's own `bloom_filter_agg` builds ONE opaque binary blob
  *     that must fit in memory; this layout shards the same bits
  *     across the cluster);
  *   - persistence reuses [[SketchStore]]'s append-only algebra: each
  *     ingested batch writes its own dir, reads merge under `bit_or`,
  *     so replayed batches and interrupted compactions are no-ops and
  *     no rewrite window can lose the state.
  *
  * False positives are the Bloom contract (rate (nK/MBits)^K — at the
  * defaults, < 1e-5 up to ~2·10⁴ keys, ~2.5% by 10⁵ — size MBits to the
  * corpus); false negatives are structurally
  * impossible, pinned by BloomStoreSpec and the c72 oracle. At 100 TB
  * [[MBits]] becomes a store parameter scaled to the corpus (the words
  * table grows as MBits/32 rows — still a table, never a driver blob);
  * it is a constant here so the two engines agree by construction.
  */
object BloomStore {

  /** Filter size in bits (2^20) and hashes per key. */
  val MBits: Long = 1L << 20
  val K = 5

  /** The j-th bit position of a key: md5("<j>|<key>") first 15 hex
    * digits (60 bits, positive) mod [[MBits]].
    */
  private def position(j: Int, key: Column): Column =
    conv(substring(md5(concat(lit(s"$j|"), key).cast("binary")), 1, 15), 16, 10)
      .cast("long") % MBits

  /** The K bit positions of a key as an array column. */
  private def positionsOf(key: Column): Column =
    array((0 until K).map(j => position(j, key)): _*)

  /** w = p div 32 and the single-bit mask of a position expression,
    * spelled as shifts/masks — exact integer semantics (Column./ is
    * double division). Words are 32 bits in a 64-bit lane so every
    * mask stays POSITIVE: a shift into the sign bit is an overflow
    * error in DuckDB and a silent two's-complement wrap in Spark — a
    * parity trap the narrower word removes outright. The ONE home of
    * that rule: [[bitsOf]]/[[probe]] apply it to the exploded `p`
    * column, [[probeJoined]] to each array slot.
    */
  private def wOf(p: String) = expr(s"shiftright($p, 5)")
  private def mOf(p: String) =
    expr(s"shiftleft(CAST(1 AS BIGINT), CAST($p & 31 AS INT))")

  /** The filter words table of a key column: (w, bits), one `bit_or`
    * aggregate. Null keys contribute nothing.
    */
  def bitsOf(rows: DataFrame, key: Column): DataFrame =
    rows.filter(key.isNotNull)
      .select(explode(positionsOf(key)).as("p"))
      .select(wOf("p").as("w"), mOf("p").as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("bits"))

  /** Probe a batch against a words table: returns (id, bloom_hit) — one
    * row per input row with a non-null key; `bloom_hit` is true iff all
    * K bits are set (an absent word row is a miss).
    */
  def probe(rows: DataFrame, id: Column, key: Column, bits: DataFrame): DataFrame =
    rows.filter(key.isNotNull)
      .select(id.as("id"), explode(positionsOf(key)).as("p"))
      .select(col("id"), wOf("p").as("w"), mOf("p").as("m"))
      .join(bits, Seq("w"), "left")
      .groupBy(col("id"))
      .agg(min(when(col("bits").isNotNull &&
        (col("bits").bitwiseAND(col("m")) === col("m")), 1L).otherwise(0L)).as("h"))
      .select(col("id"), (col("h") === 1L).as("bloom_hit"))

  /** Stream-safe probe: [[K]] stream-static LEFT joins instead of
    * [[probe]]'s explode + groupBy (a streaming aggregate would force
    * update mode and stateful execution; K stateless joins keep the
    * gate in append mode with zero state). Returns the input rows plus
    * a `bloom_hit` column; a NULL key never matches (bloom_hit false —
    * "not in the corpus"), where [[probe]] drops such rows. The K joins
    * all broadcast the same small words table, so the per-batch cost is
    * K hash probes per row — the shape
    * [[graft.streaming.MembershipStream]] ships.
    */
  def probeJoined(rows: DataFrame, key: Column, bits: DataFrame): DataFrame = {
    val withP = rows.withColumn("__ps", positionsOf(key))
    val joined = (0 until K).foldLeft(withP) { (df, j) =>
      val b = bits.select(col("w").as(s"__w$j"), col("bits").as(s"__b$j"))
      df.withColumn(s"__wj$j", wOf(s"__ps[$j]"))
        .withColumn(s"__mj$j", mOf(s"__ps[$j]"))
        .join(b, col(s"__wj$j") === col(s"__w$j"), "left")
    }
    joined
      .withColumn("bloom_hit", (0 until K).map(j =>
          col(s"__b$j").isNotNull &&
            (col(s"__b$j").bitwiseAND(col(s"__mj$j")) === col(s"__mj$j")))
        .reduce(_ && _))
      .drop("__ps" +: (0 until K)
        .flatMap(j => Seq(s"__w$j", s"__b$j", s"__wj$j", s"__mj$j")): _*)
  }

  /** Ingest a batch: sketch its keys and append a NEW batch dir —
    * existing dirs are never read, rewritten or deleted ([[BatchDirs]]).
    */
  def append(rows: DataFrame, key: Column, path: String): Unit =
    BatchDirs.append(bitsOf(rows, key), path)

  /** The merged filter across all batch dirs (bit_or per word). */
  def words(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(path)
      .groupBy(col("w")).agg(expr("bit_or(bits)").as("bits"))

  /** Fold all batch dirs into one — crash-safe per [[BatchDirs.compact]]. */
  def compact(spark: SparkSession, path: String): Unit =
    BatchDirs.compact(words(spark, path), path)
}
