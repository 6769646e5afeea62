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
  *   - the [[K]] bit positions of a key derive from ONE md5 by double
  *     hashing — two 60-bit hex halves h1/h2, position j =
  *     (h1 + j·(h2|1)) mod [[MBits]] (the c42/c45 hex-decode
  *     discipline — any engine that can hash can recompute them, so
  *     DuckDB replays the WHOLE filter; see [[withPositions]]);
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
  * False positives are the Bloom contract (rate (nK/mBits)^K — at the
  * [[MBits]] default, < 1e-5 up to ~2·10⁴ keys, ~2.5% by 10⁵); false
  * negatives are structurally impossible, pinned by BloomStoreSpec and
  * the c72 oracle. The filter size IS a store parameter: every builder
  * and probe takes `mBits` (size it to the corpus — the words table
  * grows as mBits/32 rows, still a table, never a driver blob), and
  * the persisted store pins its own size in a `_mbits` sidecar at
  * first append, so a later append or probe can neither shrink nor
  * stretch the position arithmetic out from under the stored bits
  * (mixed sizes would manufacture false negatives — the one thing the
  * contract forbids). [[MBits]] stays the default so the c72 oracle
  * replays the same constant.
  */
object BloomStore {

  /** Default filter size in bits (2^20) and hashes per key. */
  val MBits: Long = 1L << 20
  val K = 5

  /** Position-arithmetic scheme tag — the SECOND half of the persisted
    * format (the `_mbits` sidecar pins only the size). The r13 move
    * from md5-per-j to Kirsch–Mitzenmacher double hashing changed the
    * BIT LAYOUT of stored words; a store written under one scheme and
    * probed under another silently returns false negatives — the one
    * thing the Bloom contract forbids. So the scheme is versioned like
    * the size: the first successful append pins this tag in a `_scheme`
    * sidecar, and appends/reads against a store whose tag differs — or
    * whose batches predate versioning, where the layout CANNOT be
    * verified — are rejected loudly, mirroring the mismatched-mBits
    * rejection. A pre-versioning store known to be this scheme can be
    * adopted by writing the tag to `_scheme` by hand.
    */
  val Scheme = "km-md5-v2"

  /** Filter size for `expectedKeys` keys at `targetFp` false-positive
    * rate under the store's fixed [[K]] hashes — callers should not
    * have to invert the Bloom arithmetic by hand. Solves
    * (1 − e^(−K·n/m))^K = p for m: m = −K·n / ln(1 − p^(1/K)), rounded
    * UP to a whole 32-bit word (the layout's unit; [[positionsOf]]
    * requires the multiple). At p = 2^−K this reduces to the classic
    * n·K/ln 2 (each key's bits leave half the filter clear). The words
    * table then holds ≤ m/32 rows — still a table, never a driver
    * blob, so sizing to a 10¹¹-key corpus is a storage decision, not a
    * memory one.
    */
  def sizeFor(expectedKeys: Long, targetFp: Double = math.pow(2.0, -K)): Long = {
    require(expectedKeys > 0, s"expectedKeys must be positive: $expectedKeys")
    require(targetFp > 0 && targetFp < 1, s"targetFp must be in (0,1): $targetFp")
    val m = -K * expectedKeys.toDouble / math.log1p(-math.pow(targetFp, 1.0 / K))
    math.max(1L, math.ceil(m / 32.0).toLong) * 32L
  }

  /** The K bit positions of a key, by double hashing (Kirsch &
    * Mitzenmacher, "Less Hashing, Same Performance", ESA 2006): ONE
    * md5 of the key yields two independent 60-bit halves h1 (hex
    * digits 1–15) and h2 (16–30), and position j = (h1 + j·h2') mod
    * mBits with h2' = h2|1. The OR-1 makes the stride odd, so at the
    * power-of-two default the K positions are pairwise DISTINCT (an
    * even stride could fold them together and silently shrink the
    * effective K; it also removes the h2 ≡ 0 degenerate where all
    * positions collapse to h1). K-M prove the asymptotic FP rate
    * matches K independent hashes, and the r13 A/B measured the
    * md5-per-j predecessor at 5× the hash cost for the same contract.
    * Overflow-safe: h1 + 4·h2' < 5·2^60 < 2^63. Like mBits, the
    * position arithmetic is part of the persisted-store format —
    * changing it orphans stored bits, which is why [[Scheme]] versions
    * it.
    *
    * The md5 and its two halves are materialized as real (hidden)
    * columns in SEPARATE projections before the array is built:
    * CollapseProject refuses to inline a non-cheap alias consumed more
    * than once, so the one-md5-per-key cost is a property of the PLAN,
    * not of whole-stage codegen's subexpression elimination — it holds
    * in interpreted and fallback paths too (ADVICE r13).
    */
  private def withPositions(df: DataFrame, key: Column, mBits: Long,
      out: String): DataFrame = {
    require(mBits > 0 && mBits % 32 == 0,
      s"mBits must be a positive multiple of the 32-bit word width: $mBits")
    val hc = "__bloom_h"; val h1c = "__bloom_h1"; val h2c = "__bloom_h2"
    df.withColumn(hc, md5(key.cast("binary")))
      .withColumn(h1c, conv(substring(col(hc), 1, 15), 16, 10).cast("long"))
      .withColumn(h2c,
        conv(substring(col(hc), 16, 15), 16, 10).cast("long").bitwiseOR(lit(1L)))
      .withColumn(out, array((0 until K).map(j =>
        (col(h1c) + lit(j.toLong) * col(h2c)) % mBits): _*))
      .drop(hc, h1c, h2c)
  }

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
  def bitsOf(rows: DataFrame, key: Column, mBits: Long = MBits): DataFrame =
    withPositions(rows.filter(key.isNotNull), key, mBits, "__ps")
      .select(explode(col("__ps")).as("p"))
      .select(wOf("p").as("w"), mOf("p").as("m"))
      .groupBy(col("w")).agg(expr("bit_or(m)").as("bits"))

  /** Probe a batch against a words table: returns (id, bloom_hit) — one
    * row per input row with a non-null key; `bloom_hit` is true iff all
    * K bits are set (an absent word row is a miss). `mBits` must be the
    * size the words table was BUILT with ([[mBitsOf]] for a persisted
    * store).
    */
  def probe(rows: DataFrame, id: Column, key: Column, bits: DataFrame,
      mBits: Long = MBits): DataFrame =
    withPositions(rows.filter(key.isNotNull), key, mBits, "__ps")
      .select(id.as("id"), explode(col("__ps")).as("p"))
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
  def probeJoined(rows: DataFrame, key: Column, bits: DataFrame,
      mBits: Long = MBits): DataFrame = {
    val withP = withPositions(rows, key, mBits, "__ps")
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
    * The first SUCCESSFUL append pins the store's filter size in the
    * `_mbits` sidecar; a later append with a DIFFERENT size is rejected
    * — words built under two moduli OR together into a filter that can
    * miss ingested keys, which Bloom's contract forbids. (The pin
    * protocol assumes a single writer BOOTSTRAPS the store: two
    * concurrent first-ever appends racing with different sizes need an
    * external lock, the same assumption every schema-on-first-write
    * store makes. Once one batch is committed the size is immutable and
    * concurrent appends are safe.)
    */
  def append(rows: DataFrame, key: Column, path: String,
      mBits: Long = MBits): Unit = {
    // Validate BEFORE pinning: pinning first would write an invalid
    // size to the sidecar and then throw in positionsOf, leaving an
    // empty store whose mBitsOf()/words() probes fail "corrupt
    // sidecar" until a valid-size retry re-pins.
    require(mBits > 0 && mBits % 32 == 0,
      s"mBits must be a positive multiple of 32, got $mBits")
    requireScheme(path)
    pinMBits(path, mBits)
    pinScheme(path)
    BatchDirs.append(bitsOf(rows, key, mBits), path)
  }

  /** The filter size a persisted store was built with (`_mbits`
    * sidecar; [[MBits]] for a pre-sidecar store). A sidecar that does
    * not parse to a positive multiple of 32 fails LOUDLY: a truncated
    * write (e.g. `10485` from `1048576`) is still a syntactically
    * valid long that would silently rewire the position arithmetic and
    * manufacture exactly the false negatives the sidecar exists to
    * prevent. [[pinMBits]] writes it atomically so this is a
    * can't-happen guard, not an expected path.
    */
  def mBitsOf(path: String): Long = {
    val f = java.nio.file.Paths.get(path, "_mbits")
    if (!java.nio.file.Files.exists(f)) MBits
    else {
      val raw = java.nio.file.Files.readString(f).trim
      val v = try raw.toLong catch {
        case _: NumberFormatException => throw new IllegalStateException(
          s"corrupt _mbits sidecar at $path: '$raw' is not a long")
      }
      if (v <= 0 || v % 32 != 0) throw new IllegalStateException(
        s"corrupt _mbits sidecar at $path: $v is not a positive multiple " +
          "of the 32-bit word width")
      v
    }
  }

  /** Pin (or verify) the store's filter size. The sidecar is written to
    * a hidden temp file and published with a filesystem-ATOMIC move —
    * a crash mid-write can leave a stale temp, never a truncated
    * `_mbits` (see [[mBitsOf]] for why truncation is the dangerous
    * case). The size is only BINDING while committed batches exist: a
    * store whose first batch write failed (sidecar pinned, zero
    * batches) accepts a retry at a different size instead of being
    * bricked — no bits exist for the new modulus to contradict. A
    * pre-sidecar store that already holds batches can only have been
    * built at the [[MBits]] default, so a non-default append against
    * one is rejected rather than silently re-labelled.
    */
  private def pinMBits(path: String, mBits: Long): Unit = {
    val hasBatches = BatchDirs.list(path).nonEmpty
    if (hasBatches) {
      val stored = mBitsOf(path) // MBits for a pre-sidecar store
      require(stored == mBits,
        s"store at $path was built with mBits=$stored; appending with " +
          s"mBits=$mBits would corrupt the position arithmetic")
      if (java.nio.file.Files.exists(
        java.nio.file.Paths.get(path, "_mbits"))) return
    }
    writeSidecar(path, "_mbits", mBits.toString)
  }

  /** The scheme tag a persisted store's words were written under, or
    * None for a store with no `_scheme` sidecar (empty, or written
    * before scheme versioning).
    */
  def schemeOf(path: String): Option[String] = {
    val f = java.nio.file.Paths.get(path, "_scheme")
    if (!java.nio.file.Files.exists(f)) None
    else Some(java.nio.file.Files.readString(f).trim)
  }

  /** Reject a populated store whose position-arithmetic scheme is not
    * the one this code computes — probing or appending across schemes
    * manufactures silent false negatives (see [[Scheme]]). A store with
    * no committed batches is unconstrained: whatever was pinned never
    * produced bits, so the current scheme simply (re-)pins at append.
    */
  private def requireScheme(path: String): Unit =
    if (BatchDirs.list(path).nonEmpty) schemeOf(path) match {
      case Some(Scheme) => ()
      case Some(other) => throw new IllegalStateException(
        s"store at $path was written under position scheme '$other'; this " +
          s"build computes '$Scheme' — probing or appending would return " +
          "false negatives. Rebuild the store (or migrate it offline).")
      case None => throw new IllegalStateException(
        s"store at $path holds batches but predates scheme versioning — " +
          s"its bit layout cannot be verified against '$Scheme'. Rebuild " +
          "it, or tag a store KNOWN to be this scheme by writing the tag " +
          "to its _scheme sidecar.")
    }

  /** Pin the scheme tag at (or after) the first successful size pin —
    * same binding rule as [[pinMBits]]: only committed batches make it
    * immutable; [[requireScheme]] has already vetted a populated store.
    */
  private def pinScheme(path: String): Unit =
    if (schemeOf(path) != Some(Scheme)) writeSidecar(path, "_scheme", Scheme)

  /** Atomic sidecar publish shared by both pins: hidden temp + ATOMIC
    * move, so a crash mid-write leaves a stale temp, never a truncated
    * sidecar.
    */
  private def writeSidecar(path: String, name: String, value: String): Unit = {
    val f = java.nio.file.Paths.get(path, name)
    java.nio.file.Files.createDirectories(f.getParent)
    val tmp = java.nio.file.Files.createTempFile(f.getParent, s".$name", ".tmp")
    java.nio.file.Files.writeString(tmp, value)
    java.nio.file.Files.move(tmp, f,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** The word merge (bit_or per word index) — the ONE spelling shared
    * by reads and compaction, so a folded filter can never drift from
    * what a read would have computed. OR is duplicate-insensitive, so
    * interrupted compactions and replayed batches stay no-ops.
    */
  private def mergeWords(raw: DataFrame): DataFrame =
    raw.groupBy(col("w")).agg(expr("bit_or(bits)").as("bits"))

  /** The merged filter across all batch dirs. Verifies the store's
    * position scheme first — reading words written under a different
    * scheme would probe as false negatives ([[Scheme]]).
    */
  def words(spark: SparkSession, path: String): DataFrame = {
    requireScheme(path)
    mergeWords(spark.read.option("recursiveFileLookup", "true").parquet(path))
  }

  /** Fold all batch dirs into one — safe under crashes AND concurrent
    * appends per [[BatchDirs.compact]] (enumerate once, merge exactly
    * that list, delete exactly that list): a batch dir committed while
    * the merge runs is neither read nor deleted, so "false negatives
    * are structurally impossible" survives a streaming ingest appending
    * mid-compaction.
    */
  def compact(spark: SparkSession, path: String): Unit =
    BatchDirs.compact(spark, path, mergeWords)
}
