package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed time-series similarity search — the banded-blocking
  * discipline (c14/c4) applied to per-user activity profiles, the shape
  * the retrieved top-k-similarity papers (PAPERS.md: REPOSE ICDE'21,
  * EDBT'19 streaming TS search, EDBT'20 distributed similarity joins)
  * all converge on: a compact per-series SIGNATURE blocks the pair
  * space, exact distance runs on candidates only.
  *
  *  - fine profile: 96-dim quarter-hour-of-day vector of value sums per
  *    user, in integer cents (exact, mergeable, one groupBy);
  *  - verify profile: the 24-dim hourly vector, derived from the fine
  *    profile by `hour = qh div 4` (no second scan of events) — the
  *    OUTPUT semantics (exact hourly L1) are unchanged from the
  *    original hourly formulation;
  *  - signature: 96 bits, bit q = [quarter q's sum > user average]
  *    (the SAX idea reduced to its sign bit — cross-multiplied integer
  *    compare, no division), carried as two 48-bit longs `lo`/`hi`;
  *  - blocking: 8 × 12-bit bands of the signature → 8 × 4096 = 32,768
  *    distinct (band_id, bv) join keys — the same key-space order as
  *    the SimHash near-dup blocking (16-bit bands, 65,536 buckets)
  *    whose scale argument this operator borrows. By pigeonhole any
  *    pair within signature-Hamming ≤ 7 shares a band; the candidate
  *    join shuffles (band_id, value) keys, never the O(n²) pair space.
  *    (The r6 design banded a 24-bit signature into 4 × 6-bit bands =
  *    256 keys, making candidate generation Σ|bucket|² quadratic in
  *    user count with only a 1/256 constant — the 4096-value bands
  *    restore the 1/|keyspace| constant the scale argument needs.)
  *  - verify: exact L1 distance on candidates via a union-of-signed-
  *    contributions aggregate (missing hours contribute their full
  *    magnitude — a plain relational spelling both engines run
  *    identically).
  *
  * At 100 TB the fine profile table is |users|·96 rows of longs and the
  * banded join is bounded by band-bucket sizes of ~N/4096 — the same
  * scale argument as SimHash near-dup.
  */
object TimeSeries {

  /** (user_id, qh, v) — quarter-hour-of-day value sums in cents.
    * Quarter-of-day is integer micros arithmetic, not date functions —
    * the d24 discipline: nothing for the two engines to disagree on.
    */
  def quarterProfile(events: DataFrame): DataFrame =
    events.select(col("user_id"),
        expr("(unix_micros(ts) div 900000000) % 96").as("qh"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("vc"))
      .groupBy(col("user_id"), col("qh"))
      .agg(sum(col("vc")).as("v"))

  /** (user_id, hour, v) — hourly value sums in cents (the L1-verify
    * profile). Kept as a public single-scan API; inside
    * [[topKSimilarPairs]] the same shape is derived from the quarter
    * profile instead (hour = qh div 4, exact because 96 = 24 × 4).
    */
  def hourlyProfile(events: DataFrame): DataFrame =
    events.select(col("user_id"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("hour"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("vc"))
      .groupBy(col("user_id"), col("hour"))
      .agg(sum(col("vc")).as("v"))

  /** (user_id, lo, hi) — the 96-bit above-average signature over the
    * quarter profile, as two 48-bit halves (quarters 0–47 in `lo`,
    * 48–95 in `hi`). One row per user with ≥ 1 event; absent quarters
    * contribute bit 0 (0·96 > tot is false for any positive total), so
    * the dense semantics need no densify join.
    */
  def signature96(qprof: DataFrame): DataFrame = {
    val tot = qprof.groupBy(col("user_id")).agg(sum(col("v")).as("tot"))
    qprof.join(tot, "user_id")
      .groupBy(col("user_id"))
      .agg(
        sum(expr(
          "CASE WHEN qh < 48 AND v * 96 > tot " +
            "THEN shiftleft(CAST(1 AS BIGINT), CAST(qh AS INT)) " +
            "ELSE CAST(0 AS BIGINT) END")).as("lo"),
        sum(expr(
          "CASE WHEN qh >= 48 AND v * 96 > tot " +
            "THEN shiftleft(CAST(1 AS BIGINT), CAST(qh - 48 AS INT)) " +
            "ELSE CAST(0 AS BIGINT) END")).as("hi"))
  }

  /** Below this many users the candidate set is ALL pairs, not banded:
    * ≤ cap²/2 ≈ 500k pairs is cheaper than the band machinery's fixed
    * cost, and at tiny populations the 32,768-key blocking legitimately
    * yields NO collisions (15 users × 8 bands / 4096 values ≈ 0
    * expected shared buckets) — an empty report, where the useful
    * answer is the exact one. The flat-below/banded-above switch is the
    * same small-N escape every ANN index makes (FAISS flat vs IVF); the
    * cap is a pure function of a COUNT both engines compute, so the
    * DuckDB oracle replays the branch decision exactly.
    */
  val BruteForceUserCap = 1024L

  /** Per-(band_id, bv) population cap — the c3/c27 df-cap discipline
    * applied to LSH buckets. Without it the pair space is Σ m² over
    * bucket populations m ≈ 8n/32768: quadratic in n once buckets
    * average past one user (measured: the c51 10× smoke ratio crept to
    * 9–11× as the ×10 replicas pushed average population to ~3.7), and
    * the FLAT-PROFILE bucket (bv = 0 — no above-average quarter in the
    * band's 12 quarters) concentrates inactive users the way stop-words
    * concentrate postings. A bucket past the cap contributes NO
    * candidates (skip-overfull, standard LSH practice), which bounds
    * total candidates at 32,768·cap²/2 REGARDLESS of n; recall remains
    * full (pigeonhole, Hamming ≤ 7) for every pair sharing at least one
    * non-overfull band. The cap is 69× the expected population at the
    * bench SF and a pure function of counts both engines compute, so
    * the DuckDB oracle replays the drop decision exactly. At 100 TB the
    * production lever is growing the band key space with n (the
    * nlist-grows-with-corpus rule); the cap is the skew guard.
    *
    * The cap alone had a recall hole the r9 review called out: users
    * with IDENTICAL profiles land in the same bucket of every band
    * (identical profile ⇒ identical signature), so once that population
    * passes the cap their pairs — L1 distance 0, the genuinely most
    * similar — vanished from the top-k entirely. The EQUAL-PROFILE
    * RESCUE in [[topKSimilarPairs]] closes it without reopening the
    * quadratic door: distance-0 pairs need no pairwise search (grouping
    * finds them), so users are grouped by their exact hourly profile
    * and consecutive members of each group (ranked by user_id) become
    * candidates — m−1 pairs for an m-user group, LINEAR in the skew
    * population the cap targets. The guarantee is a SPANNING CHAIN of
    * distance-0 pairs per identical-profile group: every user with an
    * identical twin appears in at least one distance-0 candidate pair
    * at any scale, but non-adjacent identical pairs (e.g. ranks (0,2)
    * of a 3-user group) are NOT generated, so when distance-0 pairs
    * overflow k the top-k may return chain pairs ((0,1),(1,2),…) where
    * exact tie-break order would return ((0,1),(0,2),…). Overfull
    * buckets additionally still drop their non-identical pairs. All
    * three spellings (DataFrame, SQL text, oracle) replay the same
    * chain rule, so cross-engine parity holds.
    */
  val BandBucketCap = 256L

  /** Top-`k` most similar user pairs by exact hourly L1 profile
    * distance, searched among banded-signature candidates (full recall
    * up to 96-bit signature Hamming 7 — pigeonhole over the 8 × 12-bit
    * bands — for pairs sharing a non-overfull band, PLUS the linear
    * equal-profile rescue that keeps distance-0 pairs alive inside
    * overfull buckets, see [[BandBucketCap]]); populations ≤ `bruteCap`
    * take the exact all-pairs branch instead (see
    * [[BruteForceUserCap]]). Output: (da, db, l1_cents).
    */
  def topKSimilarPairs(events: DataFrame, k: Int,
      bruteCap: Long = BruteForceUserCap): DataFrame = {
    val qprof = quarterProfile(events).localCheckpoint(true)
    val prof = qprof
      .groupBy(col("user_id"), expr("qh div 4").as("hour"))
      .agg(sum(col("v")).as("v"))
    val sig = signature96(qprof).localCheckpoint(true)
    val banded = sig.selectExpr("user_id",
      "stack(8, " +
        "0, lo & 4095, 1, (lo >> 12) & 4095, 2, (lo >> 24) & 4095, 3, (lo >> 36) & 4095, " +
        "4, hi & 4095, 5, (hi >> 12) & 4095, 6, (hi >> 24) & 4095, 7, (hi >> 36) & 4095" +
        ") AS (band_id, bv)")
    val cand = if (sig.count() <= bruteCap) {
      // bounded by construction: both sides ≤ bruteCap rows, so the
      // nested-loop product is ≤ cap²/2 pairs on one broadcast
      sig.select(col("user_id").as("da"))
        .join(sig.select(col("user_id").as("db")), col("da") < col("db"))
    } else {
      // df-cap the buckets BEFORE the self-join (see BandBucketCap)
      val kept = banded.join(
        banded.groupBy(col("band_id"), col("bv"))
          .agg(count(lit(1)).as("bp"))
          .filter(col("bp") <= BandBucketCap)
          .select(col("band_id"), col("bv")),
        Seq("band_id", "bv"))
      val bandCand = kept
        .select(col("band_id"), col("bv"), col("user_id").as("da"))
        .join(kept.select(col("band_id"), col("bv"), col("user_id").as("db")),
          Seq("band_id", "bv"))
        .filter(col("da") < col("db"))
        .select(col("da"), col("db"))
      // equal-profile rescue (see BandBucketCap scaladoc): group users
      // by their exact hourly profile — spelled as a canonical sorted
      // "HH:v" string so DuckDB groups identically (2-digit hour keeps
      // lexicographic = numeric order) — and pair CONSECUTIVE members.
      // Linear in group size; candidates verify through the same exact
      // L1 leg, so a would-be hash trick needs no collision argument:
      // the profile string IS the key.
      val pkey = prof.groupBy(col("user_id")).agg(
        array_join(array_sort(collect_list(concat(
          lpad(col("hour").cast("string"), 2, "0"), lit(":"), col("v")))),
          ",").as("pk"))
      val ranked = pkey.withColumn("rn", row_number().over(
        Window.partitionBy(col("pk")).orderBy(col("user_id"))))
      val eqCand = ranked.select(col("pk"), col("rn"), col("user_id").as("da"))
        .join(ranked.select(col("pk"), (col("rn") - 1).as("rn"),
          col("user_id").as("db")), Seq("pk", "rn"))
        .select(col("da"), col("db"))
      bandCand.unionByName(eqCand).distinct()
    }
    // L1 over possibly-sparse 24-dim vectors: contributions +va and -vb
    // summed per (pair, hour) then |·| summed per pair — hours present
    // on one side only contribute their magnitude, no dense pivot.
    val a = cand.join(prof.select(col("user_id").as("da"), col("hour"), col("v")), "da")
      .select(col("da"), col("db"), col("hour"), col("v").as("x"))
    val b = cand.join(prof.select(col("user_id").as("db"), col("hour"), col("v")), "db")
      .select(col("da"), col("db"), col("hour"), (-col("v")).as("x"))
    a.unionByName(b)
      .groupBy(col("da"), col("db"), col("hour"))
      .agg(sum(col("x")).as("d"))
      .groupBy(col("da"), col("db"))
      .agg(sum(abs(col("d"))).as("l1_cents"))
      .orderBy(col("l1_cents"), col("da"), col("db"))
      .limit(k)
  }
}
