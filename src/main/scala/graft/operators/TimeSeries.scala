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
  *  - verify: exact L1 distance on candidates over dense 24-long profile
  *    arrays via the [[graft.functions.LongArrayL1]] codegen loop —
  *    one row per candidate (absent hours are exact zeros, so the value
  *    equals the sparse union-of-signed-contributions formulation the
  *    DuckDB oracle runs, where missing hours contribute their full
  *    magnitude).
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
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("vc"))
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
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("vc"))
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
  /** SQL text for one 48-bit signature half over the per-user quarter
    * map `qm` and total `tot` — bit (q − base) set iff quarter q is
    * PRESENT and v·96 > tot, exactly [[signature96]]'s rule (the
    * explicit IS NOT NULL keeps the absent-quarter bit 0 even for a
    * non-positive total, matching the no-row semantics of the sparse
    * spelling).
    */
  private def sigHalfSql(from: Int, to: Int): String =
    s"aggregate(sequence($from, $to), CAST(0 AS BIGINT), (acc, q) -> acc | " +
      "IF(element_at(qm, q) IS NOT NULL AND element_at(qm, q) * 96 > tot, " +
      s"shiftleft(CAST(1 AS BIGINT), q - $from), CAST(0 AS BIGINT)))"

  def topKSimilarPairs(events: DataFrame, k: Int,
      bruteCap: Long = BruteForceUserCap): DataFrame = {
    // ONE per-user row carries everything downstream needs — the 96-bit
    // signature halves (lo/hi), the dense 24-hour verify vector (pv,
    // absent hours exact zeros) and the 24-bit hour-PRESENCE mask — all
    // derived from the per-user quarter map in TWO exchanges total
    // (events → (user, qh) → user). The r13 rewrite: the previous shape
    // derived the hourly profile, the signature (a join back of the
    // per-user total) and the rescue key in SEPARATE aggregates — five
    // n·96-row-scale exchanges; the signature leg alone measured 4.4 s
    // at 10× (ScanShapeAb c51parts). The (pmask, pv) pair is BIJECTIVE
    // with the sparse (hour, v) set — pv carries the values, pmask
    // distinguishes "absent" from "present with v = 0" — so grouping on
    // it is exactly the equal-profile equivalence the rescue needs (same
    // classes as the oracle's canonical sorted "HH:v" string key;
    // rescue-set equality asserted in ScanShapeAb, delta 0). The
    // checkpoint is user-dimension-sized (n rows × ~250 B), not
    // data-sized, and has six consumers (brute-branch count, banding,
    // bucket census, rescue, both verify sides) that would otherwise
    // each re-run the per-user aggregation above the reused exchange.
    val uprof = quarterProfile(events)
      .groupBy(col("user_id"))
      .agg(
        map_from_entries(collect_list(struct(col("qh").cast("int"), col("v")))).as("qm"),
        sum(col("v")).as("tot"))
      .select(col("user_id"),
        expr(sigHalfSql(0, 47)).as("lo"),
        expr(sigHalfSql(48, 95)).as("hi"),
        expr("transform(sequence(0, 23), h -> " +
          "coalesce(element_at(qm, 4 * h), CAST(0 AS BIGINT)) + " +
          "coalesce(element_at(qm, 4 * h + 1), CAST(0 AS BIGINT)) + " +
          "coalesce(element_at(qm, 4 * h + 2), CAST(0 AS BIGINT)) + " +
          "coalesce(element_at(qm, 4 * h + 3), CAST(0 AS BIGINT)))").as("pv"),
        expr("aggregate(sequence(0, 23), CAST(0 AS BIGINT), (acc, h) -> acc | " +
          "IF(element_at(qm, 4 * h) IS NOT NULL OR element_at(qm, 4 * h + 1) IS NOT NULL OR " +
          "element_at(qm, 4 * h + 2) IS NOT NULL OR element_at(qm, 4 * h + 3) IS NOT NULL, " +
          "shiftleft(CAST(1 AS BIGINT), h), CAST(0 AS BIGINT)))").as("pmask"))
      .localCheckpoint(true)
    val banded = uprof.selectExpr("user_id",
      "stack(8, " +
        "0, lo & 4095, 1, (lo >> 12) & 4095, 2, (lo >> 24) & 4095, 3, (lo >> 36) & 4095, " +
        "4, hi & 4095, 5, (hi >> 12) & 4095, 6, (hi >> 24) & 4095, 7, (hi >> 36) & 4095" +
        ") AS (band_id, bv)")
    val cand = if (uprof.count() <= bruteCap) {
      // bounded by construction: both sides ≤ bruteCap rows, so the
      // nested-loop product is ≤ cap²/2 pairs on one broadcast
      uprof.select(col("user_id").as("da"))
        .join(uprof.select(col("user_id").as("db")), col("da") < col("db"))
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
      // by their exact hourly profile — the dense (pmask, pv) key, the
      // same equivalence classes the oracle's canonical sorted "HH:v"
      // string groups by (bijective, see uprof) — and pair CONSECUTIVE
      // members (lag over user_id order). Linear in group size;
      // candidates verify through the same exact L1 leg.
      val eqCand = uprof.select(col("user_id").as("db"),
          lag(col("user_id"), 1).over(
            Window.partitionBy(col("pmask"), col("pv"))
              .orderBy(col("user_id"))).as("da"))
        .filter(col("da").isNotNull)
        .select(col("da"), col("db"))
      bandCand.unionByName(eqCand).distinct()
    }
    // Exact L1 on candidates: each side joins its dense profile once and
    // a single LongArrayL1 codegen loop produces the distance — one row
    // per candidate end to end (the r13 rewrite; the sparse
    // union-of-signed-contributions spelling this replaced shuffled 48
    // (pair, hour) rows per candidate through two hash aggregates and
    // dominated the 10× wall clock). Absent hours are exact zeros in pv,
    // so the distance is bit-identical to the sparse formulation the
    // DuckDB oracle still runs.
    cand.join(uprof.select(col("user_id").as("da"), col("pv").as("pa")), "da")
      .join(uprof.select(col("user_id").as("db"), col("pv").as("pb")), "db")
      .select(col("da"), col("db"),
        org.apache.spark.sql.GraftBridge.column(graft.functions.LongArrayL1(
          org.apache.spark.sql.GraftBridge.expression(col("pa")),
          org.apache.spark.sql.GraftBridge.expression(col("pb")))).as("l1_cents"))
      .orderBy(col("l1_cents"), col("da"), col("db"))
      .limit(k)
  }
}
