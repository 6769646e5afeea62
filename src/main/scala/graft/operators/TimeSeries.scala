package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed time-series similarity search — the banded-blocking
  * discipline (c14/c4) applied to per-user activity profiles, the shape
  * the retrieved top-k-similarity papers (PAPERS.md: REPOSE ICDE'21,
  * EDBT'19 streaming TS search, EDBT'20 distributed similarity joins)
  * all converge on: a compact per-series SIGNATURE blocks the pair
  * space, exact distance runs on candidates only.
  *
  *  - profile: 24-dim hourly vector of value sums per user, in integer
  *    cents (exact, mergeable, one groupBy);
  *  - signature: 24 bits, bit h = [hour h's sum > user average]
  *    (the SAX idea reduced to its sign bit — cross-multiplied integer
  *    compare, no division);
  *  - blocking: 4 × 6-bit bands of the signature; by pigeonhole any
  *    pair within signature-Hamming ≤ 3 shares a band — the candidate
  *    join shuffles (band_id, value) keys, never the O(n²) pair space;
  *  - verify: exact L1 distance on candidates via a union-of-signed-
  *    contributions aggregate (missing hours contribute their full
  *    magnitude — a plain relational spelling both engines run
  *    identically).
  *
  * At 100 TB the profile table is |users|·24 rows of longs and the
  * banded join is bounded by band-bucket sizes — the same scale
  * argument as SimHash near-dup.
  */
object TimeSeries {

  /** (user_id, hour, v) — hourly value sums in cents. Hour-of-day is
    * integer micros arithmetic, not `hour(ts)` — the d24 discipline: no
    * date functions for the two engines to disagree on.
    */
  def hourlyProfile(events: DataFrame): DataFrame =
    events.select(col("user_id"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("hour"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("vc"))
      .groupBy(col("user_id"), col("hour"))
      .agg(sum(col("vc")).as("v"))

  /** (user_id, sig) — the 24-bit above-average signature. */
  def signature(prof: DataFrame): DataFrame = {
    val tot = prof.groupBy(col("user_id")).agg(sum(col("v")).as("tot"))
    prof.join(tot, "user_id")
      .groupBy(col("user_id"))
      .agg(sum(expr(
        "CASE WHEN v * 24 > tot THEN shiftleft(CAST(1 AS BIGINT), CAST(hour AS INT)) " +
          "ELSE CAST(0 AS BIGINT) END")).as("sig"))
  }

  /** Top-`k` most similar user pairs by exact L1 profile distance,
    * searched among banded-signature candidates (full recall up to
    * signature Hamming 3). Output: (da, db, l1_cents).
    */
  def topKSimilarPairs(events: DataFrame, k: Int): DataFrame = {
    val prof = hourlyProfile(events).localCheckpoint(true)
    val sig = signature(prof)
    val banded = sig.selectExpr("user_id",
      "stack(4, 0, sig & 63, 1, (sig >> 6) & 63, 2, (sig >> 12) & 63, " +
        "3, (sig >> 18) & 63) AS (band_id, bv)")
    val cand = banded.select(col("band_id"), col("bv"), col("user_id").as("da"))
      .join(banded.select(col("band_id"), col("bv"), col("user_id").as("db")),
        Seq("band_id", "bv"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()
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
