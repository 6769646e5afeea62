package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Oracle-replayable HyperLogLog distinct counting.
  *
  * Spark's own `approx_count_distinct` (HLL++, used by c24) is the
  * production path, but its sketch is engine-private: no other system
  * can reproduce its estimate, so the correctness harness can only
  * rows-check it. This operator is the c42 discipline applied to
  * distinct counting — every bit of the sketch is derived from md5 and
  * every arithmetic step is 64-bit integer, so DuckDB replays the
  * ENTIRE estimator and the results hash-match cross-engine:
  *
  *   - register index = first 8 md5 bits of the key, mod [[M]];
  *   - rank = leading-zero count (+1) of the next 32 md5 bits,
  *     spelled `33 - length(bin(x))` — identical in Spark and DuckDB;
  *   - registers = `max(rank)` per (group, bucket) — max is duplicate-
  *     insensitive, so no `distinct` shuffle anywhere on the sketch
  *     path, and partial aggregation combines map-side (at 100 TB only
  *     the ≤ M longs per group cross the wire, like any HLL);
  *   - the harmonic mean runs scaled by 2^33: each register contributes
  *     `1 << (33 - M_j)`, the estimate is `(AlphaPpm·M²·2^33) div S div
  *     10^6` — floor division on positive longs, bit-identical in both
  *     engines, no float anywhere.
  *
  * The estimator is the raw HLL of Flajolet/Fusy/Gandouet/Meunier 2007
  * (alpha_32 as the fixed rational [[AlphaPpm]] ppm); we deliberately
  * skip the small-range linear-counting correction because it needs
  * `ln`, which is exactly the cross-engine float hazard this operator
  * exists to avoid. `n_empty` (empty registers) is emitted so a reader
  * can see when a group is in that small-range regime; accuracy is
  * σ ≈ 1.04/√32 ≈ 18% by the published analysis, measured ≤ ~20% in
  * HllDistinctSpec.
  */
object HllDistinct {

  /** Register count (2^5 buckets from the first 8 md5 bits, mod 32). */
  val M = 32

  /** alpha_32 = 0.7213/(1 + 1.079/32) ≈ 0.697, fixed at 697000 ppm so
    * the estimate is a pure integer expression.
    */
  val AlphaPpm = 697000L

  /** AlphaPpm · M² · 2^33 — the scaled numerator (≈ 6.13e18, fits a
    * long with the max-rank-33 scaling; that headroom is why the rank
    * tops out at 33 = 32 hash bits + 1).
    */
  val Num: Long = AlphaPpm * M.toLong * M.toLong * (1L << 33)

  /** Frame-complete register table for a keyed HLL: one row per
    * (group, bucket 0..[[M]]) with `mj` = max rank seen (0 for an empty
    * register). This is the MERGEABLE sketch surface: union of two key
    * sets = element-wise `max` of their register rows (max is
    * associative/duplicate-insensitive), which is what [[estimate]]'s
    * per-group readout and c71's pairwise inclusion-exclusion both
    * consume. Rows with a NULL group are excluded up front.
    */
  def registers(rows: DataFrame, group: Column, key: Column): DataFrame =
    frameComplete(registerCore(rows, group, key))

  /** The register table WITHOUT frame completion: hash → bucket/rank →
    * `max` per (group, bucket). This is the exact shape Structured
    * Streaming maintains incrementally ([[graft.streaming.OverlapStream]]):
    * a groupBy-max whose state is bounded by |groups|·[[M]] rows no
    * matter how many documents stream through. Batch callers want
    * [[frameComplete]] on top (the readout needs empty registers).
    */
  def registerCore(rows: DataFrame, group: Column, key: Column): DataFrame = {
    // null keys are excluded with the null groups: a null key hashes to
    // a null bucket/rank, which would persist as a junk (g, null, null)
    // register row in the streamed/stored state (frame completion would
    // silently drop it at readout, but the state should never carry it)
    val h = rows.filter(group.isNotNull && key.isNotNull)
      .select(group.as("g"), md5(key.cast("binary")).as("h"))
    h.select(col("g"),
        expr(s"CAST(conv(substring(h, 1, 2), 16, 10) AS BIGINT) % $M").as("bucket"),
        expr("CAST(conv(substring(h, 3, 8), 16, 10) AS BIGINT)").as("x"))
      .withColumn("rank",
        expr("CASE WHEN x = 0 THEN 33 ELSE 33 - length(bin(x)) END"))
      .groupBy(col("g"), col("bucket"))
      .agg(max(col("rank")).as("mj"))
  }

  /** Restore empty registers: the (group × all buckets) frame joined
    * over a sparse (g, bucket, mj) table, absent cells as mj = 0.
    * Empty registers still contribute 2^33 to the harmonic sum, so the
    * readout is wrong without this (tiny: |groups| · M rows).
    */
  def frameComplete(regs0: DataFrame): DataFrame = {
    val spark = regs0.sparkSession
    // the frame columns are re-aliased (fresh attribute ids) because the
    // frame derives from regs0 itself — joining them back raw is a
    // self-join whose reference dedup fails on View-backed plans (the
    // streaming memory sink OverlapStream reads)
    val frame = regs0.select(col("g").as("fg")).distinct()
      .crossJoin(spark.range(M).select(col("id").as("fb")))
    frame.join(regs0,
        col("fg") === col("g") && col("fb") === col("bucket"), "left")
      .select(col("fg").as("g"), col("fb").as("bucket"),
        coalesce(col("mj"), lit(0)).as("mj"))
  }

  /** Pairwise union/intersection readout over a frame-complete register
    * table — c71's sketch algebra, factored so the batch query and the
    * streaming monitor share ONE spelling. For every group pair a < b:
    * per-group estimates, the union estimate from element-wise register
    * max, and the inclusion-exclusion shared estimate clamped at 0.
    * Output: (source_a, source_b, est_a, est_b, est_union, est_shared)
    * ordered by the pair.
    */
  def pairwiseOverlap(regs: DataFrame): DataFrame = {
    val perSrc = regs.groupBy(col("g"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(33 - mj AS INT))")).as("s"))
      .select(col("g"), estFromS("s").as("est"))
    regs.select(col("g").as("source_a"), col("bucket"), col("mj").as("ma"))
      .join(regs.select(col("g").as("source_b"), col("bucket"), col("mj").as("mb")),
        "bucket")
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(expr(
        "shiftleft(CAST(1 AS BIGINT), CAST(33 - greatest(ma, mb) AS INT))")).as("s_u"))
      .select(col("source_a"), col("source_b"), estFromS("s_u").as("est_union"))
      .join(perSrc.select(col("g").as("source_a"), col("est").as("est_a")), "source_a")
      .join(perSrc.select(col("g").as("source_b"), col("est").as("est_b")), "source_b")
      .select(col("source_a"), col("source_b"), col("est_a"), col("est_b"),
        col("est_union"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L))
          .as("est_shared"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** The integer harmonic-mean readout of a register-sum column (named
    * by `sumCol`): `(AlphaPpm·M²·2^33) div s div 10^6` — floor division
    * on positive longs, bit-identical cross-engine. Takes the column
    * NAME because Spark's `/` on Columns is always double division;
    * `div` (integral divide) only has an SQL-text spelling.
    */
  def estFromS(sumCol: String): Column =
    expr(s"(${Num}L div $sumCol) div 1000000")

  /** Per-group distinct estimate next to the exact count.
    * Output: (g, n_exact, n_est, n_empty) ordered by g. Rows with a
    * NULL group are excluded up front — the final equi-join on the
    * group key is not null-safe, so a NULL group would otherwise be
    * counted on both sides and then silently dropped from the output.
    */
  def estimate(rows: DataFrame, group: Column, key: Column): DataFrame = {
    val h = rows.filter(group.isNotNull)
      .select(group.as("g"), md5(key.cast("binary")).as("h"))
    val regs = registers(rows, group, key)
    val agg = regs.groupBy(col("g")).agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(33 - mj AS INT))")).as("s"),
      sum(when(col("mj") === 0, 1L).otherwise(0L)).as("n_empty"))
    // The exact count exists to GRADE the sketch (like c42's exact_n);
    // a production rollup reads only the register path above.
    val exact = h.groupBy(col("g")).agg(countDistinct(col("h")).as("n_exact"))
    exact.join(agg, "g")
      .select(col("g"), col("n_exact"),
        estFromS("s").as("n_est"), col("n_empty"))
      .orderBy(col("g"))
  }
}
