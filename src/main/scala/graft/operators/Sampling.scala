package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for training-data pipelines:
  * down-sample over-represented strata (e.g. languages) at exact,
  * reproducible per-stratum rates.
  *
  * The gate is a CONTENT hash, not `rand()`/`TABLESAMPLE`: the same row
  * is kept or dropped on every run, on every executor, after every
  * retry, and in the DuckDB oracle — sampling decisions in a 100 TB
  * pipeline must be replayable or downstream incremental runs diverge.
  * md5 is used (not xxhash64) because both engines implement it
  * identically, same reasoning as the MinHash operators (Dedup.scala).
  */
object Sampling {

  /** Uniform hash gate in [0, 256): the first two hex digits of
    * md5(key-as-string) decoded to an int (`conv(…, 16, 10)`; the oracle
    * decodes the same two digits with instr arithmetic — different
    * spelling, identical integer). One byte of resolution is the
    * deliberate trade for a branch-free, cross-engine-exact expression;
    * rates are expressed as thresholds out of 256.
    */
  def hashGate(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 2), 16, 10).cast("int")

  /** Keep rows whose hash gate falls below the stratum's threshold.
    *
    * @param df        input rows
    * @param key       row-identity column the gate hashes (stable id)
    * @param stratum   stratum column (e.g. lang)
    * @param rates     stratum value → threshold out of 256 (e.g. 64 ≈ 25%)
    * @param default   threshold for unlisted strata
    */
  def stratifiedSample(
      df: DataFrame,
      key: Column,
      stratum: Column,
      rates: Map[String, Int],
      default: Int): DataFrame = {
    val gate = hashGate(key)
    val thr = rates.foldLeft(lit(default)) { case (acc, (value, t)) =>
      when(stratum === value, lit(t)).otherwise(acc)
    }
    df.filter(gate < thr)
  }

  /** Per-ROW weighted sampling: keep a row with probability
    * `weight256 / 256`, where the weight is any integer expression of the
    * row itself (a quality score, a length ramp, a source prior). The
    * quality-weighted corpus downsample every curation pipeline runs —
    * same replayability contract as [[stratifiedSample]], generalized
    * from per-stratum constants to per-row weights. Weights are clamped
    * to [0, 256] (keep-probability is a probability): w > 256 keeps
    * always, w < 0 drops always — the clamp makes that explicit, so
    * E[kept] = Σ clamp(w)/256 holds EXACTLY for any input and the
    * caller's actual-vs-expected audit (c37) never silently drifts on
    * out-of-range weights.
    */
  def weightedSample(df: DataFrame, key: Column, weight256: Column): DataFrame =
    df.filter(hashGate(key) < greatest(lit(0), least(lit(256), weight256)))
}
