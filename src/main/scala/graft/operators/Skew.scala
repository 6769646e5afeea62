package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling covers joins; this
  * covers the aggregation side: a heavy-hitter key (one user producing a
  * large share of 100 TB of events) funnels its whole group through one
  * reducer in a naive groupBy.
  *
  * [[saltedSum]] runs the classic two-phase shape: phase 1 groups by
  * (key, salt) — spreading a hot key over `salts` reducers — and phase 2
  * merges the partials by key. Identical results to a direct groupBy
  * (sums are associative), bounded per-reducer load.
  */
object Skew {

  /** Two-phase salted aggregation: counts plus any number of SUM columns.
    * `sums` maps output column name → summand expression.
    *
    * The salt is derived from ROW CONTENT (xxhash64 over all columns),
    * never from `spark_partition_id`/`monotonically_increasing_id`: those
    * are nondeterministic across task retries, so a recomputed map stage
    * after a shuffle-fetch failure could re-salt rows differently while
    * reducers keep partially-fetched data — double-counting or dropping
    * rows. A content hash re-salts identically on every replay.
    * (Identical rows share a salt, which only shifts load if one exact
    * row dominates a hot key — then bump `salts` or add a distinguishing
    * column upstream.)
    */
  def saltedSum(
      df: DataFrame,
      key: Column,
      sums: Map[String, Column],
      salts: Int = 16): DataFrame = {
    val partialAggs = sums.toSeq.map { case (name, c) => sum(c).as(name) } :+
      count(lit(1)).as("__n")
    val salt = pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts))
    val partial = df
      .groupBy(key.as("__key"), salt.as("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sums.keys.toSeq.map(n => sum(col(n)).as(n)) :+
      sum(col("__n")).as("n")
    partial.groupBy(col("__key"))
      .agg(finalAggs.head, finalAggs.tail: _*)
      .withColumnRenamed("__key", "key")
  }

  /** Salted equi-join for a skewed FACT side: the fact table's hot join
    * key would funnel through one reducer of a shuffle join, so each
    * fact row gets a content-derived salt in [0, salts) and the (small)
    * build side is replicated once per salt value; the join key becomes
    * (key, salt) — a hot key now spreads over `salts` reducers. Results
    * are identical to the plain join (every fact row still meets every
    * matching build row exactly once — its own salt's replica).
    *
    * This is what AQE's skew-join split does at runtime; the explicit
    * operator exists for engines/plans where AQE can't see the skew
    * (e.g. skew introduced by an upstream transform at plan time) and as
    * the deterministic, replay-stable formulation (content-hash salt —
    * same retry discipline as [[saltedSum]]). `build` must be the small
    * side: it is replicated ×`salts` and joined per (key, salt); at
    * broadcast size the exchange disappears entirely.
    */
  def saltedJoin(
      fact: DataFrame,
      build: DataFrame,
      key: String,
      salts: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(salts)).cast("int")
    val salted = fact.withColumn("__salt", salt)
    val replicated = build
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
