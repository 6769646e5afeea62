package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders + cross-engine determinism helpers for the declared query
  * inventory (SURVEY §2.3).
  *
  * Determinism contract with the DuckDB oracle: the testdata's monetary
  * columns are float64 (FIXTURES.md §3), and a double SUM is
  * order-dependent — Spark partitions vs DuckDB's scan order would
  * disagree in the last ulp. Every aggregated double therefore goes
  * through exact decimal arithmetic (cast → decimal sum → cast back to
  * double), which is order-independent and bit-identical across engines.
  */
object Tables {

  // Memoized source DataFrames per (session, dir, table): a bench/verify
  // run touches the same handful of parquet tables from 36 queries, and
  // every spark.read.parquet re-lists the path and re-reads footers for
  // schema. The cached object is just the unresolved plan — no data is
  // pinned (this is NOT .cache()) — so reuse only skips redundant
  // planning I/O. Keyed by session too: plans are session-bound.
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    loaded.computeIfAbsent((spark, dir, name), { case (s, d, n) =>
      if (n == "events") {
        // events.ts is parquet TIMESTAMP(NANOS) (FIXTURES.md §3), which Spark
        // rejects natively: read nanos as long, truncate to micros — the same
        // truncation DuckDB applies converting ns→us.
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.read.parquet(s"$d/$n.parquet")
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      } else s.read.parquet(s"$d/$n.parquet")
    })

  /** Money/measure column → exact decimal(18,2): the data carries exactly
    * 2 decimal digits (verified), so this cast is lossless. Keeping the
    * scale minimal matters: a SUM's scaled integer must stay below 2^53,
    * where BOTH engines' decimal→double conversion is exactly rounded
    * (DuckDB's int128→double path is not correctly rounded above that).
    */
  def dec2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(DecimalType(18, 2))

  /** Discount/tax factor → decimal(10,4): products of two 2-decimal
    * factors are exactly 4-decimal, so this cast is lossless too; price ×
    * factor sums then sit at scale 6 — still < 2^53 scaled at sf0.1.
    */
  def fac4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(DecimalType(10, 4))
}
