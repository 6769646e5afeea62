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

  // Memoized source DataFrames per (session → (dir, table)): a
  // bench/verify run touches the same handful of parquet tables from 45
  // queries, and every spark.read.parquet re-lists the path and re-reads
  // footers for schema. The cached object is just the analyzed plan — no
  // data is pinned (this is NOT .cache()) — so reuse only skips
  // redundant planning I/O. The outer map holds sessions WEAKLY so a
  // stopped session's plans become collectable; the cached plan freezes
  // the file LISTING, so a caller that rewrites an input path must call
  // [[invalidate]] (the driver's testdata is immutable — this is for
  // library reuse).
  private val loaded =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]])

  /** Drop memoized plans (all sessions) — call after rewriting a source
    * path that was previously loaded.
    */
  def invalidate(): Unit = loaded.synchronized(loaded.clear())

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Flag-gated bucketed fact backbone (sources.Bucketed, r14): when
    // the layout is enabled AND built for this dir, lineitem/orders
    // resolve to their orderkey-bucketed catalog tables — every
    // orderkey join downstream reads co-located buckets with no
    // Exchange, no query spelling changes. Same rows, same schema;
    // default OFF so the oracle-paired runs read the identical raw
    // parquet. Not memoized: spark.table is a catalog lookup, and the
    // flag may be toggled per-run within one session (A/B legs).
    if (graft.sources.Bucketed.enabled(spark)) {
      val bt = graft.sources.Bucketed.backboneTable(spark, dir, name)
      if (bt.isDefined) return bt.get
    }
    val perSession = loaded.synchronized {
      var m = loaded.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]
        loaded.put(spark, m)
      }
      m
    }
    perSession.computeIfAbsent((dir, name), { case (d, n) =>
      if (n == "events") {
        // events.ts has shipped two ways across fixture generations:
        // parquet TIMESTAMP(NANOS) (which Spark rejects natively — read
        // nanos as long, truncate to micros, the same truncation DuckDB
        // applies converting ns→us) and plain TIMESTAMP(MICROS) without
        // UTC adjustment (Spark reads TIMESTAMP_NTZ). Branch on the
        // footer type and normalize BOTH to session-zoned TimestampType
        // at micros — the session zone is pinned to UTC everywhere
        // (Bench/Verify/tests), so the NTZ cast reinterprets the naive
        // value as the same UTC instant the nanos path produced.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = spark.read.parquet(s"$d/$n.parquet")
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case org.apache.spark.sql.types.TimestampNTZType =>
            // The NTZ→timestamp cast reinterprets the naive value in
            // the SESSION zone; anything but UTC silently shifts every
            // instant. Fail loudly instead of producing shifted data.
            val tz = spark.conf.get("spark.sql.session.timeZone")
            require(java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC,
              s"events.ts is TIMESTAMP_NTZ: the cast to timestamp needs " +
                s"spark.sql.session.timeZone=UTC, but the session is pinned to '$tz'")
            raw.withColumn("ts", col("ts").cast("timestamp"))
          case _ => raw
        }
      } else spark.read.parquet(s"$d/$n.parquet")
    })
  }

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

  /** Money/factor column → exact scaled-by-100 BIGINT — the fast-path
    * twin of [[dec2]]/[[fac4]] for hot fact scans. The data carries
    * exactly 2 decimal digits, so value×100 is an integer; the double
    * multiply lands within ~1e-9 of it and ROUND recovers it exactly,
    * and identically in any IEEE engine (both Spark and DuckDB compute
    * the same correctly-rounded `x * 100`, and no value sits near a .5
    * tie, so HALF_UP vs half-away never diverges). Products of two s2
    * columns are exact scale-4 longs; per-group sums stay exact in
    * INT64 up to ~9.2e14 currency units — headroom past SF10k per
    * group (widen to a two-tier sum beyond that). The final double
    * divides the long sum by 1e4: long→double is correctly rounded in
    * both engines, but the ORACLE spelling must be
    * `CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) / 10000.0` — DuckDB's
    * SUM(BIGINT) returns HUGEINT, whose direct →DOUBLE conversion is
    * not correctly rounded above 2^53.
    *
    * Why it exists: Decimal(18,2) × Decimal(10,4) has result precision
    * 29 > 18 (Decimal's long-backed limit), so Spark boxes every fact
    * row's multiply in java.math.BigDecimal. The s2 spelling is pure
    * whole-stage-codegen long arithmetic — measured ~30% off b9/b10 at
    * 10× (ScanShapeAb `revlong`: rev agg-only 0.58→0.38 s, b10 full
    * 1.82→1.29, b9 full 3.22→2.18).
    */
  def s2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, round}
    round(c * lit(100)).cast("long")
  }
}
