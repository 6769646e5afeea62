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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) (FIXTURES.md §3), which Spark
      // rejects natively: read nanos as long, truncate to micros — the same
      // truncation DuckDB applies converting ns→us.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Money/measure column → exact decimal for order-independent sums.
    * Scale 6 > the data's 2 actual decimal digits, so the cast never
    * rounds at a half boundary.
    */
  def dec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(DecimalType(18, 6))

  /** Embedding element → exact decimal. Floats are ~unit scale; 9
    * fractional digits keeps products within decimal(38) in both engines.
    */
  def vdec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(DecimalType(12, 9))
}
