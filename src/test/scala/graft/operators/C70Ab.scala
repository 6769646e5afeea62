package graft.operators

/** Throwaway-style A/B harness for c70's component costs (kept, like
  * D22Ab, as the committed record of the measurement): times the digest
  * aggregate alone, the exact-verification cum/window leg alone, and
  * the full query, at SPARK_GRAFT_SF_DIR (default sf0.1).
  * Run: `sbt "Test/runMain graft.operators.C70Ab"`.
  */
object C70Ab {

  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.GraftBridge

    val vals = graft.queries.Tables.load(spark, sfDir, "lineitem").select(
      col("l_returnflag").as("flag"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s ${ts.sorted.apply(1)}%.3f s  (passes ${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    val digCol = GraftBridge.column(graft.functions.QDigestAgg(
      GraftBridge.expression(col("v")), 24, 2048, Seq(500, 900))
      .toAggregateExpression())

    time("scan+project only") {
      vals.agg(count(lit(1))).collect()
    }
    time("cast forced, sum(v)") {
      vals.groupBy("flag").agg(sum(col("v"))).collect()
    }
    time("digest agg") {
      vals.groupBy("flag").agg(count(lit(1)).as("n"), digCol.as("est")).collect()
    }
    time("digest agg, pre-agg'd input") {
      // raw rows again (the data is ~unique): no row reduction, no win
      vals.groupBy("flag").agg(digCol.as("est")).collect()
    }
    time("digest weighted from counts") {
      // the r8-first-cut c70 shape, SUPERSEDED by the raw-repartition
      // shape now shipped: weighted ingest of a (flag, v, c) counts
      // table. Rationale was value-domain compression + post-shuffle
      // parallelism, but prices are ~unique (594,330 distinct (flag, v)
      // of 600,000 rows at sf0.1) so the hash aggregation bought no row
      // reduction — full-query 2.0 s warm vs 1.1 s for raw repartition
      // (which gets the same post-shuffle parallelism without the agg).
      val counts = vals.groupBy("flag", "v").agg(count(lit(1)).as("c"))
      val wCol = GraftBridge.column(graft.functions.QDigestAgg(
        GraftBridge.expression(col("v")), 24, 2048, Seq(500, 900),
        GraftBridge.expression(col("c"))).toAggregateExpression())
      counts.groupBy("flag").agg(sum(col("c")).as("n"), wCol.as("est")).collect()
    }
    time("digest from raw repartition") {
      // the shipped shape's digest leg: plain repartition for
      // parallelism (the bench file is one row group), no aggregation
      vals.repartition(col("flag"), col("v"))
        .groupBy("flag").agg(count(lit(1)).as("n"), digCol.as("est")).collect()
    }
    time("rn window leg (raw rows)") {
      // the shipped shape's replay leg: row_number over raw rows —
      // within ties rn is arbitrary but min(v | rn >= t) is the value
      // at rank t either way; rank intervals are plain conditional
      // counts and need no window
      vals.repartition(col("flag"), col("v"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("flag").orderBy("v")))
        .agg(count(lit(1))).collect()
    }
    time("counts groupBy(flag,v)") {
      vals.groupBy("flag", "v").agg(count(lit(1)).as("c")).agg(count(lit(1))).collect()
    }
    time("cum window leg") {
      vals.groupBy("flag", "v").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("flag").orderBy("v")))
        .agg(count(lit(1))).collect()
    }
    time("two-level rank leg") {
      // candidate replay shape, measured and REJECTED at this scale:
      // range-partition by (flag, v) slices each flag's value order into
      // contiguous runs, local row_number per (pid, flag), partition-
      // count offsets broadcast back (the c20/c26 two-level prefix sum)
      // — 32-way parallel sort instead of a |flags|-task window sort.
      // At 600k rows it measures 0.86 s vs 0.51 s for the plain window:
      // the range exchange + the pid-hash window exchange cost more
      // than the 3-task sort saves. The crossover favors two-level only
      // when per-flag row counts dwarf a single task (the c26 regime);
      // c70's production path at that scale is the digest alone anyway.
      val parted = vals.repartitionByRange(32, col("flag"), col("v"))
        .withColumn("pid", spark_partition_id())
      val wLoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pid"), col("flag")).orderBy(col("v"))
      val local = parted.withColumn("lrn", row_number().over(wLoc).cast("long"))
      val bkt = local.groupBy(col("pid"), col("flag"))
        .agg(count(lit(1)).as("p_rows"))
      val offs = bkt.as("a")
        .join(broadcast(bkt.as("b")),
          col("b.flag") === col("a.flag") && col("b.pid") < col("a.pid"), "left")
        .groupBy(col("a.pid").as("pid"), col("a.flag").as("flag"))
        .agg(coalesce(sum(col("b.p_rows")), lit(0L)).as("rn_off"))
      local.join(broadcast(offs), Seq("pid", "flag"))
        .withColumn("rn", col("lrn") + col("rn_off"))
        .agg(count(lit(1))).collect()
    }
    time("slice-select rank leg") {
      // r9 candidate, measured and REJECTED: the two-level OFFSET TABLE
      // locates the one RANGE partition containing each target rank and
      // only those slices sort — scale-safe in shape, but it inherits
      // repartitionByRange's premium (sampling pass + per-row ordered
      // routing: 11.1 s vs 4.6 s for the same hash shuffle at 10×,
      // C70Parts), measuring 1.15 s here and 11.0 s at 10×. The shipped
      // replay keeps the slice-select idea but swaps range partitions
      // for deterministic VALUE buckets (v >> 12) — no sampling, no
      // partition-id consistency to defend (see the c70 scaladoc).
      val n3 = vals.groupBy("flag").agg(count(lit(1)).as("n"))
      val tg = n3.select(col("flag"),
        expr("(500 * n + 999) DIV 1000").as("t50"),
        expr("(900 * n + 999) DIV 1000").as("t90"))
      val parted = vals.repartitionByRange(32, col("flag"), col("v"))
        .withColumn("pid", spark_partition_id())
      val bkt = parted.groupBy(col("pid"), col("flag"))
        .agg(count(lit(1)).as("p_rows"))
      val offs = bkt.as("a")
        .join(broadcast(bkt.as("b")),
          col("b.flag") === col("a.flag") && col("b.pid") < col("a.pid"), "left")
        .groupBy(col("a.pid").as("pid"), col("a.flag").as("flag"),
          col("a.p_rows").as("p_rows"))
        .agg(coalesce(sum(col("b.p_rows")), lit(0L)).as("rn_off"))
      val sel = offs.join(tg, "flag")
        .select(col("pid"), col("flag"), col("rn_off"), col("p_rows"),
          explode(array(struct(lit(50L).as("q"), col("t50").as("t")),
            struct(lit(90L).as("q"), col("t90").as("t")))).as("s"))
        .filter(col("s.t") > col("rn_off") &&
          col("s.t") <= col("rn_off") + col("p_rows"))
        .select(col("pid"), col("flag"), col("s.q").as("q"),
          (col("s.t") - col("rn_off")).as("lt"))
      parted.join(broadcast(sel), Seq("pid", "flag"))
        .withColumn("lrn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("pid"), col("flag"), col("q"))
            .orderBy(col("v"))).cast("long"))
        .filter(col("lrn") === col("lt"))
        .agg(count(lit(1))).collect()
    }
    time("full c70") {
      graft.queries.ExtOps.queries("c70_quantile_sketch")(spark, sfDir).collect()
    }
    spark.stop()
  }
}
