package graft.operators

/** Committed decomposition record for the r9 c70 rewrite (the C70Ab
  * companion): times the checkpoint variants and each consumer pass
  * separately at SPARK_GRAFT_SF_DIR. The decisive r9 finding, measured
  * at 10× data: `repartitionByRange` costs ~11.1 s where the same-size
  * hash shuffle costs ~4.6 s (the range partitioner pays a full
  * sampling pass + per-row ordered routing), which killed both
  * range-partition-based replay shapes and motivated the shipped
  * VALUE-bucket histogram (deterministic `v >> 12`, no sampling, no
  * partition-id consistency to defend — see the c70 scaladoc and
  * PERF.md §r9). Run: `sbt "Test/runMain graft.operators.C70Parts"`.
  */
object C70Parts {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftBridge
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale10")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val vals = graft.queries.Tables.load(spark, sfDir, "lineitem").select(
      col("l_returnflag").as("flag"),
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))

    // warm the scan
    vals.agg(count(lit(1))).collect()

    time("checkpoint (hash 32)") {
      vals.repartition(col("flag"), col("v")).localCheckpoint(true)
    }
    time("range shuffle, no ckpt") {
      vals.repartitionByRange(32, col("flag"), col("v")).agg(count(lit(1))).collect()
    }
    var dist: org.apache.spark.sql.DataFrame = null
    time("checkpoint (range 32)") {
      dist = vals.repartitionByRange(32, col("flag"), col("v")).localCheckpoint(true)
    }
    val digCol = GraftBridge.column(graft.functions.QDigestAgg(
      GraftBridge.expression(col("v")), 24, 2048, Seq(500, 900))
      .toAggregateExpression())
    time("est (digest over ckpt)") {
      dist.groupBy("flag").agg(digCol.as("est")).collect()
    }
    val parted = dist.withColumn("pid", spark_partition_id())
    time("bkt counts") {
      parted.groupBy(col("pid"), col("flag")).agg(count(lit(1))).collect()
    }
    time("ivl-style cond counts") {
      dist.groupBy(col("flag"))
        .agg(sum(when(col("v") <= 500000L, 1L).otherwise(0L)),
          sum(when(col("v") < 900000L, 1L).otherwise(0L))).collect()
    }
    time("slice window (1/32 sel)") {
      val sel = spark.range(6).select(
        (col("id") % 32).cast("int").as("pid"), lit("N").as("flag"),
        lit(50L).as("q"), lit(10L).as("lt"))
      parted.join(broadcast(sel), Seq("pid", "flag"))
        .withColumn("lrn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("pid"), col("flag"), col("q"))
            .orderBy(col("v"))).cast("long"))
        .filter(col("lrn") === col("lt"))
        .agg(count(lit(1))).collect()
    }
    time("full c70 (fresh)") {
      graft.queries.ExtOps.queries("c70_quantile_sketch")(spark, sfDir).collect()
    }
    spark.stop()
  }
}
