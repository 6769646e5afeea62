package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables.{load, dec2}
import org.apache.spark.sql.expressions.Window

/** A/B decomposition of the scan-shaped 10× gap (r9 verdict item 1):
  * b13 (11.3 s vs DuckDB 1.8) and d22 (11.3 vs 1.1) at 10× data are
  * pure scan→shuffle→aggregate plans. Hypothesis under test: the
  * replica files are ONE parquet row group, so Spark's scan — and the
  * partial hash aggregate fused above it — runs in ONE task while 31
  * cores idle. Legs time the pipeline cumulatively to locate the cost,
  * then try candidate fixes (raw-row repartition before the aggregate;
  * a multi-file rewrite of the input).
  *
  * Run: `sbt "Test/runMain graft.operators.ScanShapeAb <dir> [leg...]"`.
  */
object ScanShapeAb {

  private def time(n: Int)(body: => Unit): Double = {
    body // warm
    (1 to n).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.sorted.apply(n / 2)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale10")
    val legs = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    def want(l: String) = legs.isEmpty || legs(l)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        graft.Tuning.shufflePartitionsFor(graft.Tuning.dirBytes(dir)).toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def report(name: String, sec: Double): Unit =
      println(f"[scanshape] $name%-28s $sec%7.3f s")

    val li = load(spark, dir, "lineitem")

    // ---- b13 legs ----
    if (want("scan")) report("scan+decode (sum 1 col)",
      time(3)(li.agg(sum(col("l_quantity"))).collect()))
    if (want("scan4")) report("scan+decode (4 cols)",
      time(3)(li.agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
        max(col("l_partkey")), max(col("l_suppkey"))).collect()))
    if (want("agg")) report("b13 agg only (count groups)",
      time(3)(li.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(dec2(col("l_extendedprice"))).as("rev_d"))
        .agg(count(lit(1))).collect()))
    if (want("aggrep")) report("b13 agg, raw repartition",
      time(3)(li.repartition(col("l_partkey"), col("l_suppkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(dec2(col("l_extendedprice"))).as("rev_d"))
        .agg(count(lit(1))).collect()))
    def b13(pre: DataFrame => DataFrame): DataFrame = {
      graft.plans.TopKInstall.install(spark)
      val ps = pre(load(spark, dir, "lineitem"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(dec2(col("l_extendedprice"))).as("rev_d"),
          count(lit(1)).as("n_items"))
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("rev_d").desc, col("l_suppkey"))
      ps.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_partkey"), col("l_suppkey").as("top_suppkey"),
          col("rev_d").cast("double").as("revenue"), col("n_items"))
        .orderBy(col("l_partkey"))
    }
    if (want("aggsum")) report("b13 agg only (max rev, dec)",
      time(3)(li.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(dec2(col("l_extendedprice"))).as("rev_d"))
        .agg(max(col("rev_d"))).collect()))
    if (want("aggcents")) report("b13 agg only (max rev, cents)",
      time(3)(li.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(expr(
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("rev_c"))
        .agg(max(col("rev_c"))).collect()))
    if (want("b13")) report("b13 full (as declared)",
      time(3)(b13(identity).collect()))
    if (want("b13rep")) report("b13 full, raw repartition",
      time(3)(b13(_.repartition(col("l_partkey"), col("l_suppkey"))).collect()))
    // single-exchange + integer-cents variant: repartition the RAW rows
    // by l_partkey (satisfies both the (part,supp) aggregate and the
    // per-part heap downstream — ONE exchange total), sum exact cents
    // as longs (primitive codegen adds, no Decimal objects), unscale at
    // the very end (cents < 2^53 ⇒ bit-identical double).
    def b13cents(pre: DataFrame => DataFrame): DataFrame = {
      graft.plans.TopKInstall.install(spark)
      val ps = pre(load(spark, dir, "lineitem"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(expr(
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("rev_c"),
          count(lit(1)).as("n_items"))
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("rev_c").desc, col("l_suppkey"))
      ps.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_partkey"), col("l_suppkey").as("top_suppkey"),
          (col("rev_c").cast("double") / 100.0).as("revenue"), col("n_items"))
        .orderBy(col("l_partkey"))
    }
    if (want("b13cents")) report("b13 cents (declared shape)",
      time(3)(b13cents(identity).collect()))
    if (want("b13part")) report("b13 cents, repart(part)",
      time(3)(b13cents(_.repartition(col("l_partkey"))).collect()))

    // ---- d22 legs ----
    def d22(pre: DataFrame => DataFrame): DataFrame =
      pre(load(spark, dir, "lineitem"))
        .selectExpr(
          """stack(5,
            | 'l_orderkey', CAST(l_orderkey AS DOUBLE),
            | 'l_partkey', CAST(l_partkey AS DOUBLE),
            | 'l_suppkey', CAST(l_suppkey AS DOUBLE),
            | 'l_linenumber', CAST(l_linenumber AS DOUBLE),
            | 'l_quantity', CAST(l_quantity AS DOUBLE)) AS (col_name, v)""".stripMargin)
        .groupBy(col("col_name"))
        .agg(count(col("v")).as("n"),
          countDistinct(col("v")).as("n_distinct"),
          min(col("v")).as("vmin"), max(col("v")).as("vmax"))
        .orderBy(col("col_name"))
    if (want("d22")) report("d22 full (as declared)",
      time(3)(d22(identity).collect()))
    if (want("d22rep")) report("d22 full, raw repartition",
      time(3)(d22(_.repartition(spark.sparkContext.defaultParallelism)).collect()))
    // manual two-level distinct: countDistinct's Expand duplicates every
    // unpivoted row per aggregate group (gid) before the partial agg;
    // spelling the (col_name, v) histogram explicitly dedups 5N rows in
    // ONE partial agg and computes count/min/max from the histogram —
    // no Expand, half the partial-agg input.
    def d22hist(pre: DataFrame => DataFrame): DataFrame =
      pre(load(spark, dir, "lineitem"))
        .selectExpr(
          """stack(5,
            | 'l_orderkey', CAST(l_orderkey AS DOUBLE),
            | 'l_partkey', CAST(l_partkey AS DOUBLE),
            | 'l_suppkey', CAST(l_suppkey AS DOUBLE),
            | 'l_linenumber', CAST(l_linenumber AS DOUBLE),
            | 'l_quantity', CAST(l_quantity AS DOUBLE)) AS (col_name, v)""".stripMargin)
        .filter(col("v").isNotNull)
        .groupBy(col("col_name"), col("v")).agg(count(lit(1)).as("c"))
        .groupBy(col("col_name"))
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
          min(col("v")).as("vmin"), max(col("v")).as("vmax"))
        .orderBy(col("col_name"))
    if (want("d22hist")) report("d22 two-level hist",
      time(3)(d22hist(identity).collect()))
    if (want("d22histrep")) report("d22 two-level hist, repart",
      time(3)(d22hist(_.repartition(spark.sparkContext.defaultParallelism)).collect()))
    // residual decomposition (r12): where do d22hist's ~2.2-2.4 s go?
    // stack decode alone vs level-1 histogram alone — level 2 is 5 keys
    // over domain-bounded rows, provably noise.
    if (want("d22stack")) report("d22 stack+count only",
      time(3)(load(spark, dir, "lineitem")
        .selectExpr(
          """stack(5,
            | 'l_orderkey', CAST(l_orderkey AS DOUBLE),
            | 'l_partkey', CAST(l_partkey AS DOUBLE),
            | 'l_suppkey', CAST(l_suppkey AS DOUBLE),
            | 'l_linenumber', CAST(l_linenumber AS DOUBLE),
            | 'l_quantity', CAST(l_quantity AS DOUBLE)) AS (col_name, v)""".stripMargin)
        .agg(count(col("v"))).collect()))
    if (want("d22l1")) report("d22 level-1 hist only",
      time(3)(load(spark, dir, "lineitem")
        .selectExpr(
          """stack(5,
            | 'l_orderkey', CAST(l_orderkey AS DOUBLE),
            | 'l_partkey', CAST(l_partkey AS DOUBLE),
            | 'l_suppkey', CAST(l_suppkey AS DOUBLE),
            | 'l_linenumber', CAST(l_linenumber AS DOUBLE),
            | 'l_quantity', CAST(l_quantity AS DOUBLE)) AS (col_name, v)""".stripMargin)
        .groupBy(col("col_name"), col("v")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1))).collect()))
    // candidate A: int column ids in the histogram key (string group
    // keys hash/compare/shuffle a pointer-chased UTF8String; a (int,
    // double) key is a flat 12-byte compare), mapped back at the end.
    def d22int(): DataFrame =
      load(spark, dir, "lineitem")
        .selectExpr(
          """stack(5,
            | 0, CAST(l_orderkey AS DOUBLE),
            | 1, CAST(l_partkey AS DOUBLE),
            | 2, CAST(l_suppkey AS DOUBLE),
            | 3, CAST(l_linenumber AS DOUBLE),
            | 4, CAST(l_quantity AS DOUBLE)) AS (cid, v)""".stripMargin)
        .groupBy(col("cid"), col("v")).agg(count(lit(1)).as("c"))
        .groupBy(col("cid"))
        .agg(sum(when(col("v").isNotNull, col("c")).otherwise(0L)).as("n"),
          count(when(col("v").isNotNull, 1)).as("n_distinct"),
          min(col("v")).as("vmin"), max(col("v")).as("vmax"))
        .select(element_at(array(lit("l_orderkey"), lit("l_partkey"),
            lit("l_suppkey"), lit("l_linenumber"), lit("l_quantity")),
            col("cid") + 1).as("col_name"),
          col("n"), col("n_distinct"), col("vmin"), col("vmax"))
        .orderBy(col("col_name"))
    if (want("d22int")) report("d22 int-keyed hist",
      time(3)(d22int().collect()))
    // candidate B: 5-way union of per-column profiles — no stack (no 5N
    // row materialization), each leg's hash-agg key is ONE double, and
    // the 5 scan+partial-agg stages are DAG-independent so the scheduler
    // runs them concurrently (fills the cores a single-row-group scan
    // leaves idle; at real multi-file scale it's simply 5 narrower
    // column-pruned scans).
    def d22u5(): DataFrame = {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity")
      cols.map { c =>
        load(spark, dir, "lineitem")
          .select(col(c).cast("double").as("v"))
          .groupBy(col("v")).agg(count(lit(1)).as("c"))
          .agg(sum(when(col("v").isNotNull, col("c")).otherwise(0L)).as("n"),
            count(when(col("v").isNotNull, 1)).as("n_distinct"),
            min(col("v")).as("vmin"), max(col("v")).as("vmax"))
          .select(lit(c).as("col_name"), col("n"), col("n_distinct"),
            col("vmin"), col("vmax"))
      }.reduce(_.unionByName(_)).orderBy(col("col_name"))
    }
    if (want("d22u5")) report("d22 5-way union, no stack",
      time(3)(d22u5().collect()))

    // ---- c70 pass decomposition (r12): where do the ~4.6 s at 10× go?
    // The declared plan is ONE hash exchange + localCheckpoint, then 4
    // cached columnar passes (stats, digest, histogram, slice). Legs
    // time the pipeline cumulatively.
    if (want("c70parts")) {
      import org.apache.spark.sql.GraftBridge
      val vals = load(spark, dir, "lineitem").select(
        col("l_returnflag").as("flag"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))
      report("c70 exchange+checkpoint",
        time(3)(vals.repartition(col("flag"), col("v"))
          .localCheckpoint(true).count()))
      val dist = vals.repartition(col("flag"), col("v")).localCheckpoint(true)
      report("c70 stats pass",
        time(3)(dist.agg(count(lit(1)), min(col("v")), max(col("v"))).head()))
      def digCol = GraftBridge.column(graft.functions.QDigestAgg(
        GraftBridge.expression(col("v")), 24, 2048, Seq(500, 900))
        .toAggregateExpression())
      report("c70 digest pass",
        time(3)(dist.groupBy("flag").agg(digCol.as("est")).collect()))
      report("c70 digest+stats fused",
        time(3)(dist.groupBy("flag").agg(digCol.as("est"),
          count(lit(1)).as("n"), min(col("v")).as("lo"),
          max(col("v")).as("hi")).collect()))
      report("c70 histogram pass",
        time(3)(dist.groupBy(col("flag"), expr("shiftright(v, 12)").as("b"))
          .agg(count(lit(1)).as("c")).agg(count(lit(1))).collect()))
      report("c70 full (as declared)",
        time(3)(graft.SparkEntry.queries("c70_quantile_sketch")(spark, dir).collect()))
      // isolate the histogram pass's cost drivers
      report("c70 hist, no flag key",
        time(3)(dist.groupBy(expr("shiftright(v, 12)").as("b"))
          .agg(count(lit(1)).as("c")).agg(count(lit(1))).collect()))
      report("c70 hist, int flag key",
        time(3)(dist.groupBy(expr("ascii(flag)").as("f"),
            expr("shiftright(v, 12)").as("b"))
          .agg(count(lit(1)).as("c")).agg(count(lit(1))).collect()))
      report("c70 hist, shift 16",
        time(3)(dist.groupBy(col("flag"), expr("shiftright(v, 16)").as("b"))
          .agg(count(lit(1)).as("c")).agg(count(lit(1))).collect()))
      report("c70 slice-equiv pass",
        time(3)(dist.filter(expr("shiftright(v, 12) = 1000")).count()))
      report("c70 agg sum(v>>12), no group",
        time(3)(dist.agg(sum(expr("shiftright(v, 12)"))).collect()))
      report("c70 hist over raw parquet",
        time(3)(vals.groupBy(expr("shiftright(v, 12)").as("b"))
          .agg(count(lit(1)).as("c")).agg(count(lit(1))).collect()))
      report("c70 hist, coalesce(32) first",
        time(3)(dist.coalesce(32)
          .groupBy(expr("shiftright(v, 12)").as("b"))
          .agg(count(lit(1)).as("c")).agg(count(lit(1))).collect()))
      report("c70 digest over raw",
        time(3)(vals.groupBy("flag").agg(digCol.as("est")).collect()))
      report("c70 flag-hist over raw",
        time(3)(vals.groupBy(col("flag"), expr("shiftright(v, 12)").as("b"))
          .agg(count(lit(1)).as("c")).agg(count(lit(1))).collect()))
      report("c70 slice-join over raw",
        time(3)(vals.withColumn("b", expr("shiftright(v, 12)"))
          .join(broadcast(spark.range(3).select(
            lit("A").as("flag"), (col("id") + 1000).as("b"))), Seq("flag", "b"))
          .count()))
      // the r11 shape end-to-end: session-partition exchange + all four
      // passes (incl. stats) over the checkpoint
      report("c70 r11 shape: cp+4 passes",
        time(3) {
          val d = vals.repartition(col("flag"), col("v")).localCheckpoint(true)
          d.agg(count(lit(1)), min(col("v")), max(col("v"))).head()
          d.groupBy("flag").agg(digCol.as("est")).collect()
          d.groupBy(col("flag"), expr("shiftright(v, 12)").as("b"))
            .agg(count(lit(1)).as("c")).collect()
          d.filter(expr("shiftright(v, 12) = 1000")).count()
          ()
        })
      // the r12 shape end-to-end on a SMALL input (checkpoint branch):
      // raw stats + core-count exchange + 3 passes
      report("c70 r12 shape: raw st+cp+3",
        time(3) {
          vals.agg(count(lit(1)), min(col("v")), max(col("v"))).head()
          val d = vals.repartition(spark.sparkContext.defaultParallelism,
            col("flag"), col("v")).localCheckpoint(true)
          d.groupBy("flag").agg(digCol.as("est")).collect()
          d.groupBy(col("flag"), expr("shiftright(v, 12)").as("b"))
            .agg(count(lit(1)).as("c")).collect()
          d.filter(expr("shiftright(v, 12) = 1000")).count()
          ()
        })
    }

    spark.stop()
  }
}
