package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables.{load, dec2, fac4}
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
    // candidate C (r14, verdict item 2): only the DISTINCT counts ride
    // the stacked 5N-row path — n/min/max for all 5 columns come from
    // ONE stack-free flat aggregate over the raw scan (15 agg exprs,
    // zero shuffle mass), and the histogram's level-1 becomes a pure
    // dedup with no per-value count buffer. If this washes vs the
    // shipped d22int, the residual IS the 5N-row hash-dedup itself
    // (the per-row JVM agg path), not the riders it carries.
    // (A/B only: an all-null column would lose its row here — the
    // shipped shape keeps it via the histogram's null row.)
    def d22flat(): DataFrame = {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity")
      val li = load(spark, dir, "lineitem")
      val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
        count(col(c)).as(s"n$i"),
        min(col(c).cast("double")).as(s"lo$i"),
        max(col(c).cast("double")).as(s"hi$i")) }
      val flat = li.agg(aggs.head, aggs.tail: _*)
      def pick(p: String) = array((0 until 5).map(i => col(s"$p$i")): _*)
      li.selectExpr(
          """stack(5,
            | 0, CAST(l_orderkey AS DOUBLE),
            | 1, CAST(l_partkey AS DOUBLE),
            | 2, CAST(l_suppkey AS DOUBLE),
            | 3, CAST(l_linenumber AS DOUBLE),
            | 4, CAST(l_quantity AS DOUBLE)) AS (cid, v)""".stripMargin)
        .where(col("v").isNotNull)
        .distinct()
        .groupBy(col("cid")).agg(count(lit(1)).as("n_distinct"))
        .crossJoin(broadcast(flat))
        .select(element_at(array(cols.map(lit): _*), col("cid") + 1).as("col_name"),
          element_at(pick("n"), col("cid") + 1).as("n"), col("n_distinct"),
          element_at(pick("lo"), col("cid") + 1).as("vmin"),
          element_at(pick("hi"), col("cid") + 1).as("vmax"))
        .orderBy(col("col_name"))
    }
    if (want("d22flat")) report("d22 flat riders + dedup-only hist",
      time(3)(d22flat().collect()))

    // ---- c57 two-scan variant (r14, verdict item 5 follow-up): the
    // shipped r14 shape still exchanges the 30M joined postings by
    // (lang, doc) for the per-doc fraction. This leg computes n_ng
    // per doc IN-ROW on a second scan (size(array_distinct(...)) — one
    // row per doc, no shuffle) and n_dup as n_ng − n_uniq, where
    // n_uniq rides the gram exchange (df==1 grams carry their single
    // posting's (doc, lang) through the census via min()). Trade: a
    // second text scan + kernel pass buys away the 30M-row per-doc
    // exchange.
    if (want("c57two") || want("c57ship")) {
      import org.apache.spark.sql.GraftBridge
      def hashes = array_distinct(transform(
        GraftBridge.column(graft.functions.TokenNgrams(
          GraftBridge.expression(col("text")),
          n = 8, maxStarts = Int.MaxValue, skipEmpty = true)),
        x => xxhash64(x)))
      def c57two(): DataFrame = {
        val d = load(spark, dir, "documents")
        val docLevel = d.select(col("lang"), col("doc_id"),
            size(hashes).as("n_ng"))
          .filter(col("n_ng") > 0)
        val ng = d.select(col("doc_id"), col("lang"),
            explode(hashes).as("g"))
          .repartition(col("g"))
        val uniq = ng.groupBy(col("g"))
          .agg(count(lit(1)).as("df"), min(col("doc_id")).as("d0"),
            min(col("lang")).as("l0"))
          .filter(col("df") === 1)
          .groupBy(col("l0").as("lang"), col("d0").as("doc_id"))
          .agg(count(lit(1)).as("n_uniq"))
        val perDoc = docLevel.join(uniq, Seq("lang", "doc_id"), "left")
          .select(col("lang"), col("doc_id"), col("n_ng"),
            (col("n_ng") - coalesce(col("n_uniq"), lit(0L))).as("n_dup"))
        perDoc.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_ng")).as("sum_ngrams"), sum(col("n_dup")).as("sum_dup"),
            expr("CAST(CAST(sum(n_dup) AS DECIMAL(38,0)) * 1000" +
              " div sum(n_ng) AS BIGINT)").as("dup_fraction_x1000"),
            sum(when(col("n_dup") * 2 >= col("n_ng"), 1L).otherwise(0L))
              .as("n_boilerplate_docs"))
          .orderBy(col("lang"))
      }
      if (want("c57ship")) report("c57 shipped (riding shape)",
        time(3)(graft.SparkEntry.queries("c57_dup_ngram_fraction")(spark, dir).collect()))
      if (want("c57two")) {
        // equivalence first (cheap at any size): same rows as shipped
        val a = c57two().collect().map(_.toString).toSeq
        val b = graft.SparkEntry.queries("c57_dup_ngram_fraction")(spark, dir)
          .collect().map(_.toString).toSeq
        require(a == b, s"c57two diverged from shipped:\n$a\nvs\n$b")
        report("c57 two-scan (no perDoc exch)", time(3)(c57two().collect()))
      }
    }

    // ---- b9/b10 decomposition + the Bucketed structural lever (r13,
    // verdict item 3): the fact-join cohort's 10× residual (b9 1.73 vs
    // DuckDB 0.108, b10 1.13 vs 0.195) is claimed constant-factor — these
    // legs bound it the d22 way (scan / dim-join / backbone / agg), and
    // the bucket legs measure the ONE structural change not yet tried:
    // lineitem+orders stored bucketed on orderkey (sources.Bucketed), so
    // every orderkey join reads co-located buckets with NO Exchange.
    def b9shape(li0: DataFrame, ord0: DataFrame): DataFrame = {
      val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
      val hi = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
      val asianNations = load(spark, dir, "nation")
        .join(load(spark, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val cust = load(spark, dir, "customer")
        .join(broadcast(asianNations), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val ord = ord0
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"))
      val li = li0.select(col("l_orderkey"), col("l_suppkey"),
        (dec2(col("l_extendedprice")) * fac4(lit(1) - col("l_discount"))).as("rev"))
      val supp = load(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }
    def b12shape(li0: DataFrame, ord0: DataFrame): DataFrame = {
      val li = li0.select(col("l_orderkey"), col("l_suppkey"))
      val late = li0
        .join(ord0.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"))
      val others = li.select(col("l_orderkey").as("o2_orderkey"),
        col("l_suppkey").as("o2_suppkey"))
      val lateOthers = late.select(col("l_orderkey").as("o3_orderkey"),
        col("l_suppkey").as("o3_suppkey"))
      late
        .join(others, col("l_orderkey") === col("o2_orderkey") &&
          col("l_suppkey") =!= col("o2_suppkey"), "left_semi")
        .join(lateOthers, col("l_orderkey") === col("o3_orderkey") &&
          col("l_suppkey") =!= col("o3_suppkey"), "left_anti")
        .join(load(spark, dir, "supplier").select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }
    if (want("b9parts")) {
      val liRaw = load(spark, dir, "lineitem")
      val ordRaw = load(spark, dir, "orders")
      report("b9 li scan+rev (agg only)",
        time(3)(liRaw.select(
          (dec2(col("l_extendedprice")) * fac4(lit(1) - col("l_discount"))).as("rev"))
          .agg(sum(col("rev"))).collect()))
      report("b9 ord scan+date filter",
        time(3)(ordRaw.filter(
          col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
          .agg(count(lit(1))).collect()))
      // first join only: filtered orders ⋈ customer-with-nation (the dim
      // side AQE broadcasts at this size)
      report("b9 ord⋈cust (dim join)", time(3) {
        val asianNations = load(spark, dir, "nation")
          .join(load(spark, dir, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val cust = load(spark, dir, "customer")
          .join(broadcast(asianNations), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
        ordRaw.filter(
          col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
          .select(col("o_orderkey"), col("o_custkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .agg(count(lit(1))).collect()
      })
      // backbone only: filtered orders ⋈ lineitem on orderkey — the one
      // fact-fact exchange
      report("b9 backbone ord⋈li", time(3) {
        val ord = ordRaw.filter(
          col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
          .select(col("o_orderkey"))
        liRaw.select(col("l_orderkey"),
          (dec2(col("l_extendedprice")) * fac4(lit(1) - col("l_discount"))).as("rev"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .agg(sum(col("rev"))).collect()
      })
      report("b9 full (as declared)", time(3)(b9shape(liRaw, ordRaw).collect()))
      report("b10 li scan+rev (agg only)",
        time(3)(liRaw.select(col("l_partkey"),
          (dec2(col("l_extendedprice")) * fac4(lit(1) - col("l_discount"))).as("rev"))
          .agg(sum(col("rev")), max(col("l_partkey"))).collect()))
      report("b10 full (as declared)",
        time(3)(graft.SparkEntry.queries("b10_promo_share")(spark, dir).collect()))
      report("b12 full (as declared)",
        time(3)(b12shape(liRaw, ordRaw).collect()))
    }
    if (want("bucketab")) {
      // bucketed replicas of the SAME data: pay the orderkey shuffle once
      // at write, then measure the orderkey-join queries on the co-located
      // layout. 32 buckets ≈ one bucket per core at local[32]; bucket
      // metadata lives in the session catalog, so reads go via table name.
      import graft.sources.Bucketed
      if (!spark.catalog.tableExists("li_bkt")) {
        val t0 = System.nanoTime()
        Bucketed.writeBucketed(load(spark, dir, "lineitem"), "li_bkt",
          "l_orderkey", 32)
        Bucketed.writeBucketed(load(spark, dir, "orders"), "ord_bkt",
          "o_orderkey", 32)
        println(f"[scanshape] bucket write (once)   ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
      val liB = spark.table("li_bkt")
      val ordB = spark.table("ord_bkt")
      report("b9 full, bucketed li+ord",
        time(3)(b9shape(liB, ordB).collect()))
      report("b12 full, bucketed li+ord",
        time(3)(b12shape(liB, ordB).collect()))
      report("b9 backbone, bucketed", time(3) {
        val ord = ordB.filter(
          col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
          .select(col("o_orderkey"))
        liB.select(col("l_orderkey"),
          (dec2(col("l_extendedprice")) * fac4(lit(1) - col("l_discount"))).as("rev"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .agg(sum(col("rev"))).collect()
      })
    }

    // ---- checkpoint audit (r13, verdict item 2): c70's lesson was that
    // a localCheckpoint of a NARROW PROJECTION OF A RAW SCAN reads
    // slower than re-scanning column-pruned parquet (the row cache
    // stores full rows; the scan reads only the pruned bytes). These
    // legs ask the same question of the other checkpoint users the
    // verdict named — each materializes a DERIVED table (post-shuffle
    // aggregate / distinct), where the recompute is a repeated shuffle,
    // not a repeated scan, so the checkpoint should win. Measured, not
    // assumed: each leg runs the site's real consumer fan-out with the
    // checkpoint ON vs OFF.
    if (want("ckptab")) {
      import org.apache.spark.sql.GraftBridge
      // (1) c27's ng (ExtOps.scala ~615): distinct (doc_id, md5(8-gram))
      // — an explode + hash + DISTINCT SHUFFLE — consumed 3× (eval
      // side, train df-cap, train postings).
      def c27ng(ckpt: Boolean): Long = {
        val d = load(spark, dir, "documents")
        val ng0 = d.select(col("doc_id"), col("lang"),
            explode(GraftBridge.column(graft.functions.TokenNgrams(
              GraftBridge.expression(col("text")),
              n = 8, maxStarts = Int.MaxValue, skipEmpty = true))).as("g0"))
          .select(col("doc_id"), col("lang"), md5(col("g0").cast("binary")).as("g"))
          .distinct()
        val ng = if (ckpt) ng0.localCheckpoint(true) else ng0
        val evalN = ng.filter(col("doc_id") % 97 === 0)
        val trainN0 = ng.filter(col("doc_id") % 97 =!= 0)
        val trainN = trainN0.join(
          trainN0.groupBy(col("g")).agg(count(lit(1)).as("df"))
            .filter(col("df") <= graft.queries.ExtOps.C27_DF_CAP).select(col("g")),
          "g")
        trainN.select(col("g"), col("doc_id").as("train_doc"))
          .join(evalN.select(col("g"), col("doc_id").as("eval_doc")), "g")
          .distinct().count()
      }
      report("c27 ng site, checkpoint ON", time(3)(c27ng(ckpt = true)))
      report("c27 ng site, checkpoint OFF", time(3)(c27ng(ckpt = false)))
      // (2) c62's per-round rank checkpoints (CorpusRank.scala ~67-84):
      // without them round k's plan embeds rounds 1..k-1 — the bigram
      // aggregate and every prior join replay once per remaining round.
      def c62(ckpt: Boolean): Long = {
        val docs = load(spark, dir, "documents")
        val bi = docs.select(
            explode(GraftBridge.column(graft.functions.TokenNgrams(
              GraftBridge.expression(col("text")),
              n = 2, maxStarts = Int.MaxValue, skipEmpty = true))).as("bigram"))
          .select(expr("split(bigram, ' ')[0]").as("u"),
            expr("split(bigram, ' ')[1]").as("v"))
          .filter(col("u") =!= col("v"))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("c"))
        val e0 = bi.select(col("u"), col("v"), col("c"))
          .union(bi.select(col("v").as("u"), col("u").as("v"), col("c")))
          .groupBy(col("u"), col("v")).agg(sum(col("c")).as("w"))
        val e = if (ckpt) e0.localCheckpoint(true) else e0
        val wo0 = e.groupBy(col("u"))
          .agg(sum(col("w")).as("wt"), count(lit(1)).as("degree"))
        val wo = if (ckpt) wo0.localCheckpoint(true) else wo0
        var r = wo.select(col("u").as("tok"), lit(1000000L).as("r"))
        for (_ <- 1 to 4) {
          val contrib = e.join(wo.select(col("u"), col("wt")), "u")
            .join(r.select(col("tok").as("u"), col("r")), "u")
            .select(col("v"),
              expr("CAST(CAST(r AS DECIMAL(38,0)) * w div wt AS DECIMAL(38,0))").as("m"))
          val r1 = contrib.groupBy(col("v"))
            .agg(expr("CAST(850 * sum(m) div 1000 + 150000 AS BIGINT)").as("r"))
            .select(col("v").as("tok"), col("r"))
          r = if (ckpt) r1.localCheckpoint(true) else r1
        }
        r.join(wo.select(col("u").as("tok"), col("degree")), "tok")
          .orderBy(col("r").desc, col("tok")).limit(30).count()
      }
      report("c62 rounds, checkpoints ON", time(3)(c62(ckpt = true)))
      report("c62 rounds, checkpoints OFF", time(3)(c62(ckpt = false)))
      // (3) c31/semDedup's assigned (Similarity.scala ~595): (vec_id,
      // scaled embedding, norm, cell) consumed 3× (both pair sides +
      // census). This is the closest shape to the c70 trap — the
      // checkpointed rows are nearly the raw scan plus one compiled
      // projection — so it is the one the audit could plausibly flip.
      def sem(ckpt: Boolean): Long = {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val (base, cents) = Similarity.trainedLit(emb, 8, 2)
        val a0 = Similarity.withCell(base, cents)
        val assigned = if (ckpt) a0.localCheckpoint(true) else a0
        val pairs = assigned
          .select(col("cell"), col("vec_id").as("va"), col("ie").as("ia"), col("nv").as("na"))
          .join(assigned.select(col("cell"), col("vec_id").as("vb"),
            col("ie").as("ib"), col("nv").as("nb")), "cell")
          .filter(col("va") < col("vb"))
          .select(col("cell"), col("vb"),
            (Similarity.dot("ia", "ib") / (col("na") * col("nb"))).as("cos"))
        val drops = pairs.filter(col("cos") > 0.42)
          .select(col("cell"), col("vb")).distinct()
        assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
          .join(drops.groupBy(col("cell")).agg(count(lit(1)).as("n_dropped")),
            Seq("cell"), "left").count()
      }
      report("c31 assigned, checkpoint ON", time(3)(sem(ckpt = true)))
      report("c31 assigned, checkpoint OFF", time(3)(sem(ckpt = false)))
    }

    // ---- n-gram hash-key A/B (r13): the text trio's biggest absolute
    // gaps vs DuckDB at 10× (c55 6.3 s, c57 4.3 s, c27 3.4 s) all pay
    // md5 over every exploded 8-/4-gram. md5 is load-bearing where the
    // HASH VALUE is replayed by the oracle (content-hash gates, KMV
    // ranks, c16/c30 sampling) — but in c55/c57/c27 the hash is only an
    // internal join/dedup KEY and the output depends on equality
    // classes alone, so a 64-bit xxhash64 key (8-byte shuffles, ~20×
    // cheaper per row than a crypto digest) gives identical results
    // modulo collisions on THESE fixtures (verified by the oracle gate
    // either way). These legs isolate the digest cost and A/B the key
    // swap plus the c27-lesson checkpoint removal on the same shapes.
    if (want("hashab")) {
      import org.apache.spark.sql.GraftBridge
      import org.apache.spark.sql.Column
      // match the SHIPPED 10× bench config (AQE auto→on at this size) so
      // a variant that only wins under AQE-off noise can't ship
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      val docs = load(spark, dir, "documents")
      def grams(n: Int) = docs
        .select(col("doc_id"), col("lang"),
          explode(GraftBridge.column(graft.functions.TokenNgrams(
            GraftBridge.expression(col("text")),
            n = n, maxStarts = Int.MaxValue, skipEmpty = true))).as("g0"))
      report("8-grams explode+count",
        time(3)(grams(8).agg(count(lit(1))).collect()))
      report("8-grams md5+distinct+count",
        time(3)(grams(8)
          .select(col("doc_id"), md5(col("g0").cast("binary")).as("g"))
          .distinct().agg(count(lit(1))).collect()))
      report("8-grams xxh64+distinct+count",
        time(3)(grams(8)
          .select(col("doc_id"), xxhash64(col("g0")).as("g"))
          .distinct().agg(count(lit(1))).collect()))
      // c57 shape, parameterized (hash key × checkpoint)
      def c57(hash: Column => Column, ckpt: Boolean): DataFrame = {
        val ng0 = grams(8)
          .select(col("doc_id"), col("lang"), hash(col("g0")).as("g"))
          .distinct()
        val ng = if (ckpt) ng0.localCheckpoint(true) else ng0
        val dfTab = ng.groupBy(col("g")).agg(count(lit(1)).as("df"))
        val perDoc = ng.join(dfTab, "g")
          .groupBy(col("lang"), col("doc_id"))
          .agg(count(lit(1)).as("n_ng"),
            sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
        perDoc.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_ng")).as("sum_ngrams"), sum(col("n_dup")).as("sum_dup"),
            expr("CAST(CAST(sum(n_dup) AS DECIMAL(38,0)) * 1000" +
              " div sum(n_ng) AS BIGINT)").as("dup_fraction_x1000"),
            sum(when(col("n_dup") * 2 >= col("n_ng"), 1L).otherwise(0L))
              .as("n_boilerplate_docs"))
          .orderBy(col("lang"))
      }
      def md5k(c: Column) = md5(c.cast("binary"))
      def xxk(c: Column) = xxhash64(c)
      report("c57 md5 + ckpt (declared)", time(3)(c57(md5k, ckpt = true).collect()))
      report("c57 md5, no ckpt", time(3)(c57(md5k, ckpt = false).collect()))
      report("c57 xxh64 + ckpt", time(3)(c57(xxk, ckpt = true).collect()))
      report("c57 xxh64, no ckpt", time(3)(c57(xxk, ckpt = false).collect()))
      // c55 shape (shingleContainment), parameterized the same way
      def c55(hash: Column => Column, ckpt: Boolean): DataFrame = {
        val sh1 = grams(4)
          .select(col("doc_id"), hash(col("g0")).as("sh"))
          .distinct()
        val sh0 = if (ckpt) sh1.localCheckpoint(true) else sh1
        val sh = sh0.join(
          sh0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
            .filter(col("df") <= Dedup.ShingleDfCap).select(col("sh")),
          "sh")
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val a = sh.select(col("doc_id").as("da"), col("sh"))
        val b = sh.select(col("doc_id").as("db"), col("sh"))
        a.join(b, "sh").filter(col("da") =!= col("db"))
          .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("doc_id").as("da"), col("sz").as("size_a")), "da")
          .filter(col("inter") * 1000 >= lit(800L) * col("size_a"))
          .select(col("da"), col("db"), col("inter"), col("size_a"),
            expr("inter * 1000 div size_a").as("containment_x1000"))
          .orderBy(col("containment_x1000").desc, col("da"), col("db"))
          .limit(50)
      }
      report("c55 md5 + ckpt (declared)", time(3)(c55(md5k, ckpt = true).collect()))
      report("c55 md5, no ckpt", time(3)(c55(md5k, ckpt = false).collect()))
      report("c55 xxh64 + ckpt", time(3)(c55(xxk, ckpt = true).collect()))
      report("c55 xxh64, no ckpt", time(3)(c55(xxk, ckpt = false).collect()))
      // ---- the c1/c15/c25 verify join: exact Jaccard over candidate
      // pairs carries each side's full distinct-token ARRAY through two
      // joins and runs array_intersect per pair. Same equality-key
      // question: tokens as xxhash64 longs (8-byte elements, flat
      // compares) vs raw strings (UTF8String pointers). Jaccard needs
      // only set SIZES, so outputs are value-independent.
      def verify(hashToks: Boolean): Long = {
        val base = docs.filter(col("doc_id") % 5 === 0)
          .select(col("doc_id"),
            array_remove(array_distinct(split(col("text"), " ")), "").as("t0"))
        val toks = (if (hashToks)
            base.select(col("doc_id"),
              transform(col("t0"), t => xxhash64(t)).as("toks"))
          else base.select(col("doc_id"), col("t0").as("toks")))
          .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("sz"))
        val cands = Dedup.lshCandidates(Dedup.minhashBanded(docs, 5))
        cands
          .join(toks.select(col("doc_id").as("da"), col("toks").as("ta"),
            col("sz").as("sa")), "da")
          .join(toks.select(col("doc_id").as("db"), col("toks").as("tb"),
            col("sz").as("sb")), "db")
          .select(col("da"), col("db"),
            size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"),
            col("sa"), col("sb"))
          .filter(col("inter").cast("double") /
            (col("sa") + col("sb") - col("inter")) >= 0.98)
          .count()
      }
      report("c15 verify, string toks", time(3)(verify(hashToks = false)))
      report("c15 verify, xxh64 toks", time(3)(verify(hashToks = true)))
      spark.conf.unset("spark.sql.adaptive.enabled")
    }

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

    // ---- c51 legs (r13): sparse-vs-dense L1 verify + rescue key A/B ----
    // The pre-r13 shape expanded every candidate pair into 48 (pair, hour)
    // contribution rows through two hash aggregates and keyed the
    // equal-profile rescue on a per-user sorted "HH:v" string; the shipped
    // shape carries dense 24-long arrays + the LongArrayL1 codegen loop
    // and keys the rescue on the bijective (pmask, pv) pair. Both
    // spellings produce identical rows (asserted here as well as by the
    // oracle) — the legs price the difference.
    if (want("c51parts")) {
      import graft.operators.TimeSeries
      val ev = load(spark, dir, "events")
      report("c51 quarter profile", time(3)(TimeSeries.quarterProfile(ev).count()))
      val qprof = TimeSeries.quarterProfile(ev).localCheckpoint(true)
      val prof = qprof.groupBy(col("user_id"), expr("qh div 4").as("hour"))
        .agg(sum(col("v")).as("v"))
      report("c51 signature96", time(3)(TimeSeries.signature96(qprof).count()))
      val sig = TimeSeries.signature96(qprof).localCheckpoint(true)
      val banded = sig.selectExpr("user_id",
        "stack(8, " +
          "0, lo & 4095, 1, (lo >> 12) & 4095, 2, (lo >> 24) & 4095, 3, (lo >> 36) & 4095, " +
          "4, hi & 4095, 5, (hi >> 12) & 4095, 6, (hi >> 24) & 4095, 7, (hi >> 36) & 4095" +
          ") AS (band_id, bv)")
      val kept = banded.join(
        banded.groupBy(col("band_id"), col("bv"))
          .agg(count(lit(1)).as("bp"))
          .filter(col("bp") <= TimeSeries.BandBucketCap)
          .select(col("band_id"), col("bv")),
        Seq("band_id", "bv"))
      val bandCand = kept
        .select(col("band_id"), col("bv"), col("user_id").as("da"))
        .join(kept.select(col("band_id"), col("bv"), col("user_id").as("db")),
          Seq("band_id", "bv"))
        .filter(col("da") < col("db"))
        .select(col("da"), col("db"))
      report("c51 band candidates", time(3)(bandCand.count()))
      // old rescue: sorted "HH:v" string key + rank self-join
      val pkey = prof.groupBy(col("user_id")).agg(
        array_join(array_sort(collect_list(concat(
          lpad(col("hour").cast("string"), 2, "0"), lit(":"), col("v")))),
          ",").as("pk"))
      val rankedOld = pkey.withColumn("rn", row_number().over(
        Window.partitionBy(col("pk")).orderBy(col("user_id"))))
      val eqOld = rankedOld.select(col("pk"), col("rn"), col("user_id").as("da"))
        .join(rankedOld.select(col("pk"), (col("rn") - 1).as("rn"),
          col("user_id").as("db")), Seq("pk", "rn"))
        .select(col("da"), col("db"))
      report("c51 rescue, string key", time(3)(eqOld.count()))
      // new rescue: dense (pmask, pv) key + lag
      val parr = prof.groupBy(col("user_id")).agg(
          map_from_entries(collect_list(struct(col("hour").cast("int"), col("v")))).as("m"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(hour AS INT))")).as("pmask"))
        .select(col("user_id"), col("pmask"), expr(
          "transform(sequence(0, 23), h -> coalesce(element_at(m, h), CAST(0 AS BIGINT)))")
          .as("pv"))
      val eqNew = parr.select(col("user_id").as("db"),
          lag(col("user_id"), 1).over(
            Window.partitionBy(col("pmask"), col("pv"))
              .orderBy(col("user_id"))).as("da"))
        .filter(col("da").isNotNull)
        .select(col("da"), col("db"))
      report("c51 rescue, dense key", time(3)(eqNew.count()))
      val cand = bandCand.unionByName(eqOld).distinct().localCheckpoint(true)
      println(s"[scanshape] c51 candidates after distinct: ${cand.count()}")
      // old verify: 48 contribution rows per pair, two hash aggregates
      def verifySparse(): Unit = {
        val a = cand.join(prof.select(col("user_id").as("da"), col("hour"), col("v")), "da")
          .select(col("da"), col("db"), col("hour"), col("v").as("x"))
        val b = cand.join(prof.select(col("user_id").as("db"), col("hour"), col("v")), "db")
          .select(col("da"), col("db"), col("hour"), (-col("v")).as("x"))
        a.unionByName(b)
          .groupBy(col("da"), col("db"), col("hour"))
          .agg(sum(col("x")).as("d"))
          .groupBy(col("da"), col("db"))
          .agg(sum(abs(col("d"))).as("l1_cents"))
          .orderBy(col("l1_cents"), col("da"), col("db"))
          .limit(20).collect()
      }
      // new verify: two profile joins + LongArrayL1
      def verifyDense(): Unit = {
        import org.apache.spark.sql.GraftBridge
        cand.join(parr.select(col("user_id").as("da"), col("pv").as("pa")), "da")
          .join(parr.select(col("user_id").as("db"), col("pv").as("pb")), "db")
          .select(col("da"), col("db"),
            GraftBridge.column(graft.functions.LongArrayL1(
              GraftBridge.expression(col("pa")),
              GraftBridge.expression(col("pb")))).as("l1_cents"))
          .orderBy(col("l1_cents"), col("da"), col("db"))
          .limit(20).collect()
      }
      report("c51 verify, sparse 48/pair", time(3)(verifySparse()))
      report("c51 verify, dense L1", time(3)(verifyDense()))
      report("c51 full (as declared)",
        time(3)(graft.SparkEntry.queries("c51_ts_similar_users")(spark, dir).collect()))
      // parity: rescue sets and verify outputs identical between spellings
      val dRescue = eqOld.exceptAll(eqNew).count() + eqNew.exceptAll(eqOld).count()
      println(s"[scanshape] c51 rescue-set delta (must be 0): $dRescue")
    }

    // ---- c55 legs (r13): within-row array_distinct vs corpus distinct ----
    // A (doc_id, shingle-hash) duplicate can only arise within one doc,
    // so the per-doc set semantics can run as array_distinct inside the
    // n-gram row (no shuffle) instead of a corpus-wide distinct (a full
    // n-gram-table exchange + hash aggregate). Legs time the shingle
    // table build both ways and the full query; set equality asserted.
    if (want("c55parts")) {
      import org.apache.spark.sql.GraftBridge
      val docs = load(spark, dir, "documents")
      def grams = GraftBridge.column(graft.functions.TokenNgrams(
        GraftBridge.expression(col("text")),
        n = 4, maxStarts = Int.MaxValue, skipEmpty = true))
      val shOld = docs.select(col("doc_id"), explode(grams).as("g0"))
        .select(col("doc_id"), xxhash64(col("g0")).as("sh"))
        .distinct()
      val shNew = docs.select(col("doc_id"), explode(array_distinct(grams)).as("g0"))
        .select(col("doc_id"), xxhash64(col("g0")).as("sh"))
      report("c55 shingles, corpus distinct", time(3)(shOld.count()))
      report("c55 shingles, array_distinct", time(3)(shNew.count()))
      println(s"[scanshape] c55 shingle-set delta (must be 0): " +
        (shOld.exceptAll(shNew).count() + shNew.exceptAll(shOld).count()))
      report("c55 full (as declared)",
        time(3)(graft.SparkEntry.queries("c55_containment")(spark, dir).collect()))
    }

    // Interleaved full-query A/B (the ConfAb protocol — box drift lands
    // evenly): corpus-distinct shingle table vs array_distinct-in-row.
    if (want("c55ab")) {
      import org.apache.spark.sql.GraftBridge
      val docs = load(spark, dir, "documents")
      def grams = GraftBridge.column(graft.functions.TokenNgrams(
        GraftBridge.expression(col("text")),
        n = 4, maxStarts = Int.MaxValue, skipEmpty = true))
      def full(sh1: DataFrame): Unit = {
        val sh = sh1.join(
          sh1.groupBy(col("sh")).agg(count(lit(1)).as("df"))
            .filter(col("df") <= Dedup.ShingleDfCap).select(col("sh")),
          "sh")
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val a = sh.select(col("doc_id").as("da"), col("sh"))
        val b = sh.select(col("doc_id").as("db"), col("sh"))
        a.join(b, "sh").filter(col("da") =!= col("db"))
          .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("doc_id").as("da"), col("sz").as("size_a")), "da")
          .filter(col("inter") * 1000 >= lit(800L) * col("size_a"))
          .select(col("da"), col("db"), col("inter"), col("size_a"),
            expr("inter * 1000 div size_a").as("containment_x1000"))
          .orderBy(col("containment_x1000").desc, col("da"), col("db"))
          .limit(50).collect()
      }
      def shOld = docs.select(col("doc_id"), explode(grams).as("g0"))
        .select(col("doc_id"), xxhash64(col("g0")).as("sh")).distinct()
      def shNew = docs.select(col("doc_id"), explode(array_distinct(grams)).as("g0"))
        .select(col("doc_id"), xxhash64(col("g0")).as("sh"))
      full(shOld); full(shNew) // warm both
      val passes = 5
      val (tOld, tNew) = (Array.ofDim[Double](passes), Array.ofDim[Double](passes))
      for (p <- 0 until passes) {
        val t0 = System.nanoTime(); full(shOld); tOld(p) = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); full(shNew); tNew(p) = (System.nanoTime() - t1) / 1e9
      }
      def fmt(a: Array[Double]) = a.map(t => f"$t%.2f").mkString(" ")
      println(f"[scanshape] c55ab distinct:       ${fmt(tOld)} median ${tOld.sorted.apply(passes / 2)}%.2f")
      println(f"[scanshape] c55ab array_distinct: ${fmt(tNew)} median ${tNew.sorted.apply(passes / 2)}%.2f")
    }

    // ---- c55 legs (r14): kill the triple-executed df-join subtree ----
    // The shipped shape references the df-join subtree THREE times
    // (sizes + both self-join sides): the exchanges reuse, but the join
    // CPU runs 3x and the posting set streams through it each time. Two
    // candidate shapes, both proven row-identical before timing:
    //  self — keep the join, drop the da=!=db filter so (d,d) rows carry
    //         size_d through the SAME (da,db) aggregate; sizes becomes a
    //         filter over the pair table instead of a third subtree
    //         execution (cost: Σdf extra join-output rows, map-side
    //         combined to ~|docs| per partition).
    //  grp  — aggregate postings into per-shingle doc arrays (the df cap
    //         becomes size(ds) <= cap — no census join at all) and
    //         expand every ordered (da,db) pair in-row, self-pairs
    //         included: ZERO posting-sized joins; the posting set
    //         crosses the wire exactly once.
    if (want("c55r14")) {
      import org.apache.spark.sql.GraftBridge
      val docs = load(spark, dir, "documents")
      def grams = GraftBridge.column(graft.functions.TokenNgrams(
        GraftBridge.expression(col("text")),
        n = 4, maxStarts = Int.MaxValue, skipEmpty = true))
      def sh1 = docs.select(col("doc_id"),
          explode(array_distinct(grams)).as("g0"))
        .select(col("doc_id"), xxhash64(col("g0")).as("sh"))
      // shared tail: sizes ride the pair table's (d,d) rows
      def finish(pairs: DataFrame): DataFrame = {
        val sizes = pairs.filter(col("da") === col("db"))
          .select(col("da"), col("inter").as("size_a"))
        pairs.filter(col("da") =!= col("db"))
          .join(sizes, "da")
          .filter(col("inter") * 1000 >= lit(800L) * col("size_a"))
          .select(col("da"), col("db"), col("inter"), col("size_a"),
            expr("inter * 1000 div size_a").as("containment_x1000"))
          .orderBy(col("containment_x1000").desc, col("da"), col("db"))
          .limit(50)
      }
      def selfShape: DataFrame = {
        val s0 = sh1
        val sh = s0.join(
          s0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
            .filter(col("df") <= Dedup.ShingleDfCap).select(col("sh")),
          "sh")
        val a = sh.select(col("doc_id").as("da"), col("sh"))
        val b = sh.select(col("doc_id").as("db"), col("sh"))
        finish(a.join(b, "sh")
          .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter")))
      }
      def grpShape: DataFrame = {
        val grp = sh1.groupBy(col("sh"))
          .agg(collect_list(col("doc_id")).as("ds"))
          .filter(size(col("ds")) <= Dedup.ShingleDfCap)
        finish(grp
          .select(explode(col("ds")).as("da"), col("ds"))
          .select(col("da"), explode(col("ds")).as("db"))
          .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter")))
      }
      val shipped = Dedup.shingleContainment(docs, 800, 50)
        .collect().map(_.toString).toSeq
      val aSelf = selfShape.collect().map(_.toString).toSeq
      val aGrp = grpShape.collect().map(_.toString).toSeq
      require(aSelf == shipped, "c55 self-pair shape diverged from shipped")
      require(aGrp == shipped, "c55 grouped-expand shape diverged from shipped")
      report("c55 shipped", time(3)(
        Dedup.shingleContainment(docs, 800, 50).collect()))
      report("c55 self-pair sizes", time(3)(selfShape.collect()))
      report("c55 grouped expand", time(3)(grpShape.collect()))
    }

    // ---- c55 v4 (r14): slash the pair work to the SHARED postings ----
    // Measured above: self-pair routing and whole-corpus collect_list
    // both lose to the shipped shape. The actual waste in ALL of them:
    // df=1 shingles (the overwhelming majority) ride both sides of the
    // pair machinery only to produce da==db rows the filter discards.
    // v4: (a) sizes leave the posting path entirely — size_a =
    // in-row distinct-shingle count (c57's n_ng trick, second kernel
    // scan) minus a tiny capped-shingle correction; (b) pair work runs
    // only on postings whose shingle has df in [2, cap] — everything
    // (census, the shared-keys join, the per-shingle doc arrays) rides
    // ONE sh-keyed exchange, and the expansion input is the genuinely
    // shared posting set, not the corpus.
    if (want("c55v4")) {
      import org.apache.spark.sql.GraftBridge
      val docs = load(spark, dir, "documents")
      def grams = GraftBridge.column(graft.functions.TokenNgrams(
        GraftBridge.expression(col("text")),
        n = 4, maxStarts = Int.MaxValue, skipEmpty = true))
      def v4(viaArrays: Boolean): DataFrame = {
        val sh1 = docs.select(col("doc_id"),
            explode(array_distinct(grams)).as("g0"))
          .select(col("doc_id"), xxhash64(col("g0")).as("sh"))
        val census = sh1.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        val shared = census
          .filter(col("df") >= 2 && col("df") <= Dedup.ShingleDfCap)
          .select(col("sh"))
        val p2 = sh1.join(shared, "sh")
        val rawPairs =
          if (viaArrays) {
            // p2 is already hashpartitioned by sh: the array agg and
            // the expansion add NO exchange and p2 executes once.
            p2.groupBy(col("sh")).agg(collect_list(col("doc_id")).as("ds"))
              .select(explode(col("ds")).as("da"), col("ds"))
              .select(col("da"), explode(col("ds")).as("db"))
              .filter(col("da") =!= col("db"))
          } else {
            p2.select(col("doc_id").as("da"), col("sh"))
              .join(p2.select(col("doc_id").as("db"), col("sh")), "sh")
              .filter(col("da") =!= col("db"))
          }
        val pairs = rawPairs.groupBy(col("da"), col("db"))
          .agg(count(lit(1)).as("inter"))
        // sizes: in-row distinct count minus the capped-shingle postings
        val docLevel = docs.select(col("doc_id"),
          size(array_distinct(grams)).cast("long").as("n_sh"))
        val capCnt = sh1.join(
            census.filter(col("df") > Dedup.ShingleDfCap).select(col("sh")),
            "sh")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_cap"))
        val sizes = docLevel.join(capCnt, Seq("doc_id"), "left")
          .select(col("doc_id").as("da"),
            (col("n_sh") - coalesce(col("n_cap"), lit(0L))).as("size_a"))
        pairs.join(sizes, "da")
          .filter(col("inter") * 1000 >= lit(800L) * col("size_a"))
          .select(col("da"), col("db"), col("inter"), col("size_a"),
            expr("inter * 1000 div size_a").as("containment_x1000"))
          .orderBy(col("containment_x1000").desc, col("da"), col("db"))
          .limit(50)
      }
      // the r13 shape, inline (Dedup.shingleContainment ships v4 now)
      def r13Shape: DataFrame = {
        val sh1 = docs.select(col("doc_id"),
            explode(array_distinct(grams)).as("g0"))
          .select(col("doc_id"), xxhash64(col("g0")).as("sh"))
        val sh = sh1.join(
          sh1.groupBy(col("sh")).agg(count(lit(1)).as("df"))
            .filter(col("df") <= Dedup.ShingleDfCap).select(col("sh")),
          "sh")
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val a = sh.select(col("doc_id").as("da"), col("sh"))
        val b = sh.select(col("doc_id").as("db"), col("sh"))
        a.join(b, "sh").filter(col("da") =!= col("db"))
          .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("doc_id").as("da"), col("sz").as("size_a")), "da")
          .filter(col("inter") * 1000 >= lit(800L) * col("size_a"))
          .select(col("da"), col("db"), col("inter"), col("size_a"),
            expr("inter * 1000 div size_a").as("containment_x1000"))
          .orderBy(col("containment_x1000").desc, col("da"), col("db"))
          .limit(50)
      }
      val shipped = Dedup.shingleContainment(docs, 800, 50)
        .collect().map(_.toString).toSeq
      val vArr = v4(viaArrays = true).collect().map(_.toString).toSeq
      val vJoin = v4(viaArrays = false).collect().map(_.toString).toSeq
      val vR13 = r13Shape.collect().map(_.toString).toSeq
      require(vArr == shipped, "c55 v4-arrays diverged from shipped")
      require(vJoin == shipped, "c55 v4-join diverged from shipped")
      require(vR13 == shipped, "c55 r13 shape diverged from shipped")
      // interleaved (ConfAb protocol): box drift lands on both arms
      Dedup.shingleContainment(docs, 800, 50).collect(); r13Shape.collect()
      val passes = 5
      val (tNew, tOld) = (Array.ofDim[Double](passes), Array.ofDim[Double](passes))
      for (p <- 0 until passes) {
        val t0 = System.nanoTime()
        Dedup.shingleContainment(docs, 800, 50).collect()
        tNew(p) = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); r13Shape.collect()
        tOld(p) = (System.nanoTime() - t1) / 1e9
      }
      def fmt(a: Array[Double]) = a.map(t => f"$t%.2f").mkString(" ")
      println(f"[scanshape] c55v4 r13 3x-df-join: ${fmt(tOld)} median ${tOld.sorted.apply(passes / 2)}%.2f")
      println(f"[scanshape] c55v4 shipped (v4):   ${fmt(tNew)} median ${tNew.sorted.apply(passes / 2)}%.2f")
      report("c55 v4 arrays (rejected)", time(3)(v4(true).collect()))
    }

    // Lean interleaved pair for the committed number: ONLY the two arms
    // (row identity is c55v4's require, proven in the same session
    // protocol) — the heavy equivalence collects above perturb the JVM
    // for several passes (measured: first interleaved passes read 3-10x
    // the settled ones right after four corpus-wide collects).
    if (want("c55pair")) {
      import org.apache.spark.sql.GraftBridge
      val docs = load(spark, dir, "documents")
      def grams = GraftBridge.column(graft.functions.TokenNgrams(
        GraftBridge.expression(col("text")),
        n = 4, maxStarts = Int.MaxValue, skipEmpty = true))
      def r13Shape: DataFrame = {
        val sh1 = docs.select(col("doc_id"),
            explode(array_distinct(grams)).as("g0"))
          .select(col("doc_id"), xxhash64(col("g0")).as("sh"))
        val sh = sh1.join(
          sh1.groupBy(col("sh")).agg(count(lit(1)).as("df"))
            .filter(col("df") <= Dedup.ShingleDfCap).select(col("sh")),
          "sh")
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val a = sh.select(col("doc_id").as("da"), col("sh"))
        val b = sh.select(col("doc_id").as("db"), col("sh"))
        a.join(b, "sh").filter(col("da") =!= col("db"))
          .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("doc_id").as("da"), col("sz").as("size_a")), "da")
          .filter(col("inter") * 1000 >= lit(800L) * col("size_a"))
          .select(col("da"), col("db"), col("inter"), col("size_a"),
            expr("inter * 1000 div size_a").as("containment_x1000"))
          .orderBy(col("containment_x1000").desc, col("da"), col("db"))
          .limit(50)
      }
      Dedup.shingleContainment(docs, 800, 50).collect(); r13Shape.collect()
      val passes = 5
      val (tNew, tOld) = (Array.ofDim[Double](passes), Array.ofDim[Double](passes))
      for (p <- 0 until passes) {
        val t0 = System.nanoTime()
        Dedup.shingleContainment(docs, 800, 50).collect()
        tNew(p) = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); r13Shape.collect()
        tOld(p) = (System.nanoTime() - t1) / 1e9
      }
      def fmt(a: Array[Double]) = a.map(t => f"$t%.2f").mkString(" ")
      println(f"[scanshape] c55pair r13:     ${fmt(tOld)} median ${tOld.sorted.apply(passes / 2)}%.2f")
      println(f"[scanshape] c55pair shipped: ${fmt(tNew)} median ${tNew.sorted.apply(passes / 2)}%.2f")
    }

    // c55 under AQE on vs off, interleaved in ONE session (AQE is a
    // runtime session conf): the bench-default (AQE-on) cross-session
    // medians flapped 3.2-6.3 s while the AQE-off arm above read a flat
    // 1.74 — locate whether the penalty is AQE itself or box noise,
    // and dump the final adaptive plan for the diagnosis.
    if (want("c55aqe")) {
      def run(): Unit =
        graft.operators.Dedup.shingleContainment(
          load(spark, dir, "documents"), 800, 50).collect()
      def setAqe(on: Boolean): Unit =
        spark.conf.set("spark.sql.adaptive.enabled", on.toString)
      setAqe(true); run(); setAqe(false); run() // warm both
      val passes = 5
      val (tOn, tOff) = (Array.ofDim[Double](passes), Array.ofDim[Double](passes))
      for (p <- 0 until passes) {
        setAqe(true)
        val t0 = System.nanoTime(); run(); tOn(p) = (System.nanoTime() - t0) / 1e9
        setAqe(false)
        val t1 = System.nanoTime(); run(); tOff(p) = (System.nanoTime() - t1) / 1e9
      }
      def fmt(a: Array[Double]) = a.map(t => f"$t%.2f").mkString(" ")
      println(f"[scanshape] c55aqe AQE on:  ${fmt(tOn)} median ${tOn.sorted.apply(passes / 2)}%.2f")
      println(f"[scanshape] c55aqe AQE off: ${fmt(tOff)} median ${tOff.sorted.apply(passes / 2)}%.2f")
      setAqe(true)
      val q = graft.operators.Dedup.shingleContainment(
        load(spark, dir, "documents"), 800, 50)
      q.collect()
      println("[scanshape] c55 final adaptive plan:\n" +
        q.queryExecution.executedPlan.toString.take(8000))
      setAqe(false)
    }

    // ---- revlong (r14): scaled-long revenue arithmetic vs Decimal ----
    // The b9/b10 decomposition priced ~0.6 s of each into "li scan +
    // revenue expr". That expr is dec2(price) * fac4(1-disc): two
    // double->Decimal conversions and a precision-29 multiply, which
    // Spark backs with java.math.BigDecimal (Long-backed Decimal stops
    // at precision 18) — an allocation per fact row. Candidate: exact
    // cents/hundredths as BIGINTs via ROUND (the data carries exactly
    // 2 decimals; double*100 is within 1e-9 of the true integer, so
    // round() recovers it exactly and identically in any IEEE engine),
    // then pure long multiply+sum in whole-stage codegen.
    // `revlong` measures under the harness default (AQE off);
    // `revlongaqe` repeats under AQE on — the shipped bench default at
    // 10× — since AQE's runtime coalescing can hide or expose the
    // per-row constant differently.
    if (want("revlong") || want("revlongaqe")) {
      if (legs("revlongaqe"))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      val liRaw = load(spark, dir, "lineitem")
      val revDec = (dec2(col("l_extendedprice")) *
        fac4(lit(1) - col("l_discount"))).as("rev")
      val revLong = (expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)") *
        expr("CAST(ROUND((1 - l_discount) * 100) AS BIGINT)")).as("rev")
      report("rev agg-only (decimal)",
        time(3)(liRaw.select(revDec).agg(sum(col("rev"))).collect()))
      report("rev agg-only (long s4)",
        time(3)(liRaw.select(revLong).agg(sum(col("rev"))).collect()))
      // b10 full, both spellings (grouped, joined with part)
      def b10(rev: org.apache.spark.sql.Column, toDouble: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
        val lir = liRaw.select(col("l_partkey"), rev)
        val part = load(spark, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_type"))
        lir.join(part, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            toDouble(sum(when(col("p_type") === "PROMO", col("rev")).otherwise(lit(0))))
              .as("promo_revenue"),
            toDouble(sum(col("rev"))).as("total_revenue"))
          .select(col("p_brand"), col("promo_revenue"), col("total_revenue"),
            (col("promo_revenue") / col("total_revenue")).as("promo_share"))
          .orderBy(col("p_brand"))
      }
      val decRows = b10(revDec, _.cast("double")).collect()
      val longRows = b10(revLong, c => c.cast("double") / lit(1e4)).collect()
      require(decRows.length == longRows.length, "b10 revlong row count mismatch")
      decRows.zip(longRows).foreach { case (a, b) =>
        require(a.getString(0) == b.getString(0) &&
          math.abs(a.getDouble(1) - b.getDouble(1)) <= math.abs(a.getDouble(1)) * 1e-12 &&
          math.abs(a.getDouble(2) - b.getDouble(2)) <= math.abs(a.getDouble(2)) * 1e-12,
          s"b10 revlong mismatch: $a vs $b")
      }
      report("b10 full (decimal)",
        time(3)(b10(revDec, _.cast("double")).collect()))
      report("b10 full (long s4)",
        time(3)(b10(revLong, c => c.cast("double") / lit(1e4)).collect()))
      // b9 full, both spellings
      def b9rev(rev: org.apache.spark.sql.Column, toDouble: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
        val lo = lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
        val hi = lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00"))
        val asianNations = load(spark, dir, "nation")
          .join(load(spark, dir, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val cust = load(spark, dir, "customer")
          .join(broadcast(asianNations), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
        val ord = load(spark, dir, "orders")
          .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
          .select(col("o_orderkey"), col("o_custkey"))
        val lir = liRaw.select(col("l_orderkey"), col("l_suppkey"), rev)
        val supp = load(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
        ord.join(cust, col("o_custkey") === col("c_custkey"))
          .join(lir, col("o_orderkey") === col("l_orderkey"))
          .join(supp, col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
          .groupBy(col("n_name"))
          .agg(toDouble(sum(col("rev"))).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      }
      val d9 = b9rev(revDec, _.cast("double")).collect()
      val l9 = b9rev(revLong, c => c.cast("double") / lit(1e4)).collect()
      require(d9.length == l9.length, "b9 revlong row count mismatch")
      d9.zip(l9).foreach { case (a, b) =>
        require(a.getString(0) == b.getString(0) &&
          math.abs(a.getDouble(1) - b.getDouble(1)) <= math.abs(a.getDouble(1)) * 1e-12,
          s"b9 revlong mismatch: $a vs $b")
      }
      report("b9 full (decimal)", time(3)(b9rev(revDec, _.cast("double")).collect()))
      report("b9 full (long s4)",
        time(3)(b9rev(revLong, c => c.cast("double") / lit(1e4)).collect()))
    }

    // ---- c68 legs (r13): winnow kernel vs relational window plan ----
    if (want("c68ab")) {
      import org.apache.spark.sql.GraftBridge
      import org.apache.spark.sql.expressions.Window
      val docs = load(spark, dir, "documents")
      def relFps = {
        val grams = docs
          .select(col("doc_id"), GraftBridge.column(graft.functions.TokenNgrams(
            GraftBridge.expression(col("text")),
            n = 4, maxStarts = Int.MaxValue, skipEmpty = true)).as("gs"))
          .select(col("doc_id"), size(col("gs")).cast("long").as("ng"),
            posexplode(col("gs")))
          .select(col("doc_id"), col("ng"), col("pos").cast("long").as("pos"),
            md5(col("col").cast("binary")).as("h"))
        val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(Window.currentRow, 7)
        grams.withColumn("wmin", min(col("h")).over(win))
          .filter(col("pos") <= greatest(lit(0L), col("ng") - 8))
          .select(col("doc_id"), col("wmin").as("fp"))
          .distinct()
      }
      def kernelFps = graft.operators.Dedup.winnowFingerprints(docs)
      relFps.count(); kernelFps.count() // warm both
      val passes = 5
      val (tOld, tNew) = (Array.ofDim[Double](passes), Array.ofDim[Double](passes))
      for (p <- 0 until passes) {
        val t0 = System.nanoTime(); relFps.count(); tOld(p) = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); kernelFps.count(); tNew(p) = (System.nanoTime() - t1) / 1e9
      }
      def fmt(a: Array[Double]) = a.map(t => f"$t%.2f").mkString(" ")
      println(f"[scanshape] c68ab fp window plan: ${fmt(tOld)} median ${tOld.sorted.apply(passes / 2)}%.2f")
      println(f"[scanshape] c68ab fp kernel:      ${fmt(tNew)} median ${tNew.sorted.apply(passes / 2)}%.2f")
      report("c68 full (as declared)",
        time(3)(graft.SparkEntry.queries("c68_winnow_pairs")(spark, dir).collect()))
    }

    spark.stop()
  }
}
