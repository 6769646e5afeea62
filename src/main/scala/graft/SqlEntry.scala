package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Tables

/** SQL-text access to the query surface — the no-Scala entry point.
  *
  * [[registerViews]] publishes the testdata tables as temp views (same
  * loaders as the DataFrame path, so events.ts normalization and the
  * decimal-exact money casts behave identically), after which ANY query
  * is reachable as plain `spark.sql(...)` text. [[sparkSql]] curates
  * Spark-dialect text for representative queries of every family
  * (a/b/c/d) whose logic is SQL-expressible without the DuckDB-only
  * constructs of [[SparkEntry.oracleSql]] (`unnest(string_split(...))`,
  * `strftime`, `quantile_cont`, `list_*` lambdas) — each one
  * hash-identical to its DataFrame twin (asserted in SqlEntrySpec,
  * which runs both paths and compares collected rows). The remaining
  * oracle texts port the same way: explode(split(...)), date_format,
  * percentile.
  */
object SqlEntry {

  /** The driver's testdata tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table under `dir` as a temp view. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))

  /** Run a curated query by name against the tables under `dir`. */
  def sql(spark: SparkSession, dir: String, name: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sparkSql(name))
  }

  /** Spark-dialect SQL, column-for-column identical to the DataFrame
    * path of the same query name.
    */
  val sparkSql: Map[String, String] = Map(
    // a-family: the reference's status rollup as a windowed share.
    "a7_status_rollup" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(*) AS DOUBLE) * 100.0 /
        |         CAST(sum(count(*)) OVER () AS DOUBLE) AS pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // b-family: exact dedup census and the two TPC-H flagships.
    "b1_exact_dedup" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
        |       CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dupes
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "b4_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(10,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(10,4))) AS DOUBLE) AS sum_charge,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "b5_top_revenue" ->
      """SELECT l_orderkey, date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS o_orderdate,
        |  o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(10,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    // c-family: token counting (explode(split(...)) is the Spark
    // spelling of DuckDB's unnest(string_split(...))).
    "c9_token_count" ->
      """WITH raw AS (SELECT lang, explode(split(text, ' ')) AS tok FROM documents),
        |toks AS (SELECT lang, tok FROM raw WHERE tok <> '')
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
        |       CAST(sum((length(tok) + 3) div 4) AS BIGINT) AS n_subwords,
        |       CAST(sum(length(tok)) AS BIGINT) AS n_word_chars
        |FROM toks GROUP BY lang ORDER BY lang""".stripMargin,
    // d-family: rollup, pivot-shaped conditional aggregation, histogram.
    "d2_rollup_pricing" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "d3_pivot_events" ->
      """SELECT user_id % 10 AS user_bucket,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |       CAST(count(*) AS BIGINT) AS n_total
        |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin,
    "d6_value_histogram" ->
      """SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,
    "d5_set_ops" ->
      """WITH early AS (
        |  SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-06-01 00:00:00'),
        |late AS (
        |  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'),
        |cohorts AS (
        |  SELECT o_custkey, 'both_eras' AS cohort FROM (SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late)
        |  UNION ALL
        |  SELECT o_custkey, 'lapsed' AS cohort FROM (SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late))
        |SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers,
        |       min(o_custkey) AS min_key, max(o_custkey) AS max_key
        |FROM cohorts GROUP BY cohort ORDER BY cohort""".stripMargin,
    "d10_mode_props" ->
      """WITH counts AS (
        |  SELECT event_type,
        |         CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS k,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, k AS mode_k, n FROM (
        |  SELECT event_type, k, n,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY n DESC, k) AS rn
        |  FROM counts)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "d12_lang_inventory" ->
      // listagg WITHIN GROUP is the Spark 4 spelling of DuckDB's
      // string_agg(lang, ',' ORDER BY lang).
      """WITH dl AS (SELECT DISTINCT source, lang FROM documents),
        |ag AS (
        |  SELECT source, listagg(lang, ',') WITHIN GROUP (ORDER BY lang) AS langs,
        |         CAST(count(*) AS BIGINT) AS n_langs
        |  FROM dl GROUP BY source),
        |cn AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |       FROM documents GROUP BY source)
        |SELECT ag.source, ag.langs, ag.n_langs, cn.n_docs
        |FROM ag JOIN cn USING (source) ORDER BY source""".stripMargin,
    "d17_acctbal_deciles" ->
      """WITH d AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_acctbal,
        |         CAST(ntile(10) OVER (PARTITION BY c_nationkey
        |           ORDER BY c_acctbal, c_custkey) AS BIGINT) AS decile
        |  FROM customer)
        |SELECT nationkey, decile, CAST(count(*) AS BIGINT) AS n,
        |       min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
        |FROM d GROUP BY nationkey, decile ORDER BY nationkey, decile""".stripMargin,
    "d18_cube_orders" ->
      // grouping_id(...) is the Spark spelling of DuckDB's multi-arg
      // grouping(...).
      """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
        |       coalesce(o_orderpriority, 'ALL') AS orderpriority,
        |       CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
        |         / 100.0 AS sum_total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, orderstatus, orderpriority""".stripMargin)
}
