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
    "b3_token_freq" ->
      """WITH toks AS (
        |  SELECT lang, explode(split(text, ' ')) AS tok FROM documents),
        |counts AS (
        |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS n
        |  FROM toks WHERE tok <> '' GROUP BY lang, tok)
        |SELECT lang, tok, n, rn FROM (
        |  SELECT lang, tok, n,
        |         CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS BIGINT) AS rn
        |  FROM counts)
        |WHERE rn <= 10 ORDER BY lang, rn""".stripMargin,
    "b8_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        |SELECT o.o_orderkey, o.o_orderpriority,
        |       CAST(b.sq AS DOUBLE) AS sum_qty, o.o_totalprice
        |FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey
        |ORDER BY sum_qty DESC, o_orderkey LIMIT 30""".stripMargin,
    // c-family: incremental dedup (LEFT ANTI JOIN is the Spark spelling
    // of DuckDB's ANTI JOIN) and token counting (explode(split(...)) is
    // the Spark spelling of DuckDB's unnest(string_split(...))).
    "c7_langid" ->
      """WITH raw AS (SELECT doc_id, lang, explode(split(text, ' ')) AS tok FROM documents),
        |toks AS (SELECT doc_id, lang, tok FROM raw WHERE tok <> ''),
        |scored AS (SELECT doc_id, lang,
        |  sum(CASE WHEN tok IN ('the','a','of','and','is') THEN 1 ELSE 0 END) AS en_hits,
        |  sum(CASE WHEN tok IN ('der','die','das','und','ist') THEN 1 ELSE 0 END) AS de_hits,
        |  sum(CASE WHEN tok IN ('le','la','et','les','est') THEN 1 ELSE 0 END) AS fr_hits,
        |  sum(CASE WHEN tok IN ('el','los','las','y','es') THEN 1 ELSE 0 END) AS es_hits
        |  FROM toks GROUP BY doc_id, lang),
        |pred AS (SELECT lang,
        |  CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits
        |            AND en_hits > 0 THEN 'en'
        |       WHEN de_hits >= fr_hits AND de_hits >= es_hits AND de_hits > 0 THEN 'de'
        |       WHEN fr_hits >= es_hits AND fr_hits > 0 THEN 'fr'
        |       WHEN es_hits > 0 THEN 'es'
        |       ELSE 'und' END AS predicted
        |  FROM scored)
        |SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
        |FROM pred GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,
    // conv(hex, 16, 10) is the Spark spelling of the oracle's instr-
    // over-hex-alphabet arithmetic: both read the first two md5 hex
    // digits as the 0..255 sampling gate.
    "c16_stratified_sample" ->
      """WITH g AS (SELECT lang, doc_id, n_chars,
        |    CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS BIGINT) AS gate
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM g
        |WHERE gate < (CASE WHEN lang = 'en' THEN 32 WHEN lang = 'de' THEN 64 ELSE 128 END)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "c17_quality_filter" ->
      """WITH feat AS (SELECT lang, n_chars,
        |  CAST(size(filter(split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
        |  CAST(size(array_distinct(filter(split(text, ' '), t -> t <> ''))) AS BIGINT) AS n_distinct,
        |  CAST(length(regexp_replace(text, '[^a-z]', '')) AS BIGINT) AS n_alpha
        |  FROM documents),
        |r AS (SELECT lang,
        |  CASE WHEN n_chars < 50 THEN 'too_short'
        |       WHEN n_chars > 5000 THEN 'too_long'
        |       WHEN n_alpha * 10 < n_chars * 6 THEN 'low_alpha'
        |       WHEN n_distinct * 10 < n_tokens * 3 THEN 'repetitive'
        |       ELSE 'keep' END AS reason
        |  FROM feat)
        |SELECT lang, reason, CAST(count(*) AS BIGINT) AS n_docs
        |FROM r GROUP BY lang, reason ORDER BY lang, reason""".stripMargin,
    "c30_source_quota" ->
      """WITH r AS (
        |  SELECT source, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rn
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |       CAST(sum(n_chars) AS BIGINT) AS kept_chars,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM r WHERE rn <= 100
        |GROUP BY source ORDER BY source""".stripMargin,
    "c21_incremental_dedup" ->
      """WITH corpus AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
        |batch AS (SELECT lang, doc_id, md5(text) AS h FROM documents WHERE doc_id % 2 = 1),
        |kept AS (SELECT b.lang, b.doc_id FROM batch b LEFT ANTI JOIN corpus c ON b.h = c.h)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_new, min(doc_id) AS min_doc
        |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,
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
    "d13_big_spenders" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS totc
        |  FROM orders GROUP BY o_custkey),
        |tot AS (SELECT CAST(sum(totc) AS BIGINT) AS grand,
        |               CAST(count(*) AS BIGINT) AS ncust FROM per)
        |SELECT p.o_custkey AS c_custkey, c.c_name,
        |       CAST(p.totc AS DOUBLE) / 100.0 AS total_spend
        |FROM per p CROSS JOIN tot g
        |JOIN customer c ON p.o_custkey = c.c_custkey
        |WHERE p.totc * g.ncust > 2 * g.grand
        |ORDER BY total_spend DESC, c_custkey""".stripMargin,
    "d20_set_ops_all" ->
      """WITH early AS (SELECT o_custkey FROM orders
        |               WHERE o_orderdate < TIMESTAMP '1998-06-01 00:00:00'),
        |late AS (SELECT o_custkey FROM orders
        |         WHERE o_orderdate >= TIMESTAMP '1998-06-01 00:00:00'),
        |u AS (
        |  SELECT o_custkey, 'both_all' AS cohort
        |  FROM (SELECT o_custkey FROM early INTERSECT ALL SELECT o_custkey FROM late)
        |  UNION ALL
        |  SELECT o_custkey, 'lapsed_all' AS cohort
        |  FROM (SELECT o_custkey FROM early EXCEPT ALL SELECT o_custkey FROM late))
        |SELECT cohort, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |       min(o_custkey) AS min_key, max(o_custkey) AS max_key
        |FROM u GROUP BY cohort ORDER BY cohort""".stripMargin,
    // unix_micros(ts) and `div` are the Spark spellings of DuckDB's
    // epoch_us(ts) and `//`.
    "d23_funnel" ->
      """WITH e AS (SELECT user_id, event_type, unix_micros(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t1 AND us <= t1 + 604800000000
        |       GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t2 AND us <= t2 + 604800000000
        |       GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
        |       (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_users
        |UNION ALL SELECT 2, 'click', (SELECT CAST(count(*) AS BIGINT) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM s3)
        |ORDER BY step""".stripMargin,
    "d24_retention" ->
      """WITH e AS (SELECT user_id, unix_micros(ts) div 86400000000 AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1),
        |sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_size FROM f GROUP BY 1),
        |a AS (SELECT DISTINCT e.user_id, f.cohort, e.day - f.cohort AS `offset`
        |      FROM e JOIN f USING (user_id) WHERE e.day - f.cohort <= 7),
        |r AS (SELECT cohort, `offset`, CAST(count(*) AS BIGINT) AS n_active
        |      FROM a GROUP BY cohort, `offset`)
        |SELECT r.cohort, r.`offset`, r.n_active, sz.cohort_size
        |FROM r JOIN sz USING (cohort) ORDER BY r.cohort, r.`offset`""".stripMargin,
    "d25_wow_growth" ->
      """WITH wk AS (SELECT event_type, unix_micros(ts) div 604800000000 AS week,
        |             CAST(count(*) AS BIGINT) AS n
        |           FROM events GROUP BY event_type, week),
        |l AS (SELECT event_type, week, n,
        |        lag(n, 1) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
        |      FROM wk)
        |SELECT event_type, week, n, prev_n,
        |       CASE WHEN prev_n IS NOT NULL
        |            THEN n * 1000 div prev_n END AS ratio_pml
        |FROM l ORDER BY event_type, week""".stripMargin,
    "d26_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events),
        |lg AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |       FROM ev),
        |f AS (SELECT *, CASE WHEN prev_ts IS NULL
        |             OR unix_micros(ts) - unix_micros(prev_ts) > 1800000000
        |             THEN 1 ELSE 0 END AS brk FROM lg),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM f),
        |ft AS (SELECT *, first_value(event_type) OVER (
        |         PARTITION BY user_id, session_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch
        |       FROM s)
        |SELECT first_touch, CAST(count(*) AS BIGINT) AS n_purchases,
        |       CAST(sum(cents) AS BIGINT) AS revenue_cents
        |FROM ft WHERE event_type = 'purchase'
        |GROUP BY first_touch ORDER BY first_touch""".stripMargin,
    "d27_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
        |       CAST(count(*) AS BIGINT) AS n_items,
        |       CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |         AS qty_cents
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "d28_window_family" ->
      """SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS nationkey, c_acctbal,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  lag(c_acctbal, 1) OVER w AS prev_bal,
        |  lead(c_acctbal, 1) OVER w AS next_bal,
        |  nth_value(c_acctbal, 2) OVER wf AS second_bal,
        |  last_value(c_acctbal) OVER wf - first_value(c_acctbal) OVER wf AS span
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey),
        |  wf AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_custkey""".stripMargin,
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
