package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtOps, Tables}

/** SQL-text access to the query surface — the no-Scala entry point.
  *
  * [[registerViews]] publishes the testdata tables as temp views (same
  * loaders as the DataFrame path, so events.ts normalization and the
  * decimal-exact money casts behave identically) and registers graft's
  * native SQL functions (`simhash64`, `minhash_bands`, `token_ngrams`,
  * `long_array_dot`, `count_min_sketch_exactable`, `qdigest_quantiles`, `qdigest_quantiles_weighted`
  * — the same [[graft.plans.GraftExtensions]] builders a cluster would
  * inject via `spark.sql.extensions`), after which ANY curated query is reachable
  * as plain `spark.sql(...)` text. [[sparkSql]] carries Spark-dialect
  * text for 130 of the 142 declared queries: the COMPLETE a-family
  * (7/7), d-family (32/32), the b-family except the as-of trio, and
  * the c-family except the iterative-training queries — porting the
  * DuckDB-only constructs of [[SparkEntry.oracleSql]] to their Spark
  * spellings (`unnest(string_split(...))` → `explode(split(...))`,
  * `strftime` → `date_format`, `epoch_us`/`//` → `unix_micros`/`div`,
  * `string_agg ... ORDER BY` → `listagg ... WITHIN GROUP`, `list_*` →
  * array lambdas) and the kernel-riding queries to their registered
  * SQL functions. Each text is asserted row-identical to its DataFrame
  * twin in SqlEntrySpec, which runs both paths and compares collected
  * rows.
  *
  * The 12 remaining queries are DataFrame-only, each for a structural
  * reason no SQL text can express (not a missing port):
  *
  * | Query | Why no SQL text |
  * |---|---|
  * | b7/b7b/b7c (as-of trio) | custom MergeAsOfExec physical operator; Spark SQL has no ASOF JOIN syntax |
  * | c11_multimodal | typed `mapPartitions` binary decode — imperative per-partition logic, not a relational expression |
  * | c12_ann_ivf, c31_semdedup, c34_cluster_profile, c56_diverse_sample, c65_label_outliers, c66_knn_agreement | driver-side Lloyd k-means training loop (literal-centroid codebook collected per round); Spark SQL has no iteration |
  * | c15_dedup_groups, c25_canonical_docs | connected components by min-label propagation run to FIXPOINT. Spark 4.1 DOES parse `WITH RECURSIVE`, but only with UNION ALL (`UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE`, probed on this build) — on the SYMMETRIC near-dup edge set a UNION ALL closure walks cycles forever (and a depth-bounded variant enumerates paths, exponential in clique size), so a cycle-safe transitive closure is still inexpressible as text; DuckDB's oracle uses recursive UNION (set semantics), which is exactly the part Spark lacks |
  *
  * Probe currency: the UNION-limitation probe above binds to the
  * installed jar. r13 check: still spark-sql_2.13-4.1.2 — no version
  * bump since the r12 probe, so the 12-query excuse table stands
  * unchanged. Re-run the probe (a literal `WITH RECURSIVE … UNION`
  * parse attempt) the first round the jar under /opt/spark/jars moves.
  */
object SqlEntry {

  /** The driver's testdata tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table under `dir` as a temp view, plus
    * graft's native SQL functions (idempotent — the same builders
    * `spark.sql.extensions=graft.plans.GraftExtensions` injects at
    * session build, for sessions that already exist).
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    org.apache.spark.sql.GraftBridge.registerFunctions(spark)
    tableNames.foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))
  }

  /** Run a curated query by name against the tables under `dir`. */
  def sql(spark: SparkSession, dir: String, name: String): DataFrame = {
    registerViews(spark, dir)
    spark.sql(sparkSql(name))
  }

  /** The 4 × 16-bit band explode of a 64-bit SimHash fingerprint column
    * `sh` — the SQL spelling of [[graft.operators.Dedup.BandStackSql]]
    * over [[graft.operators.Dedup.simhashBands]]'s bit slices.
    */
  private val simhashBandStack: String =
    "stack(4, " + (0 until 4).map(k =>
      s"$k, shiftrightunsigned(sh, ${16 * k}) & 65535").mkString(", ") +
      ") AS (band_id, bv)"

  /** The DECIMAL(12,4)·10⁴ scaled-long embedding quantization
    * ([[graft.operators.Similarity.scaled]]'s exact spelling).
    */
  private val scaledEmb: String =
    "transform(embedding, x -> CAST(CAST(x AS DECIMAL(12,4)) * 10000 AS BIGINT))"

  /** `sqrt(dot(ie, ie))` over a pre-scaled long array — the norm leg of
    * [[graft.operators.Similarity.dot]]'s `/ 1e8` unscaling.
    */
  private def normSql(a: String): String =
    s"sqrt(CAST(long_array_dot($a, $a) AS DOUBLE) / 1.0e8)"

  /** Unscaled exact dot product of two pre-scaled long-array columns. */
  private def dotSql(a: String, b: String): String =
    s"(CAST(long_array_dot($a, $b) AS DOUBLE) / 1.0e8)"

  /** The 16 × 4-bit sign-band structs of
    * [[graft.operators.Similarity.signBands]]: band b covers dims
    * 4b+1..4b+4, MSB-first sign bits.
    */
  private val signBandStructs: String =
    (0 until 16).map { b =>
      val bv = (1 to 4).map(k =>
        s"IF(try_element_at(embedding, ${4 * b + k}) >= 0, ${1 << (4 - k)}, 0)")
        .mkString(" + ")
      s"struct($b AS band_id, $bv AS bv)"
    }.mkString(", ")

  /** CMS bucket id for depth `d` — the SQL spelling of
    * [[graft.functions.CountMinSketchAgg.bucketColumn]].
    */
  private def cmsBucket(d: Int, tok: String, width: Int): String =
    s"pmod(CAST(conv(substring(md5(CAST(concat('$d:', $tok) AS BINARY)), 1, 4), 16, 10) " +
      s"AS BIGINT), $width)"

  /** The synthetic file-manifest CTE every Group A query starts from —
    * the Spark spelling of [[graft.queries.GroupA.manifestSql]]
    * (CAST AS STRING for VARCHAR; `replace` and `concat` are shared).
    */
  private val manifestSql: String =
    """WITH m AS (
      |  SELECT concat('/src/tree', CAST(p_partkey % 3 AS STRING)) AS root,
      |         concat('/src/tree', CAST(p_partkey % 3 AS STRING), '/',
      |                lower(replace(p_brand, '#', '_')),
      |                '/part_', CAST(p_partkey AS STRING), '.dat') AS path,
      |         concat('data/part_', CAST(p_partkey % 147 AS STRING), '.dat') AS relative_dst,
      |         CAST(p_size AS BIGINT) * 1024 + p_partkey % 977 AS length
      |  FROM part
      |)""".stripMargin

  /** Spark-dialect SQL, column-for-column identical to the DataFrame
    * path of the same query name.
    */
  val sparkSql: Map[String, String] = Map(
    // a-family: the reference's computations over the manifest CTE.
    "a1_dup_dst" ->
      s"""$manifestSql
         |SELECT relative_dst, CAST(count(*) AS BIGINT) AS n_sources,
         |       listagg(path, ',') WITHIN GROUP (ORDER BY path) AS src_paths
         |FROM m GROUP BY relative_dst HAVING count(*) > 1
         |ORDER BY relative_dst""".stripMargin,
    "a2_job_metrics" ->
      s"""$manifestSql
         |SELECT root, CAST(count(*) AS BIGINT) AS file_count,
         |       CAST(sum(length) AS BIGINT) AS byte_count,
         |       max(length) AS max_len, min(path) AS first_path
         |FROM m GROUP BY root ORDER BY root""".stripMargin,
    "a3_bin_pack" ->
      s"""$manifestSql
         |SELECT root, path, length,
         |       CAST(sum(length) OVER (PARTITION BY root ORDER BY path
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_bytes,
         |       (CAST(sum(length) OVER (PARTITION BY root ORDER BY path
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - length) div 1048576 AS bin
         |FROM m ORDER BY root, path""".stripMargin,
    "a4_map_count" ->
      s"""$manifestSql
         |SELECT root, CAST(count(*) AS BIGINT) AS file_count,
         |       greatest(least(CAST(count(*) AS BIGINT), 640), 1) AS maps
         |FROM m GROUP BY root ORDER BY root""".stripMargin,
    "a5_relative_path" ->
      s"""$manifestSql, u AS (
         |  SELECT root, path FROM m
         |  UNION ALL SELECT DISTINCT root, root AS path FROM m
         |)
         |SELECT root, path,
         |       CASE WHEN path = root THEN '.'
         |            ELSE substr(path, length(root) + 2) END AS rel
         |FROM u ORDER BY root, path""".stripMargin,
    "a6_topk_files" ->
      s"""$manifestSql
         |SELECT root, path, length, rn FROM (
         |  SELECT root, path, length,
         |         CAST(row_number() OVER (PARTITION BY root
         |           ORDER BY length DESC, path) AS BIGINT) AS rn
         |  FROM m)
         |WHERE rn <= 5 ORDER BY root, rn""".stripMargin,
    // The reference's status rollup as a windowed share.
    "a7_status_rollup" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(*) AS DOUBLE) * 100.0 /
        |         CAST(sum(count(*)) OVER () AS DOUBLE) AS pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // b-family: exact dedup census and the two TPC-H flagships.
    // COALESCE: the DataFrame twin distinct-then-counts, which keeps a
    // (source, NULL-hash) row; a bare count(DISTINCT md5(text)) skips
    // NULL text and would drift by one per source on corpora with NULL
    // text (the c24 oracle's NULL rule — md5 is 32 hex chars, never '',
    // so the sentinel cannot collide).
    "b1_exact_dedup" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(DISTINCT coalesce(md5(text), '')) AS BIGINT) AS n_distinct,
        |       CAST(count(*) - count(DISTINCT coalesce(md5(text), '')) AS BIGINT) AS n_dupes
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
    // slice/array_join/listagg are the Spark spellings of DuckDB's
    // list_slice/array_to_string/string_agg(... ORDER BY).
    "b1b_prefix_dedup" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         md5(array_join(slice(split(text, ' ', 5), 1, 4), ' ')) AS h
        |  FROM documents)
        |SELECT h, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS exemplar,
        |       listagg(CAST(doc_id AS STRING), ',')
        |         WITHIN GROUP (ORDER BY CAST(doc_id AS STRING)) AS doc_ids
        |FROM h GROUP BY h HAVING count(*) > 1 ORDER BY h""".stripMargin,
    "b2_jaccard_pairs" ->
      s"""WITH toks0 AS (
        |  SELECT DISTINCT doc_id, lang, tok
        |  FROM (SELECT doc_id, lang, explode(split(text, ' ')) AS tok
        |        FROM documents WHERE doc_id % 5 = 0)
        |  WHERE tok <> ''),
        |df AS (SELECT lang, tok FROM toks0 GROUP BY lang, tok
        |       HAVING count(*) <= ${graft.queries.GroupB.B2_DF_CAP}),
        |toks AS (SELECT t.doc_id, t.lang, t.tok
        |         FROM toks0 t JOIN df ON t.lang = df.lang AND t.tok = df.tok),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
        |inter AS (
        |  SELECT a.lang, a.doc_id AS da, b.doc_id AS db, count(*) AS inter
        |  FROM toks a JOIN toks b ON a.lang = b.lang AND a.tok = b.tok
        |  WHERE a.doc_id < b.doc_id
        |  GROUP BY a.lang, a.doc_id, b.doc_id)
        |SELECT i.lang, i.da, i.db,
        |       CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) AS jaccard
        |FROM inter i JOIN sizes sa ON i.da = sa.doc_id
        |             JOIN sizes sb ON i.db = sb.doc_id
        |ORDER BY jaccard DESC, da, db LIMIT 20""".stripMargin,
    // (b7/b7b/b7c — the as-of trio — are deliberately absent: they run
    // on the custom MergeAsOfExec physical operator, and Spark SQL has
    // no ASOF JOIN syntax to express them in text.)
    // date_format is the Spark spelling of DuckDB's strftime.
    "b6_hourly_events" ->
      """SELECT date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss') AS hour_start,
        |       event_type,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    "b9_local_supplier_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(10,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "b10_promo_share" ->
      """WITH agg AS (
        |  SELECT p_brand,
        |    CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(10,4)) ELSE 0 END) AS DOUBLE) AS promo_revenue,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             CAST(1 - l_discount AS DECIMAL(10,4))) AS DOUBLE) AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand)
        |SELECT p_brand, promo_revenue, total_revenue,
        |       promo_revenue / total_revenue AS promo_share
        |FROM agg ORDER BY p_brand""".stripMargin,
    "b11_nation_volume" ->
      """WITH sn AS (SELECT s_suppkey, n_name AS supp_nation
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_1', 'NATION_3')),
        |cn AS (SELECT c_custkey, n_name AS cust_nation
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_1', 'NATION_3'))
        |SELECT sn.supp_nation, cn.cust_nation,
        |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                CAST(1 - l_discount AS DECIMAL(10,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN sn ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN cn ON o_custkey = c_custkey
        |WHERE sn.supp_nation <> cn.cust_nation
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "b12_waiting_suppliers" ->
      """WITH late AS (
        |  SELECT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM late l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s.s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "b13_part_top_supplier" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |      sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_d,
        |      CAST(count(*) AS BIGINT) AS n_items
        |    FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT ps.*, row_number() OVER (PARTITION BY l_partkey
        |        ORDER BY rev_d DESC, l_suppkey) AS rn FROM ps)
        |SELECT l_partkey, l_suppkey AS top_suppkey,
        |       CAST(rev_d AS DOUBLE) AS revenue, n_items
        |FROM r WHERE rn = 1 ORDER BY l_partkey""".stripMargin,
    "b14_order_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "b15_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                CAST(l_discount AS DECIMAL(10,4))) AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND CAST(l_discount AS DECIMAL(10,4)) BETWEEN CAST(0.05 AS DECIMAL(10,4))
        |                                            AND CAST(0.07 AS DECIMAL(10,4))
        |  AND CAST(l_quantity AS DECIMAL(18,2)) < 24""".stripMargin,
    "b16_market_share" ->
      """WITH j AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           CAST(1 - l_discount AS DECIMAL(10,4)) AS rev,
        |         sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  JOIN orders ON l_orderkey = o_orderkey
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey)
        |SELECT o_year,
        |       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END) AS DOUBLE)
        |         AS nation_revenue,
        |       CAST(sum(rev) AS DOUBLE) AS total_revenue,
        |       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END) AS DOUBLE)
        |         / CAST(sum(rev) AS DOUBLE) AS mkt_share
        |FROM j GROUP BY o_year ORDER BY o_year""".stripMargin,
    "b17_product_profit" ->
      """SELECT sn.n_name AS supp_nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(sum(
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           * CAST(CAST(1 - l_discount AS DECIMAL(10,4)) * 10000 AS BIGINT)
        |         - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           * CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) * 100
        |       ) AS BIGINT) AS profit_micros,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY supp_nation, o_year ORDER BY supp_nation, o_year""".stripMargin,
    "b18_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                CAST(1 - l_discount AS DECIMAL(10,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "b19_important_suppliers" ->
      """WITH v AS (
        |  SELECT l_suppkey AS s_suppkey,
        |         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |             * CAST(CAST(1 - l_discount AS DECIMAL(10,4)) * 10000 AS BIGINT))
        |           AS BIGINT) AS value_micros
        |  FROM lineitem GROUP BY l_suppkey),
        |t AS (SELECT CAST(sum(value_micros) AS BIGINT) AS total_micros FROM v)
        |SELECT s_suppkey, value_micros FROM v CROSS JOIN t
        |WHERE value_micros * 100 > total_micros
        |ORDER BY value_micros DESC, s_suppkey""".stripMargin,
    // datediff(end, start) is the Spark spelling of DuckDB's
    // date_diff('day', start, end).
    "b20_ship_delay" ->
      """SELECT CASE WHEN datediff(l_shipdate, o_orderdate) <= 30 THEN 'FAST'
        |            WHEN datediff(l_shipdate, o_orderdate) <= 60 THEN 'MEDIUM'
        |            ELSE 'SLOW' END AS delay_class,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY delay_class ORDER BY delay_class""".stripMargin,
    "b21_custdist" ->
      """WITH co AS (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey)
        |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM co GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "b22_top_supplier" ->
      """WITH r AS (
        |  SELECT l_suppkey,
        |         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |             * CAST(CAST(1 - l_discount AS DECIMAL(10,4)) * 10000 AS BIGINT))
        |           AS BIGINT) AS revenue_micros
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, revenue_micros
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE revenue_micros = (SELECT max(revenue_micros) FROM r)
        |ORDER BY s_suppkey""".stripMargin,
    "b23_parts_suppliers" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN
        |      (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "b24_small_qty_revenue" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |         CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qx100,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS px100
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#12' AND p_size < 15),
        |a AS (SELECT l_partkey AS a_partkey, CAST(sum(qx100) AS BIGINT) AS sum_qx100,
        |             CAST(count(*) AS BIGINT) AS n_lines
        |      FROM li GROUP BY l_partkey)
        |SELECT CAST(CAST(sum(px100) AS BIGINT) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly,
        |       CAST(count(*) AS BIGINT) AS n_lines_small
        |FROM li JOIN a ON l_partkey = a_partkey
        |WHERE qx100 * 5 * n_lines < sum_qx100""".stripMargin,
    "b25_disjunct_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                CAST(1 - l_discount AS DECIMAL(10,4))) AS DOUBLE) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 20 AND 30)""".stripMargin,
    "b26_promo_suppliers" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_suppkey
        |  HAVING sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) > 5000)
        |ORDER BY s_name""".stripMargin,
    "b27_idle_rich_customers" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents
        |  FROM customer),
        |p AS (SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_cents,
        |             CAST(count(*) AS BIGINT) AS n_pos
        |      FROM c WHERE bal_cents > 0)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS n_custs,
        |       CAST(CAST(sum(bal_cents) AS BIGINT) AS DOUBLE) / 100.0 AS total_bal
        |FROM c CROSS JOIN p
        |JOIN nation ON c.c_nationkey = n_nationkey
        |WHERE bal_cents * n_pos > sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
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
    "c8_quality" ->
      """WITH perdoc AS (SELECT lang, n_chars,
        |  CAST(size(filter(split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
        |  CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS is_long
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens,
        |  CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE) AS avg_tok_len,
        |  CAST(sum(is_long) AS DOUBLE) / count(*) AS share_long
        |FROM perdoc GROUP BY lang ORDER BY lang""".stripMargin,
    "c13_salted_agg" ->
      """SELECT event_type,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "c18_redact_stats" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(length(props) - length(regexp_replace(props, '[0-9]', ''))) AS BIGINT)
        |         AS n_chars_redacted
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "c19_tfidf_terms" ->
      """WITH raw AS (SELECT lang, doc_id, explode(split(text, ' ')) AS tok FROM documents),
        |toks AS (SELECT lang, doc_id, tok FROM raw WHERE tok <> ''),
        |n AS (SELECT count(DISTINCT doc_id) AS n_total FROM toks),
        |tf AS (SELECT lang, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT tok, count(*) AS df
        |       FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
        |s AS (SELECT tf.lang, tf.tok,
        |             CAST(tf.tf * n.n_total AS DOUBLE) / df.df AS score
        |      FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n)
        |SELECT lang, tok, score, rn FROM (
        |  SELECT lang, tok, score,
        |         CAST(row_number() OVER (PARTITION BY lang ORDER BY score DESC, tok) AS BIGINT) AS rn
        |  FROM s)
        |WHERE rn <= 5 ORDER BY lang, rn""".stripMargin,
    "c29_salted_join" ->
      """WITH ev AS (SELECT event_type,
        |              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |            FROM events),
        |st AS (SELECT event_type, CAST(sum(vc) AS BIGINT) AS tot,
        |              CAST(count(*) AS BIGINT) AS n
        |       FROM ev GROUP BY event_type)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN e.vc * s.n > s.tot THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_above_avg
        |FROM ev e JOIN st s ON e.event_type = s.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "c20_pack_plan" ->
      """WITH d AS (SELECT lang, doc_id,
        |    CAST(size(filter(split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT lang, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d),
        |p AS (SELECT lang, doc_id, n_tokens, (cum - n_tokens) div 8192 AS pack_id FROM c)
        |SELECT lang, CAST(pack_id AS BIGINT) AS pack_id, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM p GROUP BY 1, 2 ORDER BY lang, pack_id""".stripMargin,
    // explode(sequence(...)) + element_at replace DuckDB's lateral
    // range() + list indexing; FILTER gains its WHERE keyword.
    "c23_bigram_novelty" ->
      """WITH toks AS (SELECT doc_id, lang, split(text, ' ') AS a FROM documents),
        |bg0 AS (SELECT doc_id, lang, a,
        |          explode(sequence(1, size(a) - 1)) AS i
        |        FROM toks WHERE size(a) > 1),
        |bg AS (SELECT doc_id, lang,
        |         concat(element_at(a, i), ' ', element_at(a, i + 1)) AS b
        |       FROM bg0
        |       WHERE element_at(a, i) <> '' AND element_at(a, i + 1) <> ''),
        |cnt AS (SELECT lang, b, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY 1, 2),
        |occ AS (SELECT lang, CAST(sum(n) AS BIGINT) AS sum_bigrams,
        |               CAST(coalesce(sum(n) FILTER (WHERE n <= 3), 0) AS BIGINT) AS sum_rare,
        |               CAST(count(*) AS BIGINT) AS n_bigram_types
        |        FROM cnt GROUP BY lang),
        |d AS (SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |      FROM bg GROUP BY lang)
        |SELECT d.lang, d.n_docs, occ.sum_bigrams, occ.sum_rare, occ.n_bigram_types
        |FROM d JOIN occ ON d.lang = occ.lang ORDER BY d.lang""".stripMargin,
    "c26_vocab_coverage" ->
      """WITH raw AS (SELECT explode(split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n
        |      FROM raw WHERE tok <> '' GROUP BY tok),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
        |r AS (SELECT tok, n,
        |        CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rn,
        |        CAST(sum(n) OVER (ORDER BY n DESC, tok
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM c)
        |SELECT CAST(p.pct AS BIGINT) AS pct, min(r.rn) AS vocab_size,
        |       min(r.cum) AS covered_tokens, min(t.total) AS total_tokens
        |FROM r CROSS JOIN t
        |CROSS JOIN (SELECT explode(array(50, 90, 95, 99)) AS pct) p
        |WHERE r.cum * 100 >= p.pct * t.total
        |GROUP BY p.pct ORDER BY pct""".stripMargin,
    "c27_contamination" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |    filter(split(text, ' '), x -> x <> '') AS toks FROM documents),
         |t8 AS (SELECT doc_id, lang, toks FROM t WHERE size(toks) >= 8),
         |ng0 AS (SELECT doc_id, lang,
         |    explode(transform(sequence(1, size(toks) - 7),
         |           i -> array_join(slice(toks, i, 8), ' '))) AS g0
         |  FROM t8),
         |ng AS (SELECT DISTINCT doc_id, lang, xxhash64(g0) AS g FROM ng0),
         |evn AS (SELECT doc_id, lang, g FROM ng WHERE doc_id % 97 = 0),
         |trn0 AS (SELECT doc_id, g FROM ng WHERE doc_id % 97 <> 0),
         |gdf AS (SELECT g FROM trn0 GROUP BY g HAVING count(*) <= ${ExtOps.C27_DF_CAP}),
         |trn AS (SELECT t.doc_id, t.g FROM trn0 t JOIN gdf ON t.g = gdf.g),
         |pairs AS (SELECT DISTINCT e.lang, t.doc_id AS train_doc, e.doc_id AS eval_doc
         |  FROM trn t JOIN evn e ON t.g = e.g),
         |ev AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_eval
         |  FROM documents WHERE doc_id % 97 = 0 GROUP BY lang),
         |cont AS (SELECT lang, CAST(count(DISTINCT eval_doc) AS BIGINT) AS n_contaminated,
         |         CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM pairs GROUP BY lang)
         |SELECT ev.lang, ev.n_eval,
         |       coalesce(cont.n_contaminated, 0) AS n_contaminated,
         |       coalesce(cont.n_pairs, 0) AS n_pairs
         |FROM ev LEFT JOIN cont ON ev.lang = cont.lang ORDER BY ev.lang""".stripMargin,
    "c32_repeated_spans" ->
      """WITH t AS (SELECT doc_id,
        |    filter(split(text, ' '), x -> x <> '') AS toks FROM documents),
        |t8 AS (SELECT doc_id, toks FROM t WHERE size(toks) >= 8),
        |ng0 AS (SELECT doc_id,
        |    explode(transform(sequence(1, size(toks) - 7),
        |           i -> array_join(slice(toks, i, 8), ' '))) AS g0
        |  FROM t8),
        |ng AS (SELECT DISTINCT doc_id, md5(g0) AS g FROM ng0)
        |SELECT g, CAST(count(*) AS BIGINT) AS n_docs,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM ng GROUP BY g HAVING count(*) >= 2
        |ORDER BY n_docs DESC, g LIMIT 100""".stripMargin,
    "c33_token_budget" ->
      """WITH d AS (SELECT source, doc_id,
        |    CAST(size(filter(split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
        |    md5(CAST(doc_id AS STRING)) AS h FROM documents),
        |c AS (SELECT source, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d),
        |k AS (SELECT * FROM c WHERE cum - n_tokens < 800)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |       CAST(sum(n_tokens) AS BIGINT) AS kept_tokens,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM k GROUP BY source ORDER BY source""".stripMargin,
    "c35_chunk_windows" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |    filter(split(text, ' '), x -> x <> '') AS toks FROM documents),
         |d AS (SELECT doc_id, lang, toks, CAST(size(toks) AS BIGINT) AS n
         |      FROM t WHERE size(toks) > 0),
         |c AS (SELECT doc_id, lang, toks, n,
         |        explode(sequence(0, CASE WHEN n <= ${ExtOps.CHUNK_W} THEN 0
         |          ELSE (n - ${ExtOps.CHUNK_W} + ${ExtOps.CHUNK_S} - 1) div ${ExtOps.CHUNK_S} END)) AS i
         |      FROM d),
         |ch AS (SELECT lang, doc_id,
         |        least(${ExtOps.CHUNK_W}, n - i * ${ExtOps.CHUNK_S}) AS clen,
         |        md5(array_join(slice(toks, CAST(i * ${ExtOps.CHUNK_S} + 1 AS INT),
         |          CAST(least(${ExtOps.CHUNK_W}, n - i * ${ExtOps.CHUNK_S}) AS INT)), ' ')) AS h
         |      FROM c)
         |SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |       CAST(count(*) AS BIGINT) AS n_chunks,
         |       CAST(sum(clen) AS BIGINT) AS chunk_tokens,
         |       CAST(count(DISTINCT h) AS BIGINT) AS n_uniq_chunks
         |FROM ch GROUP BY lang ORDER BY lang""".stripMargin,
    "c37_weighted_sample" ->
      """WITH d AS (SELECT source, doc_id,
        |    CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
        |    CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS BIGINT) AS gate
        |  FROM documents),
        |w AS (SELECT source, doc_id, n_tokens, gate,
        |        least(240, 16 + n_tokens * 2) AS w256 FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(w256) AS BIGINT) AS expected_kept_x256,
        |       CAST(coalesce(sum(CASE WHEN gate < w256 THEN 1 END), 0) AS BIGINT) AS n_kept,
        |       CAST(coalesce(sum(CASE WHEN gate < w256 THEN n_tokens END), 0) AS BIGINT)
        |         AS kept_tokens
        |FROM w GROUP BY source ORDER BY source""".stripMargin,
    // The same interleave arithmetic the engine and the DuckDB oracle
    // share (ZOrder.zvalueSql emits engine-neutral shift/mask SQL).
    "c38_zorder_profile" ->
      s"""WITH xy AS (SELECT user_id % 65536 AS x,
         |    (unix_micros(ts) div 1000000) % 65536 AS y FROM events),
         |z AS (SELECT x, y, ${graft.functions.ZOrder.zvalueSql("x", "y")} AS z FROM xy)
         |SELECT z >> 26 AS z_cell, CAST(count(*) AS BIGINT) AS n_events,
         |       min(x) AS x_min, max(x) AS x_max,
         |       min(y) AS y_min, max(y) AS y_max
         |FROM z GROUP BY z_cell ORDER BY z_cell""".stripMargin,
    // RLIKE is the Spark spelling of DuckDB's regexp_matches;
    // regexp_extract_all + explode replace unnest.
    "c41_pretokenize" ->
      """WITH t AS (SELECT lang,
        |    explode(regexp_extract_all(concat(text, ' id=', doc_id, '.', n_chars),
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)) AS tok
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(coalesce(sum(CASE WHEN tok RLIKE '^[A-Za-z]+$'
        |         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_alpha,
        |       CAST(coalesce(sum(CASE WHEN tok RLIKE '^[0-9]+$'
        |         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_num,
        |       CAST(coalesce(sum(CASE WHEN tok RLIKE '^[A-Za-z0-9]'
        |         THEN 0 ELSE 1 END), 0) AS BIGINT) AS n_other,
        |       CAST(sum(length(tok)) AS BIGINT) AS n_tok_chars
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "c58_cross_source_overlap" ->
      """WITH hp AS (SELECT DISTINCT source,
        |    md5(array_join(slice(split(text, ' ', 5), 1, 4), ' ')) AS h
        |  FROM documents),
        |he AS (SELECT DISTINCT source, md5(text) AS h FROM documents),
        |pp AS (SELECT a.source AS source_a, b.source AS source_b,
        |              CAST(count(DISTINCT a.h) AS BIGINT) AS n_shared_prefix
        |       FROM hp a JOIN hp b ON a.h = b.h AND a.source < b.source
        |       GROUP BY 1, 2),
        |pe AS (SELECT a.source AS source_a, b.source AS source_b,
        |              CAST(count(DISTINCT a.h) AS BIGINT) AS n_shared_exact
        |       FROM he a JOIN he b ON a.h = b.h AND a.source < b.source
        |       GROUP BY 1, 2)
        |SELECT pp.source_a, pp.source_b, pp.n_shared_prefix,
        |       coalesce(pe.n_shared_exact, 0) AS n_shared_exact
        |FROM pp LEFT JOIN pe
        |  ON pp.source_a = pe.source_a AND pp.source_b = pe.source_b
        |ORDER BY pp.source_a, pp.source_b""".stripMargin,
    "c46_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS h1, true AS in1
        |            FROM documents WHERE doc_id % 10 <> 3),
        |v2 AS (SELECT doc_id,
        |         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END) AS h2,
        |         true AS in2
        |       FROM documents WHERE doc_id % 10 <> 7),
        |d AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS id,
        |        CASE WHEN in1 IS NULL THEN 'added'
        |             WHEN in2 IS NULL THEN 'removed'
        |             WHEN h1 IS DISTINCT FROM h2 THEN 'changed'
        |             ELSE 'unchanged' END AS status
        |      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
        |SELECT doc.lang, d.status, CAST(count(*) AS BIGINT) AS n_docs,
        |       min(d.id) AS min_doc, max(d.id) AS max_doc
        |FROM d JOIN documents doc ON d.id = doc.doc_id
        |GROUP BY doc.lang, d.status ORDER BY doc.lang, d.status""".stripMargin,
    "c48_snapshot_drift" ->
      """WITH v1 AS (SELECT lang,
        |    CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE doc_id % 10 <> 3),
        |v2 AS (SELECT lang,
        |    CAST(size(filter(split(
        |      CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END, ' '),
        |      x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE doc_id % 10 <> 7),
        |h1 AS (SELECT lang, n_tokens, CAST(count(*) AS BIGINT) AS c1
        |       FROM v1 GROUP BY lang, n_tokens),
        |h2 AS (SELECT lang, n_tokens, CAST(count(*) AS BIGINT) AS c2
        |       FROM v2 GROUP BY lang, n_tokens),
        |j AS (SELECT coalesce(h1.lang, h2.lang) AS lang,
        |        coalesce(c1, 0) AS c1, coalesce(c2, 0) AS c2
        |      FROM h1 FULL OUTER JOIN h2
        |        ON h1.lang = h2.lang AND h1.n_tokens = h2.n_tokens)
        |SELECT lang, CAST(sum(abs(c1 - c2)) AS BIGINT) AS l1_drift,
        |       CAST(sum(c1) AS BIGINT) AS n_v1, CAST(sum(c2) AS BIGINT) AS n_v2
        |FROM j GROUP BY lang ORDER BY lang""".stripMargin,
    // DECIMAL(38,0) + div replace DuckDB's HUGEINT + // throughout the
    // integer-exact c-family scores.
    "c50_collocations" ->
      """WITH toks AS (SELECT lang,
        |    explode(filter(split(text, ' '), x -> x <> '')) AS tok
        |  FROM documents),
        |uni AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS n_u
        |        FROM toks GROUP BY lang, tok),
        |tot AS (SELECT lang, CAST(sum(n_u) AS BIGINT) AS n_tot FROM uni GROUP BY lang),
        |t AS (SELECT lang, filter(split(text, ' '), x -> x <> '') AS tk
        |      FROM documents),
        |bg0 AS (SELECT lang,
        |    explode(transform(sequence(1, size(tk) - 1),
        |      i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))) AS bigram
        |  FROM t WHERE size(tk) >= 2),
        |bg AS (SELECT lang, bigram, CAST(count(*) AS BIGINT) AS n_ab
        |       FROM bg0 GROUP BY lang, bigram HAVING count(*) >= 5),
        |j AS (SELECT bg.lang, bg.bigram, bg.n_ab, ua.n_u AS n_a, ub.n_u AS n_b,
        |             tot.n_tot
        |      FROM bg
        |      JOIN uni ua ON bg.lang = ua.lang
        |        AND element_at(split(bg.bigram, ' '), 1) = ua.tok
        |      JOIN uni ub ON bg.lang = ub.lang
        |        AND element_at(split(bg.bigram, ' '), 2) = ub.tok
        |      JOIN tot ON bg.lang = tot.lang)
        |SELECT lang, bigram, n_ab, n_a, n_b,
        |       CAST((CAST(n_ab AS DECIMAL(38,0)) * n_tot * 1000)
        |            div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT) AS lift_x1000
        |FROM j ORDER BY lift_x1000 DESC, lang, bigram LIMIT 20""".stripMargin,
    "c52_mixture_weights" ->
      """WITH d AS (SELECT source,
        |    CAST(size(filter(split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(n_tokens) AS BIGINT) AS actual_tokens
        |      FROM d GROUP BY source),
        |t AS (SELECT CAST(sum(actual_tokens) AS BIGINT) AS tot_tokens,
        |             CAST(count(*) AS BIGINT) AS n_sources FROM s),
        |w AS (SELECT source, n_docs, actual_tokens,
        |             tot_tokens div n_sources AS target_tokens,
        |             least(CAST(1000 AS BIGINT), ((tot_tokens div n_sources) * 1000)
        |                   div greatest(actual_tokens, 1)) AS weight_x1000
        |      FROM s CROSS JOIN t)
        |SELECT source, n_docs, actual_tokens,
        |       CAST(target_tokens AS BIGINT) AS target_tokens,
        |       CAST(weight_x1000 AS BIGINT) AS weight_x1000,
        |       CAST((actual_tokens * weight_x1000) div 1000 AS BIGINT) AS effective_tokens
        |FROM w ORDER BY source""".stripMargin,
    "c53_rarity_score" ->
      """WITH raw AS (SELECT lang, doc_id, explode(split(text, ' ')) AS tok FROM documents),
        |toks AS (SELECT lang, doc_id, tok FROM raw WHERE tok <> ''),
        |dft AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
        |        FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok),
        |perdoc AS (SELECT t.lang, t.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        |                  CAST(sum(df) AS BIGINT) AS sum_df
        |           FROM toks t JOIN dft ON t.tok = dft.tok GROUP BY 1, 2),
        |perlang AS (SELECT lang, CAST(sum(n_toks) AS BIGINT) AS lang_toks,
        |                   CAST(sum(sum_df) AS BIGINT) AS lang_df
        |            FROM perdoc GROUP BY lang)
        |SELECT p.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(*) FILTER (WHERE CAST(sum_df AS DECIMAL(38,0)) * lang_toks
        |            < CAST(n_toks AS DECIMAL(38,0)) * lang_df) AS BIGINT) AS n_rare_docs,
        |       CAST(max(lang_toks) AS BIGINT) AS lang_tokens,
        |       CAST((CAST(max(lang_df) AS DECIMAL(38,0)) * 1000) div max(lang_toks) AS BIGINT)
        |         AS avg_df_x1000
        |FROM perdoc p JOIN perlang l ON p.lang = l.lang
        |GROUP BY p.lang ORDER BY p.lang""".stripMargin,
    "c54_fluency_score" ->
      """WITH t AS (SELECT lang, doc_id,
        |    filter(split(text, ' '), x -> x <> '') AS toks FROM documents),
        |t2 AS (SELECT lang, doc_id, toks FROM t WHERE size(toks) >= 2),
        |bg AS (SELECT lang, doc_id,
        |    explode(transform(sequence(1, size(toks) - 1),
        |           i -> array_join(slice(toks, i, 2), ' '))) AS bg
        |  FROM t2),
        |cbg AS (SELECT bg, CAST(count(*) AS BIGINT) AS c_bg FROM bg GROUP BY bg),
        |cw1 AS (SELECT element_at(split(bg, ' '), 1) AS w1, CAST(count(*) AS BIGINT) AS c_w1
        |        FROM bg GROUP BY 1),
        |perdoc AS (SELECT b.lang, b.doc_id, CAST(count(*) AS BIGINT) AS n_bg,
        |       CAST(sum((c_bg * 1000000) div c_w1) AS BIGINT) AS sum_p
        |  FROM bg b JOIN cbg USING (bg)
        |  JOIN cw1 ON element_at(split(b.bg, ' '), 1) = cw1.w1
        |  GROUP BY 1, 2),
        |sc AS (SELECT lang, doc_id, sum_p div n_bg AS score FROM perdoc)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(score) AS BIGINT) AS sum_score,
        |       CAST(min(score) AS BIGINT) AS min_score,
        |       CAST(max(score) AS BIGINT) AS max_score
        |FROM sc GROUP BY lang ORDER BY lang""".stripMargin,
    "c57_dup_ngram_fraction" ->
      """WITH t AS (SELECT doc_id, lang,
        |    filter(split(text, ' '), x -> x <> '') AS toks FROM documents),
        |t8 AS (SELECT doc_id, lang, toks FROM t WHERE size(toks) >= 8),
        |ng0 AS (SELECT doc_id, lang,
        |    explode(transform(sequence(1, size(toks) - 7),
        |           i -> array_join(slice(toks, i, 8), ' '))) AS g0
        |  FROM t8),
        |ng AS (SELECT DISTINCT doc_id, lang, xxhash64(g0) AS g FROM ng0),
        |dft AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM ng GROUP BY g),
        |perdoc AS (SELECT lang, doc_id, CAST(count(*) AS BIGINT) AS n_ng,
        |       CAST(count(*) FILTER (WHERE df >= 2) AS BIGINT) AS n_dup
        |  FROM ng JOIN dft USING (g) GROUP BY 1, 2)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_ng) AS BIGINT) AS sum_ngrams,
        |       CAST(sum(n_dup) AS BIGINT) AS sum_dup,
        |       CAST((CAST(sum(n_dup) AS DECIMAL(38,0)) * 1000) div sum(n_ng) AS BIGINT)
        |         AS dup_fraction_x1000,
        |       CAST(count(*) FILTER (WHERE n_dup * 2 >= n_ng) AS BIGINT) AS n_boilerplate_docs
        |FROM perdoc GROUP BY lang ORDER BY lang""".stripMargin,
    // c62: the TextRank loop runs a FIXED 4 rounds (CorpusRank.Rounds —
    // chosen precisely so the oracle could replay it as chained CTEs),
    // so the "iterative" part unrolls into four rank CTEs; truncation
    // points (per-edge DIV wt, then ×850 DIV 1000) mirror the
    // DataFrame twin's DECIMAL(38,0) arithmetic bit for bit.
    "c62_textrank_keywords" ->
      """WITH t AS (SELECT filter(split(text, ' '), x -> x <> '') AS tk FROM documents),
        |bg AS (SELECT element_at(tk, i) AS u, element_at(tk, i + 1) AS v
        |       FROM (SELECT tk, explode(sequence(1, size(tk) - 1)) AS i
        |             FROM t WHERE size(tk) >= 2)),
        |bi AS (SELECT u, v, CAST(count(*) AS BIGINT) AS c
        |       FROM bg WHERE u <> v GROUP BY 1, 2),
        |e AS (SELECT u, v, CAST(sum(c) AS BIGINT) AS w FROM (
        |        SELECT u, v, c FROM bi
        |        UNION ALL SELECT v AS u, u AS v, c FROM bi)
        |      GROUP BY u, v),
        |wo AS (SELECT u, CAST(sum(w) AS BIGINT) AS wt,
        |              CAST(count(*) AS BIGINT) AS degree
        |       FROM e GROUP BY u),
        |r0 AS (SELECT u AS tok, CAST(1000000 AS BIGINT) AS r FROM wo),
        |r1 AS (SELECT e.v AS tok,
        |         CAST((850 * sum(CAST((CAST(r.r AS DECIMAL(38,0)) * e.w) DIV wo.wt
        |                              AS DECIMAL(38,0)))) DIV 1000 + 150000 AS BIGINT) AS r
        |       FROM e JOIN wo ON e.u = wo.u JOIN r0 r ON r.tok = e.u
        |       GROUP BY e.v),
        |r2 AS (SELECT e.v AS tok,
        |         CAST((850 * sum(CAST((CAST(r.r AS DECIMAL(38,0)) * e.w) DIV wo.wt
        |                              AS DECIMAL(38,0)))) DIV 1000 + 150000 AS BIGINT) AS r
        |       FROM e JOIN wo ON e.u = wo.u JOIN r1 r ON r.tok = e.u
        |       GROUP BY e.v),
        |r3 AS (SELECT e.v AS tok,
        |         CAST((850 * sum(CAST((CAST(r.r AS DECIMAL(38,0)) * e.w) DIV wo.wt
        |                              AS DECIMAL(38,0)))) DIV 1000 + 150000 AS BIGINT) AS r
        |       FROM e JOIN wo ON e.u = wo.u JOIN r2 r ON r.tok = e.u
        |       GROUP BY e.v),
        |r4 AS (SELECT e.v AS tok,
        |         CAST((850 * sum(CAST((CAST(r.r AS DECIMAL(38,0)) * e.w) DIV wo.wt
        |                              AS DECIMAL(38,0)))) DIV 1000 + 150000 AS BIGINT) AS r
        |       FROM e JOIN wo ON e.u = wo.u JOIN r3 r ON r.tok = e.u
        |       GROUP BY e.v)
        |SELECT r4.tok, wo.degree, wo.wt AS w_out, r4.r AS rank_x1m
        |FROM r4 JOIN wo ON wo.u = r4.tok
        |ORDER BY rank_x1m DESC, tok LIMIT 30""".stripMargin,
    "c67_triangle_tokens" ->
      """WITH t AS (SELECT filter(split(text, ' '), x -> x <> '') AS tk
        |           FROM documents),
        |bg0 AS (SELECT explode(transform(sequence(1, size(tk) - 1),
        |    i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))) AS bigram
        |  FROM t WHERE size(tk) >= 2),
        |bi AS (SELECT element_at(split(bigram, ' '), 1) AS u,
        |              element_at(split(bigram, ' '), 2) AS v, count(*) AS c
        |       FROM bg0
        |       WHERE element_at(split(bigram, ' '), 1) <> element_at(split(bigram, ' '), 2)
        |       GROUP BY 1, 2),
        |e AS (SELECT least(u, v) AS u, greatest(u, v) AS v
        |      FROM bi GROUP BY 1, 2 HAVING sum(c) >= 5),
        |deg AS (SELECT t, count(*) AS deg
        |        FROM (SELECT u AS t FROM e UNION ALL SELECT v FROM e) GROUP BY t),
        |o AS (SELECT CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
        |                  THEN e.u ELSE e.v END AS a,
        |             CASE WHEN (du.deg < dv.deg) OR (du.deg = dv.deg AND e.u < e.v)
        |                  THEN e.v ELSE e.u END AS b
        |      FROM e JOIN deg du ON du.t = e.u JOIN deg dv ON dv.t = e.v),
        |wdg AS (SELECT o1.a, o1.b, o2.b AS c
        |        FROM o o1 JOIN o o2 ON o1.a = o2.a AND o1.b < o2.b),
        |tri AS (SELECT w.a, w.b, w.c FROM wdg w
        |        JOIN e ON e.u = w.b AND e.v = w.c),
        |x AS (SELECT explode(array(a, b, c)) AS tok FROM tri)
        |SELECT tok, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM x GROUP BY tok ORDER BY n_triangles DESC, tok LIMIT 10""".stripMargin,
    "c63_tombstone_purge" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS h FROM documents),
        |th AS (SELECT DISTINCT h FROM d WHERE doc_id % 97 = 0),
        |b AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_requests
        |      FROM d GROUP BY source),
        |p AS (SELECT source, CAST(count(*) AS BIGINT) AS n_purged
        |      FROM d WHERE h IN (SELECT h FROM th) GROUP BY source)
        |SELECT b.source, b.n_docs, b.n_requests,
        |       coalesce(p.n_purged, 0) AS n_purged,
        |       b.n_docs - coalesce(p.n_purged, 0) AS n_kept
        |FROM b LEFT JOIN p ON b.source = p.source ORDER BY b.source""".stripMargin,
    "c64_temperature_mix" ->
      """WITH d AS (SELECT lang,
        |    CAST(size(filter(split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |l AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |        CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE))) AS BIGINT) AS w
        |      FROM d GROUP BY lang),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
        |             CAST(sum(w) AS BIGINT) AS tot_w FROM l),
        |sel AS (SELECT lang, n_docs, n_tokens,
        |         CAST((CAST(n_tokens AS DECIMAL(38,0)) * 1000000) div tot_tokens AS BIGINT)
        |           AS prop_x1m,
        |         CAST((CAST(w AS DECIMAL(38,0)) * 1000000) div tot_w AS BIGINT) AS p_x1m
        |        FROM l CROSS JOIN t)
        |SELECT lang, n_docs, n_tokens, prop_x1m, p_x1m,
        |       CAST((CAST(p_x1m AS DECIMAL(38,0)) * 1000) div greatest(prop_x1m, 1) AS BIGINT)
        |         AS boost_x1000
        |FROM sel ORDER BY lang""".stripMargin,
    "c69_ks_drift" ->
      """WITH d AS (SELECT source, CAST(n_chars div 16 AS BIGINT) AS bkt FROM documents),
        |c AS (SELECT source, bkt, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1, 2),
        |grid AS (SELECT s.source, b.bkt FROM (SELECT DISTINCT source FROM d) s
        |         CROSS JOIN (SELECT DISTINCT bkt FROM d) b),
        |cum AS (SELECT g.source, g.bkt,
        |        sum(coalesce(c.n, 0)) OVER (PARTITION BY g.source ORDER BY g.bkt
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
        |        FROM grid g LEFT JOIN c ON c.source = g.source AND c.bkt = g.bkt),
        |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS nt FROM d GROUP BY source),
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |             abs(CAST(a.cn AS DECIMAL(38,0)) * tb.nt - CAST(b.cn AS DECIMAL(38,0)) * ta.nt)
        |               AS dd,
        |             ta.nt AS n_a, tb.nt AS n_b
        |      FROM cum a JOIN cum b ON a.bkt = b.bkt AND a.source < b.source
        |      JOIN tot ta ON ta.source = a.source
        |      JOIN tot tb ON tb.source = b.source)
        |SELECT source_a, source_b, n_a, n_b,
        |       CAST((max(dd) * 1000000) div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)
        |         AS ks_x1e6
        |FROM p GROUP BY source_a, source_b, n_a, n_b
        |ORDER BY source_a, source_b""".stripMargin,
    "c43_dataset_split" ->
      """WITH g AS (SELECT lang, doc_id,
        |    CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
        |    CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS BIGINT) AS gate
        |  FROM documents),
        |s AS (SELECT lang, doc_id, n_tokens,
        |        CASE WHEN gate < 205 THEN 'train'
        |             WHEN gate < 230 THEN 'val' ELSE 'test' END AS split
        |      FROM g)
        |SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM s GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    "c22_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, lang, count(*) AS tot, count(DISTINCT tok) AS dis
        |  FROM (SELECT doc_id, lang, explode(split(text, ' ')) AS tok
        |        FROM documents)
        |  WHERE tok <> '' GROUP BY doc_id, lang)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(*) FILTER (WHERE (tot - dis) * 100 >= tot * 50) AS BIGINT) AS n_repetitive,
        |       CAST(sum(tot) AS BIGINT) AS sum_tokens,
        |       CAST(sum(dis) AS BIGINT) AS sum_distinct
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "c55_containment" ->
      """WITH t AS (SELECT doc_id,
        |    filter(split(text, ' '), x -> x <> '') AS toks FROM documents),
        |t4 AS (SELECT doc_id, toks FROM t WHERE size(toks) >= 4),
        |shing AS (SELECT doc_id,
        |    explode(transform(sequence(1, size(toks) - 3),
        |           i -> array_join(slice(toks, i, 4), ' '))) AS g0
        |  FROM t4),
        |shd AS (SELECT DISTINCT doc_id, xxhash64(g0) AS sh FROM shing),
        |kept AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM shd GROUP BY sh)
        |         WHERE df <= 256),
        |s2 AS (SELECT shd.doc_id, shd.sh FROM shd JOIN kept USING (sh)),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM s2 GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS inter
        |          FROM s2 a JOIN s2 b ON a.sh = b.sh AND a.doc_id <> b.doc_id
        |          GROUP BY 1, 2)
        |SELECT da, db, inter, sz AS size_a,
        |       CAST((inter * 1000) div sz AS BIGINT) AS containment_x1000
        |FROM pairs JOIN sizes ON pairs.da = sizes.doc_id
        |WHERE inter * 1000 >= 800 * sz
        |ORDER BY containment_x1000 DESC, da, db LIMIT 50""".stripMargin,
    "c59_bpe_pairs" ->
      """WITH v AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT explode(split(text, ' ')) AS tok FROM documents)
        |  WHERE tok <> '' GROUP BY tok),
        |p AS (SELECT tok, n, explode(sequence(1, length(tok) - 1)) AS i
        |      FROM v WHERE length(tok) >= 2),
        |q AS (SELECT substring(tok, CAST(i AS INT), 2) AS pair, tok, n FROM p)
        |SELECT pair, CAST(sum(n) AS BIGINT) AS n_occ,
        |       CAST(count(DISTINCT tok) AS BIGINT) AS n_types
        |FROM q GROUP BY pair ORDER BY n_occ DESC, pair LIMIT 30""".stripMargin,
    // Same engine-private HLL++ estimate as the DataFrame path (same
    // engine, same rsd → same sketch), so within_band agrees too.
    "c24_sketch_distinct" ->
      """WITH d AS (SELECT DISTINCT source, md5(CAST(text AS BINARY)) AS h FROM documents),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact,
        |             approx_count_distinct(h, 0.02) AS n_approx
        |      FROM d GROUP BY source)
        |SELECT source, n_exact,
        |       abs(n_approx - n_exact) * 20 <= n_exact AS within_band
        |FROM a ORDER BY source""".stripMargin,
    // kernel-riding: the registered qdigest_quantiles aggregate; the
    // band arithmetic mirrors the DataFrame twin exactly (rank
    // intervals widened by the deterministic bits·⌊n/k⌋+1 bound). The
    // text replays exact ranks through a counts-table cum window where
    // the DataFrame twin rides its value-bucket histogram + slice
    // probe (its localCheckpoint plumbing has no SQL spelling) —
    // different digest merge orders, possibly different estimates, but
    // the OUTPUT columns (n, exact percentiles, in-band boolean) are
    // estimate-independent by the band contract, so row-identity still
    // holds.
    "c70_quantile_sketch" ->
      """WITH vals AS (SELECT l_returnflag AS flag,
        |                     CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |              FROM lineitem),
        |est AS (SELECT flag, CAST(count(*) AS BIGINT) AS n,
        |               qdigest_quantiles(v, 24, 2048, 500, 900) AS e
        |        FROM vals GROUP BY flag),
        |e2 AS (SELECT flag, n, e[0] AS e50, e[1] AS e90 FROM est),
        |cum AS (SELECT flag, v, sum(c) OVER (PARTITION BY flag ORDER BY v) AS cum
        |        FROM (SELECT flag, v, count(*) AS c FROM vals GROUP BY flag, v)),
        |g AS (SELECT c.flag, n, e50, e90,
        |             min(CASE WHEN cum >= (500 * n + 999) DIV 1000 THEN v END) AS exact_p50,
        |             min(CASE WHEN cum >= (900 * n + 999) DIV 1000 THEN v END) AS exact_p90,
        |             coalesce(max(CASE WHEN v <= e50 THEN cum END), CAST(0 AS BIGINT)) AS h50,
        |             coalesce(max(CASE WHEN v <  e50 THEN cum END), CAST(0 AS BIGINT)) + 1 AS l50,
        |             coalesce(max(CASE WHEN v <= e90 THEN cum END), CAST(0 AS BIGINT)) AS h90,
        |             coalesce(max(CASE WHEN v <  e90 THEN cum END), CAST(0 AS BIGINT)) + 1 AS l90
        |      FROM cum c JOIN e2 ON c.flag = e2.flag
        |      GROUP BY c.flag, n, e50, e90)
        |SELECT flag, n, exact_p50, exact_p90,
        |       ((500 * n + 999) DIV 1000 >= l50 - (24 * (n DIV 2048) + 1) AND
        |        (500 * n + 999) DIV 1000 <= h50 + (24 * (n DIV 2048) + 1) AND
        |        (900 * n + 999) DIV 1000 >= l90 - (24 * (n DIV 2048) + 1) AND
        |        (900 * n + 999) DIV 1000 <= h90 + (24 * (n DIV 2048) + 1)) AS sketch_within_band
        |FROM g ORDER BY flag""".stripMargin,
    // the c70 band arithmetic with the registered WEIGHTED digest
    // spelling; output columns estimate-independent by the band
    // contract, so row-identity holds across merge orders
    "c73_weighted_quantiles" ->
      """WITH d AS (SELECT lang,
        |      CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT) AS v
        |    FROM documents WHERE lang IS NOT NULL),
        |hist AS (SELECT lang, v, CAST(v * count(*) AS BIGINT) AS w FROM d
        |         GROUP BY lang, v HAVING v * count(*) > 0),
        |est AS (SELECT lang, CAST(sum(w) AS BIGINT) AS tw,
        |               qdigest_quantiles_weighted(v, w, 16, 1024, 500, 900) AS e
        |        FROM hist GROUP BY lang),
        |e2 AS (SELECT lang, tw, e[0] AS e50, e[1] AS e90 FROM est),
        |cum AS (SELECT lang, v, sum(w) OVER (PARTITION BY lang ORDER BY v) AS cum FROM hist),
        |g AS (SELECT c.lang, tw, e50, e90,
        |             min(CASE WHEN cum >= (500 * tw + 999) DIV 1000 THEN v END) AS wp50_tokens,
        |             min(CASE WHEN cum >= (900 * tw + 999) DIV 1000 THEN v END) AS wp90_tokens,
        |             coalesce(max(CASE WHEN v <= e50 THEN cum END), CAST(0 AS BIGINT)) AS h50,
        |             coalesce(max(CASE WHEN v <  e50 THEN cum END), CAST(0 AS BIGINT)) + 1 AS l50,
        |             coalesce(max(CASE WHEN v <= e90 THEN cum END), CAST(0 AS BIGINT)) AS h90,
        |             coalesce(max(CASE WHEN v <  e90 THEN cum END), CAST(0 AS BIGINT)) + 1 AS l90
        |      FROM cum c JOIN e2 ON c.lang = e2.lang
        |      GROUP BY c.lang, tw, e50, e90)
        |SELECT lang, tw AS total_tokens, wp50_tokens, wp90_tokens,
        |       ((500 * tw + 999) DIV 1000 >= l50 - (16 * (tw DIV 1024) + 1) AND
        |        (500 * tw + 999) DIV 1000 <= h50 + (16 * (tw DIV 1024) + 1) AND
        |        (900 * tw + 999) DIV 1000 >= l90 - (16 * (tw DIV 1024) + 1) AND
        |        (900 * tw + 999) DIV 1000 <= h90 + (16 * (tw DIV 1024) + 1)) AS sketch_within_band
        |FROM g ORDER BY lang""".stripMargin,
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
    "d1_props_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(sum(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS DOUBLE)
        |         / count(*) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // date_format with 'SSSSSS' is the Spark spelling of DuckDB's
    // strftime %f (6-digit microseconds).
    "d4_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, ts FROM events WHERE user_id % 10 = 0),
        |flagged AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR unix_micros(ts) - unix_micros(lag(ts) OVER w) > 30*60*1000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessioned AS (
        |  SELECT user_id, ts,
        |         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
        |       date_format(min(ts), 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS session_start,
        |       date_format(max(ts), 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS session_end
        |FROM sessioned GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "d7_edit_distance" ->
      s"""WITH p AS (
        |  SELECT lang, doc_id, substr(text, 1, 40) AS prefix
        |  FROM documents WHERE doc_id % 10 = 0),
        |tk AS (
        |  SELECT lang, doc_id, explode(slice(split(prefix, ' '), 1, 3)) AS tok
        |  FROM p),
        |tkf0 AS (SELECT lang, doc_id, tok FROM tk WHERE tok <> ''),
        |blockdf AS (SELECT lang, tok FROM tkf0 GROUP BY lang, tok
        |            HAVING count(*) <= ${graft.queries.Relational.D7_DF_CAP}),
        |tkf AS (SELECT t.lang, t.doc_id, t.tok
        |        FROM tkf0 t JOIN blockdf b ON t.lang = b.lang AND t.tok = b.tok),
        |cand AS (
        |  SELECT DISTINCT a.lang, a.doc_id AS da, b.doc_id AS db
        |  FROM tkf a JOIN tkf b ON a.lang = b.lang AND a.tok = b.tok AND a.doc_id < b.doc_id)
        |SELECT c.lang, c.da, c.db,
        |       CAST(levenshtein(pa.prefix, pb.prefix) AS BIGINT) AS dist
        |FROM cand c JOIN p pa ON pa.doc_id = c.da
        |            JOIN p pb ON pb.doc_id = c.db
        |WHERE levenshtein(pa.prefix, pb.prefix) <= 26
        |ORDER BY dist, da, db LIMIT 30""".stripMargin,
    // percentile(col, p) is Spark's exact interpolated percentile —
    // the same linear-interpolation definition as DuckDB's
    // quantile_cont.
    "d8_percentiles" ->
      """SELECT event_type,
        |       percentile(value, 0.5) AS p50,
        |       percentile(value, 0.95) AS p95,
        |       percentile(value, 0.99) AS p99,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "d9_latest_event" ->
      """WITH r AS (
        |  SELECT user_id, event_type, event_id, ts, value,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE user_id % 100 = 0)
        |SELECT user_id, event_type, event_id,
        |       date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts_s, value
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,
    "d11_interval_join" ->
      """WITH p AS (SELECT event_id, ts FROM events WHERE event_type = 'purchase'),
        |e AS (SELECT ts FROM events WHERE event_type = 'error')
        |SELECT p.event_id, CAST(count(*) AS BIGINT) AS n_errors,
        |       CAST(unix_micros(min(e.ts)) AS BIGINT) AS first_error_us
        |FROM p JOIN e ON e.ts >= p.ts AND e.ts < p.ts + INTERVAL 30 MINUTE
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    "d14_moving_avg" ->
      """WITH base AS (
        |  SELECT user_id, event_id, ts,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |  FROM events WHERE user_id % 100 = 0),
        |framed AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(sum(vc) OVER w AS BIGINT) AS mov_sum_c,
        |    CAST(count(*) OVER w AS BIGINT) AS mov_n
        |  FROM base
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id,
        |       date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts_s,
        |       CAST(mov_sum_c AS DOUBLE) / 100.0 AS mov_sum,
        |       CAST(mov_sum_c AS DOUBLE) / 100.0 / mov_n AS mov_avg
        |FROM framed ORDER BY user_id, ts_s, event_id""".stripMargin,
    "d15_correlation" ->
      """WITH base AS (
        |  SELECT event_type,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        |         CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS y
        |  FROM events),
        |sums AS (
        |  SELECT event_type,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(CAST(sum(x) AS BIGINT) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(x * y) AS BIGINT) AS DOUBLE) AS sxy,
        |    CAST(CAST(sum(x * x) AS BIGINT) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(y * y) AS BIGINT) AS DOUBLE) AS syy
        |  FROM base GROUP BY event_type)
        |SELECT event_type, CAST(n AS BIGINT) AS n_events,
        |       (n * sxy - sx * sy) /
        |         (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS pearson_r
        |FROM sums ORDER BY event_type""".stripMargin,
    // Same rows as the native TopKPerKey operator the DataFrame path
    // plans — the SQL spelling takes the window route instead.
    "d16_topk_native" ->
      """SELECT event_type, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value DESC, event_id) AS rn
        |  FROM events)
        |WHERE rn <= 5
        |ORDER BY event_type, value DESC, event_id""".stripMargin,
    "d19_trailing_1h" ->
      """WITH base AS (
        |  SELECT user_id, event_id, unix_micros(ts) AS ts_us,
        |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
        |  FROM events WHERE user_id % 100 = 0)
        |SELECT user_id, event_id, ts_us,
        |       CAST(sum(vc) OVER w AS DOUBLE) / 100.0 AS trail_sum,
        |       CAST(count(*) OVER w AS BIGINT) AS trail_n
        |FROM base
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin,
    "d21_merge_apply" ->
      """WITH m AS (SELECT doc_id, lang, n_chars, doc_id % 10 AS md FROM documents),
        |ch AS (SELECT CASE WHEN md = 2 THEN doc_id + 1000000000 ELSE doc_id END AS key,
        |         CASE WHEN md = 0 THEN 'D' WHEN md = 1 THEN 'U' ELSE 'I' END AS op,
        |         lang, CASE WHEN md = 1 THEN n_chars + 7 ELSE n_chars END AS new_chars
        |       FROM m WHERE md <= 2),
        |upserts AS (SELECT s.doc_id, s.lang,
        |         coalesce(c.new_chars, s.n_chars) AS chars,
        |         CASE WHEN c.op = 'U' THEN 'updated' ELSE 'kept' END AS origin
        |       FROM documents s
        |       LEFT JOIN (SELECT * FROM ch WHERE op <> 'I') c ON s.doc_id = c.key
        |       WHERE c.op IS NULL OR c.op <> 'D'),
        |merged AS (SELECT * FROM upserts UNION ALL
        |           SELECT key AS doc_id, lang, new_chars AS chars, 'inserted' AS origin
        |           FROM ch WHERE op = 'I')
        |SELECT lang, origin, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(chars) AS BIGINT) AS sum_chars,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM merged GROUP BY lang, origin ORDER BY lang, origin""".stripMargin,
    "d22_table_profile" ->
      """WITH u AS (
        |  SELECT 'l_orderkey' AS col_name, CAST(l_orderkey AS DOUBLE) AS v FROM lineitem
        |  UNION ALL SELECT 'l_partkey', CAST(l_partkey AS DOUBLE) FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS DOUBLE) FROM lineitem
        |  UNION ALL SELECT 'l_linenumber', CAST(l_linenumber AS DOUBLE) FROM lineitem
        |  UNION ALL SELECT 'l_quantity', CAST(l_quantity AS DOUBLE) FROM lineitem)
        |SELECT col_name, CAST(count(v) AS BIGINT) AS n,
        |       CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
        |       min(v) AS vmin, max(v) AS vmax
        |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin,
    "d29_ref_integrity" ->
      s"SELECT * FROM (\n${graft.queries.Relational.refEdgeSql}\n) ORDER BY relation",
    "d30_scd2" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, ts,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type
        |  FROM events),
        |ch AS (SELECT user_id, event_id, event_type, ts FROM ev
        |       WHERE prev_type IS NULL OR prev_type <> event_type),
        |v AS (SELECT event_type, unix_micros(ts) AS vf,
        |        lead(unix_micros(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |          AS vt
        |      FROM ch)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_versions,
        |       CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |       CAST(coalesce(sum((vt - vf) div 1000000), 0) AS BIGINT) AS closed_s
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin,
    // explode(sequence(...)) is the Spark spelling of DuckDB's
    // unnest(generate_series(...)).
    "d31_date_spine" ->
      """WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
        |s AS (SELECT explode(sequence(d0, d1, INTERVAL 1 DAY)) AS day FROM b),
        |t AS (SELECT DISTINCT event_type FROM e),
        |d AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2)
        |SELECT t.event_type, date_format(s.day, 'yyyy-MM-dd') AS day,
        |       coalesce(d.n, CAST(0 AS BIGINT)) AS n_events
        |FROM s CROSS JOIN t LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day
        |ORDER BY t.event_type, date_format(s.day, 'yyyy-MM-dd')""".stripMargin,
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
    "d32_ols_trend" ->
      """WITH monthly AS (
        |  SELECT n.n_name,
        |         CAST((year(o.o_orderdate) - 1995) * 12
        |           + month(o.o_orderdate) - 1 AS BIGINT) AS x,
        |         sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT)) AS y
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY n.n_name, x),
        |sums AS (
        |  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
        |         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |         sum(x * x) AS sxx
        |  FROM monthly GROUP BY n_name),
        |nd AS (
        |  SELECT n_name, n AS n_months,
        |         n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
        |  FROM sums)
        |SELECT n_name, n_months,
        |       CAST(num AS DOUBLE) / CAST(nullif(den, CAST(0 AS BIGINT)) AS DOUBLE)
        |         AS slope_cents_per_month,
        |       CASE WHEN num > 0 THEN 'up' WHEN num < 0 THEN 'down'
        |            ELSE 'flat' END AS trend
        |FROM nd ORDER BY n_name""".stripMargin,
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
        |ORDER BY gid, orderstatus, orderpriority""".stripMargin,
    // ---- kernel-riding c-family: texts over the registered native SQL
    // functions (simhash64 / minhash_bands / token_ngrams /
    // long_array_dot / count_min_sketch_exactable), mirroring the
    // DataFrame twins expression-for-expression.
    "c2_simhash_buckets" ->
      """WITH fp AS (SELECT doc_id, simhash64(text) AS simhash FROM documents)
        |SELECT simhash, CAST(count(*) AS BIGINT) AS n_docs,
        |       concat_ws(',', sort_array(collect_list(CAST(doc_id AS STRING)))) AS doc_ids
        |FROM fp WHERE simhash IS NOT NULL
        |GROUP BY simhash HAVING count(*) > 1 ORDER BY simhash""".stripMargin,
    "c14_simhash_neardup" ->
      s"""WITH fp AS (SELECT doc_id, sh FROM (
         |       SELECT doc_id, simhash64(text) AS sh FROM documents)
         |     WHERE sh IS NOT NULL),
         |banded AS (SELECT doc_id, $simhashBandStack FROM fp),
         |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
         |         FROM banded a JOIN banded b
         |           ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT da, db, hamming FROM (
         |  SELECT c.da, c.db, CAST(bit_count(fa.sh ^ fb.sh) AS BIGINT) AS hamming
         |  FROM cand c JOIN fp fa ON c.da = fa.doc_id JOIN fp fb ON c.db = fb.doc_id)
         |WHERE hamming <= 3 ORDER BY hamming, da, db""".stripMargin,
    "c1_minhash_lsh" ->
      """WITH banded AS (
        |  SELECT doc_id, posexplode(minhash_bands(text)) AS (band_id, bv)
        |  FROM documents WHERE doc_id % 5 = 0),
        |cand AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS shared_bands
        |  FROM banded a JOIN banded b
        |    ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |t AS (SELECT doc_id, toks, CAST(size(toks) AS BIGINT) AS sz FROM (
        |  SELECT doc_id, array_remove(array_distinct(split(text, ' ')), '') AS toks
        |  FROM documents WHERE doc_id % 5 = 0))
        |SELECT da, db, shared_bands,
        |       CAST(inter AS DOUBLE) / (sa + sb - inter) AS jaccard
        |FROM (
        |  SELECT c.da, c.db, c.shared_bands, ta.sz AS sa, tb.sz AS sb,
        |         CAST(size(array_intersect(ta.toks, tb.toks)) AS BIGINT) AS inter
        |  FROM cand c JOIN t ta ON c.da = ta.doc_id JOIN t tb ON c.db = tb.doc_id)
        |ORDER BY jaccard DESC, da, db LIMIT 50""".stripMargin,
    "c3_shingle_jaccard" ->
      """WITH sh0 AS (
        |  SELECT DISTINCT doc_id, substring(text, i, 3) AS sh
        |  FROM (SELECT doc_id, text, explode(sequence(1, least(length(text) - 2, 2047))) AS i
        |        FROM documents WHERE doc_id % 25 = 0 AND length(text) >= 3)),
        |kept AS (SELECT sh FROM sh0 GROUP BY sh HAVING count(*) <= 256),
        |s AS (SELECT sh0.doc_id, sh0.sh FROM sh0 JOIN kept ON sh0.sh = kept.sh),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM s GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS i
        |  FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT da, db, CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
        |FROM inter JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
        |ORDER BY jaccard DESC, da, db LIMIT 20""".stripMargin,
    "c10_fingerprint" ->
      """WITH fp AS (
        |  SELECT doc_id, min(md5(CAST(sh AS BINARY))) AS fingerprint
        |  FROM (SELECT doc_id, explode(token_ngrams(text, 4)) AS sh FROM documents)
        |  GROUP BY doc_id)
        |SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_docs,
        |       concat_ws(',', sort_array(collect_list(CAST(doc_id AS STRING)))) AS doc_ids
        |FROM fp GROUP BY fingerprint HAVING count(*) > 1 ORDER BY fingerprint""".stripMargin,
    "c39_label_centroids" ->
      s"""WITH e AS (
         |  SELECT CAST(label AS BIGINT) AS label, posexplode($scaledEmb) AS (pos, sv)
         |  FROM embeddings)
         |SELECT label, CAST(pos + 1 AS BIGINT) AS i, CAST(count(*) AS BIGINT) AS n_vecs,
         |       sum(sv) AS sum_sv,
         |       CAST(CAST(CAST(sum(sv) AS DOUBLE) / count(*) AS DECIMAL(16,0)) AS BIGINT) AS cv
         |FROM e GROUP BY label, pos ORDER BY label, i""".stripMargin,
    "c40_outlier_filter" ->
      """WITH d AS (SELECT lang,
        |             CAST(size(filter(split(text, ' '), x -> x <> '')) AS DOUBLE) AS nt
        |           FROM documents),
        |q AS (SELECT lang, percentile(nt, 0.25) AS q1, percentile(nt, 0.75) AS q3
        |      FROM d GROUP BY lang),
        |f AS (SELECT lang, q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM q)
        |SELECT /*+ BROADCAST(f) */ d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN nt < lo OR nt > hi THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_outliers,
        |       coalesce(sum(CASE WHEN NOT (nt < lo OR nt > hi)
        |                         THEN CAST(nt AS BIGINT) END), CAST(0 AS BIGINT))
        |         AS kept_tokens,
        |       min(lo) AS lo, min(hi) AS hi
        |FROM d JOIN f ON d.lang = f.lang
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "c61_embedding_drift" ->
      s"""WITH ca AS (
         |  SELECT label, pos, CAST(count(*) AS BIGINT) AS n,
         |         CAST(CAST(CAST(sum(sv) AS DOUBLE) / count(*) AS DECIMAL(16,0)) AS BIGINT) AS cv
         |  FROM (SELECT CAST(label AS BIGINT) AS label, posexplode($scaledEmb) AS (pos, sv)
         |        FROM embeddings WHERE vec_id % 2 = 0)
         |  GROUP BY label, pos),
         |cb AS (
         |  SELECT label, pos, CAST(count(*) AS BIGINT) AS n,
         |         CAST(CAST(CAST(sum(sv) AS DOUBLE) / count(*) AS DECIMAL(16,0)) AS BIGINT) AS cv
         |  FROM (SELECT CAST(label AS BIGINT) AS label, posexplode($scaledEmb) AS (pos, sv)
         |        FROM embeddings WHERE vec_id % 2 = 1)
         |  GROUP BY label, pos)
         |SELECT ca.label, max(ca.n) AS n_vecs_a, max(cb.n) AS n_vecs_b,
         |       sum(abs(ca.cv - cb.cv)) AS l1_x10000
         |FROM ca JOIN cb ON ca.label = cb.label AND ca.pos = cb.pos
         |GROUP BY ca.label ORDER BY ca.label""".stripMargin,
    "c5_ann_brute" ->
      s"""WITH b AS (SELECT vec_id, ie, ${normSql("ie")} AS nv FROM (
         |       SELECT vec_id, $scaledEmb AS ie FROM embeddings)),
         |q AS (SELECT vec_id AS qid, ie AS qe, nv AS qn FROM b WHERE vec_id % 100 = 0),
         |cs AS (
         |  SELECT /*+ BROADCAST(q) */ q.qid, b.vec_id,
         |         ${dotSql("b.ie", "q.qe")} / (q.qn * b.nv) AS cos
         |  FROM b CROSS JOIN q WHERE q.qid <> b.vec_id)
         |SELECT qid, vec_id, cos, rn FROM (
         |  SELECT qid, vec_id, cos,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id)
         |              AS BIGINT) AS rn
         |  FROM cs)
         |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    "c6_ann_lsh" ->
      s"""WITH b AS (SELECT vec_id, bucket, ie, ${normSql("ie")} AS nv FROM (
         |       SELECT vec_id,
         |              concat(${(1 to 4).map(d =>
                  s"IF(element_at(embedding, $d) >= 0, '1', '0')").mkString(", ")}) AS bucket,
         |              $scaledEmb AS ie
         |       FROM embeddings)),
         |q AS (SELECT vec_id AS qid, bucket, ie AS qe, nv AS qn FROM b
         |      WHERE vec_id % 20 = 0),
         |cs AS (
         |  SELECT /*+ BROADCAST(q) */ q.qid, b.vec_id,
         |         ${dotSql("b.ie", "q.qe")} / (q.qn * b.nv) AS cos
         |  FROM b JOIN q ON b.bucket = q.bucket WHERE q.qid <> b.vec_id)
         |SELECT qid, vec_id, cos, rn FROM (
         |  SELECT qid, vec_id, cos,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id)
         |              AS BIGINT) AS rn
         |  FROM cs)
         |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin,
    "c28_ann_quantized" ->
      s"""WITH base AS (
         |  SELECT vec_id, transform(embedding, x ->
         |           CAST(CAST(CAST(x AS DOUBLE) * 127 / scale AS DECIMAL(16,0)) AS BIGINT))
         |         AS ie
         |  FROM (SELECT vec_id, embedding,
         |               array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
         |        FROM embeddings)
         |  WHERE scale > 0),
         |b AS (SELECT vec_id, ie, ${normSql("ie")} AS nv FROM base),
         |q AS (SELECT vec_id AS qid, ie AS qe, nv AS qn FROM b WHERE vec_id % 100 = 0),
         |cs AS (
         |  SELECT /*+ BROADCAST(q) */ q.qid, b.vec_id,
         |         ${dotSql("b.ie", "q.qe")} / (q.qn * b.nv) AS qcos
         |  FROM b CROSS JOIN q WHERE q.qid <> b.vec_id)
         |SELECT qid, vec_id, qcos, rn FROM (
         |  SELECT qid, vec_id, qcos,
         |         CAST(row_number() OVER (PARTITION BY qid ORDER BY qcos DESC, vec_id)
         |              AS BIGINT) AS rn
         |  FROM cs)
         |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin,
    "c4_embed_neardup" ->
      s"""WITH bands AS (
         |  SELECT label, vec_id, band.band_id AS band_id, band.bv AS bv
         |  FROM (SELECT label, vec_id, explode(array($signBandStructs)) AS band
         |        FROM embeddings)),
         |cand AS (
         |  SELECT DISTINCT a.label, a.vec_id AS va, b.vec_id AS vb
         |  FROM bands a JOIN bands b
         |    ON a.label = b.label AND a.band_id = b.band_id AND a.bv = b.bv
         |   AND a.vec_id < b.vec_id),
         |b2 AS (SELECT vec_id, ie, ${normSql("ie")} AS nv FROM (
         |       SELECT vec_id, $scaledEmb AS ie FROM embeddings))
         |SELECT label, va, vb, cos FROM (
         |  SELECT c.label, c.va, c.vb,
         |         ${dotSql("ba.ie", "bb.ie")} / (ba.nv * bb.nv) AS cos
         |  FROM cand c JOIN b2 ba ON c.va = ba.vec_id JOIN b2 bb ON c.vb = bb.vec_id)
         |WHERE cos > 0.42 ORDER BY cos DESC, va, vb""".stripMargin,
    // The bloom prefilter is a PLAN-level runtime filter (bloom false
    // positives die in the inner join), so the text replays the plain
    // join — result-identical by construction, like the oracle.
    "c36_bloom_join" ->
      """WITH urgent AS (SELECT o_orderkey, o_orderdate FROM orders
        |                WHERE o_orderpriority = '1-URGENT'),
        |li AS (SELECT l_orderkey,
        |              CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |              * CAST(CAST(1 - l_discount AS DECIMAL(10,4)) * 10000 AS BIGINT) AS pd
        |       FROM lineitem)
        |SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
        |       CAST(count(*) AS BIGINT) AS n_items, sum(pd) AS revenue_micros
        |FROM li JOIN urgent ON l_orderkey = o_orderkey
        |GROUP BY CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
        |ORDER BY ym""".stripMargin,
    "c42_heavy_hitters" ->
      s"""WITH toks AS (SELECT explode(filter(split(text, ' '), x -> x <> '')) AS tok
         |              FROM documents),
         |cms AS (SELECT count_min_sketch_exactable(tok, 4, 1024) AS cms FROM toks),
         |probes AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_n FROM toks
         |           GROUP BY tok ORDER BY exact_n DESC, tok LIMIT 20)
         |SELECT tok, exact_n, est_n, est_n - exact_n AS overcount FROM (
         |  SELECT /*+ BROADCAST(c) */ p.tok, p.exact_n,
         |         least(${(0 until 4).map(d =>
                  s"element_at(c.cms, CAST(${d * 1024} + ${cmsBucket(d, "p.tok", 1024)} + 1 AS INT))")
                  .mkString(",\n         |               ")}) AS est_n
         |  FROM probes p CROSS JOIN cms c)
         |ORDER BY exact_n DESC, tok""".stripMargin,
    "c44_incremental_neardup" ->
      s"""WITH fp AS (SELECT doc_id, simhash64(text) AS sh FROM documents),
         |cfp AS (SELECT doc_id, sh FROM fp WHERE doc_id % 2 = 0 AND sh IS NOT NULL),
         |bfp AS (SELECT doc_id, sh FROM fp WHERE doc_id % 2 = 1 AND sh IS NOT NULL),
         |cb AS (SELECT doc_id, $simhashBandStack FROM cfp),
         |bb AS (SELECT doc_id, $simhashBandStack FROM bfp),
         |cand AS (SELECT DISTINCT b.doc_id AS da, c.doc_id AS db
         |         FROM bb b JOIN cb c ON b.band_id = c.band_id AND b.bv = c.bv),
         |pairs AS (SELECT c.da, c.db FROM cand c
         |          JOIN bfp ba ON c.da = ba.doc_id JOIN cfp ca ON c.db = ca.doc_id
         |          WHERE bit_count(ba.sh ^ ca.sh) <= 3),
         |flagged AS (SELECT da, CAST(count(*) AS BIGINT) AS n_matches
         |            FROM pairs GROUP BY da),
         |batch AS (SELECT doc_id AS da, lang FROM documents WHERE doc_id % 2 = 1)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_batch,
         |       CAST(sum(CASE WHEN n_matches IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_flagged,
         |       coalesce(sum(n_matches), CAST(0 AS BIGINT)) AS n_pairs
         |FROM batch LEFT JOIN flagged ON batch.da = flagged.da
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "c45_hll_distinct" ->
      s"""WITH h AS (SELECT lang AS g, md5(CAST(text AS BINARY)) AS h FROM documents
         |           WHERE lang IS NOT NULL AND text IS NOT NULL),
         |ranked AS (SELECT g,
         |             CAST(conv(substring(h, 1, 2), 16, 10) AS BIGINT) % ${graft.operators.HllDistinct.M} AS bucket,
         |             CAST(conv(substring(h, 3, 8), 16, 10) AS BIGINT) AS x FROM h),
         |regs0 AS (SELECT g, bucket,
         |            max(CASE WHEN x = 0 THEN 33 ELSE 33 - length(bin(x)) END) AS mj
         |          FROM ranked GROUP BY g, bucket),
         |frame AS (SELECT g, id AS bucket
         |          FROM (SELECT DISTINCT g FROM h) CROSS JOIN range(${graft.operators.HllDistinct.M})),
         |regs AS (SELECT f.g, f.bucket, coalesce(r.mj, 0) AS mj
         |         FROM frame f LEFT JOIN regs0 r ON f.g = r.g AND f.bucket = r.bucket),
         |agg AS (SELECT g, sum(shiftleft(CAST(1 AS BIGINT), CAST(33 - mj AS INT))) AS s,
         |               sum(CASE WHEN mj = 0 THEN CAST(1 AS BIGINT) ELSE 0 END) AS n_empty
         |        FROM regs GROUP BY g),
         |exact AS (SELECT g, count(DISTINCT h) AS n_exact FROM h GROUP BY g)
         |SELECT e.g AS lang, e.n_exact,
         |       (${graft.operators.HllDistinct.Num}L div s) div 1000000 AS n_est, a.n_empty
         |FROM exact e JOIN agg a ON e.g = a.g ORDER BY lang""".stripMargin,
    // c45's register pipeline keyed by source, then pairwise union =
    // element-wise register max and inclusion-exclusion readout.
    "c71_overlap_hll" ->
      s"""WITH h AS (SELECT DISTINCT source AS g, md5(CAST(text AS BINARY)) AS h
         |           FROM documents
         |           WHERE source IS NOT NULL AND text IS NOT NULL),
         |ranked AS (SELECT g,
         |             CAST(conv(substring(h, 1, 2), 16, 10) AS BIGINT) % ${graft.operators.HllDistinct.M} AS bucket,
         |             CAST(conv(substring(h, 3, 8), 16, 10) AS BIGINT) AS x FROM h),
         |regs0 AS (SELECT g, bucket,
         |            max(CASE WHEN x = 0 THEN 33 ELSE 33 - length(bin(x)) END) AS mj
         |          FROM ranked GROUP BY g, bucket),
         |frame AS (SELECT g, id AS bucket
         |          FROM (SELECT DISTINCT g FROM h) CROSS JOIN range(${graft.operators.HllDistinct.M})),
         |regs AS (SELECT f.g, f.bucket, coalesce(r.mj, 0) AS mj
         |         FROM frame f LEFT JOIN regs0 r ON f.g = r.g AND f.bucket = r.bucket),
         |per AS (SELECT g, (${graft.operators.HllDistinct.Num}L div
         |          sum(shiftleft(CAST(1 AS BIGINT), CAST(33 - mj AS INT)))) div 1000000 AS est
         |        FROM regs GROUP BY g),
         |eu AS (SELECT a.g AS source_a, b.g AS source_b,
         |         (${graft.operators.HllDistinct.Num}L div
         |           sum(shiftleft(CAST(1 AS BIGINT),
         |             CAST(33 - greatest(a.mj, b.mj) AS INT)))) div 1000000 AS est_union
         |       FROM regs a JOIN regs b ON a.bucket = b.bucket AND a.g < b.g
         |       GROUP BY a.g, b.g),
         |ex AS (SELECT a.g AS source_a, b.g AS source_b, count(*) AS n_exact_shared
         |       FROM h a JOIN h b ON a.h = b.h AND a.g < b.g GROUP BY a.g, b.g)
         |SELECT eu.source_a, eu.source_b, pa.est AS est_a, pb.est AS est_b,
         |       eu.est_union,
         |       greatest(pa.est + pb.est - eu.est_union, CAST(0 AS BIGINT)) AS est_shared,
         |       coalesce(ex.n_exact_shared, CAST(0 AS BIGINT)) AS n_exact_shared
         |FROM eu JOIN per pa ON pa.g = eu.source_a
         |        JOIN per pb ON pb.g = eu.source_b
         |        LEFT JOIN ex ON ex.source_a = eu.source_a AND ex.source_b = eu.source_b
         |ORDER BY eu.source_a, eu.source_b""".stripMargin,
    // the whole Bloom filter in SQL: conv/shiftleft/bit_or are the
    // Spark spellings of the oracle's digit-decode///<</bit_or
    "c72_membership_gate" ->
      """WITH dk AS (SELECT doc_id, lang,
        |        md5(CAST(array_join(slice(split(text, ' ', 5), 1, 4), ' ') AS BINARY)) AS k
        |      FROM documents WHERE text IS NOT NULL),
        |hx AS (SELECT doc_id, md5(CAST(k AS BINARY)) AS h FROM dk),
        |hh AS (SELECT doc_id,
        |         CAST(conv(substring(h, 1, 15), 16, 10) AS BIGINT) AS h1,
        |         CAST(conv(substring(h, 16, 15), 16, 10) AS BIGINT) | CAST(1 AS BIGINT) AS h2
        |       FROM hx),
        |pwm AS (SELECT doc_id, (h1 + j * h2) % 1048576 AS p
        |        FROM hh CROSS JOIN (SELECT explode(sequence(0, 4)) AS j)),
        |wm AS (SELECT doc_id, shiftright(p, 5) AS w,
        |              shiftleft(CAST(1 AS BIGINT), CAST(p & 31 AS INT)) AS m FROM pwm),
        |bits AS (SELECT w, bit_or(m) AS bits FROM wm
        |         WHERE doc_id % 97 <> 0 GROUP BY w),
        |probe AS (SELECT wm.doc_id,
        |            min(CASE WHEN b.bits IS NOT NULL AND (b.bits & wm.m) = wm.m
        |                     THEN 1 ELSE 0 END) AS hit
        |          FROM wm LEFT JOIN bits b ON wm.w = b.w
        |          WHERE wm.doc_id % 97 = 0 GROUP BY wm.doc_id),
        |tk AS (SELECT DISTINCT k FROM dk WHERE doc_id % 97 <> 0),
        |ev AS (SELECT d.doc_id, d.lang, p.hit,
        |              CASE WHEN tk.k IS NOT NULL THEN 1 ELSE 0 END AS ex
        |       FROM dk d JOIN probe p ON d.doc_id = p.doc_id
        |       LEFT JOIN tk ON d.k = tk.k
        |       WHERE d.doc_id % 97 = 0)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_eval,
        |       CAST(sum(hit) AS BIGINT) AS n_flagged,
        |       CAST(sum(ex) AS BIGINT) AS n_hits_exact,
        |       CAST(sum(CASE WHEN ex = 1 AND hit = 0 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_false_neg
        |FROM ev GROUP BY lang ORDER BY lang""".stripMargin,
    // The DataFrame twin's KMV sample rides the TopKPerKey bounded-heap
    // operator; the text spells the same top-k as a row_number window —
    // with GraftExtensions injected, RowNumberTopKRewrite plans this
    // back onto the heap operator.
    "c47_kmv_quantile" ->
      """WITH docs AS (SELECT lang, doc_id,
        |    CAST(size(filter(split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |wh AS (SELECT lang, doc_id, n_tokens,
        |              md5(CAST(CAST(doc_id AS STRING) AS BINARY)) AS kmv_h
        |       FROM docs WHERE doc_id IS NOT NULL),
        |samp AS (SELECT lang, doc_id, n_tokens FROM (
        |    SELECT lang, doc_id, n_tokens,
        |           row_number() OVER (PARTITION BY lang ORDER BY kmv_h, doc_id) AS krn
        |    FROM wh)
        |  WHERE krn <= 32),
        |sampMed AS (SELECT lang, n_tokens AS kmv_med, cnt AS n_sample FROM (
        |    SELECT lang, n_tokens, doc_id,
        |           row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
        |           count(*) OVER (PARTITION BY lang) AS cnt
        |    FROM samp)
        |  WHERE rn = (cnt + 1) div 2),
        |hist AS (SELECT lang, n_tokens, CAST(count(*) AS BIGINT) AS c
        |         FROM docs GROUP BY lang, n_tokens),
        |hc AS (SELECT lang, n_tokens,
        |              sum(c) OVER (PARTITION BY lang ORDER BY n_tokens) AS cum,
        |              sum(c) OVER (PARTITION BY lang) AS tot FROM hist),
        |exactMed AS (SELECT lang, min(n_tokens) AS exact_med, max(tot) AS n_docs
        |             FROM hc WHERE cum >= (tot + 1) div 2 GROUP BY lang)
        |SELECT e.lang, e.n_docs, s.n_sample, e.exact_med, s.kmv_med
        |FROM exactMed e JOIN sampMed s ON e.lang = s.lang ORDER BY e.lang""".stripMargin,
    "c51_ts_similar_users" ->
      """WITH qprof AS (
        |  SELECT user_id, (unix_micros(ts) div 900000000) % 96 AS qh,
        |         sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
        |  FROM events GROUP BY user_id, (unix_micros(ts) div 900000000) % 96),
        |prof AS (SELECT user_id, qh div 4 AS hour, sum(v) AS v
        |         FROM qprof GROUP BY user_id, qh div 4),
        |tot AS (SELECT user_id, sum(v) AS tot FROM qprof GROUP BY user_id),
        |sig AS (SELECT q.user_id,
        |          sum(CASE WHEN qh < 48 AND v * 96 > tot
        |              THEN shiftleft(CAST(1 AS BIGINT), CAST(qh AS INT))
        |              ELSE CAST(0 AS BIGINT) END) AS lo,
        |          sum(CASE WHEN qh >= 48 AND v * 96 > tot
        |              THEN shiftleft(CAST(1 AS BIGINT), CAST(qh - 48 AS INT))
        |              ELSE CAST(0 AS BIGINT) END) AS hi
        |        FROM qprof q JOIN tot t ON q.user_id = t.user_id GROUP BY q.user_id),
        |nu AS (SELECT count(*) AS n FROM sig),
        |banded AS (SELECT user_id, stack(8,
        |    0, lo & 4095, 1, (lo >> 12) & 4095, 2, (lo >> 24) & 4095, 3, (lo >> 36) & 4095,
        |    4, hi & 4095, 5, (hi >> 12) & 4095, 6, (hi >> 24) & 4095, 7, (hi >> 36) & 4095
        |  ) AS (band_id, bv) FROM sig),
        |bkept AS (SELECT banded.* FROM banded
        |          JOIN (SELECT band_id, bv FROM banded GROUP BY band_id, bv
        |                HAVING count(*) <= 256) ok USING (band_id, bv)),
        |pkey AS (SELECT user_id,
        |           array_join(array_sort(collect_list(concat(
        |             lpad(CAST(hour AS STRING), 2, '0'), ':', CAST(v AS STRING)))),
        |             ',') AS pk
        |         FROM prof GROUP BY user_id),
        |ranked AS (SELECT user_id, pk,
        |             row_number() OVER (PARTITION BY pk ORDER BY user_id) AS rn
        |           FROM pkey),
        |cand AS (SELECT a.user_id AS da, b.user_id AS db
        |         FROM sig a JOIN sig b ON a.user_id < b.user_id
        |         WHERE (SELECT n FROM nu) <= 1024
        |         UNION
        |         SELECT a.user_id AS da, b.user_id AS db
        |         FROM bkept a JOIN bkept b
        |           ON a.band_id = b.band_id AND a.bv = b.bv AND a.user_id < b.user_id
        |         WHERE (SELECT n FROM nu) > 1024
        |         UNION
        |         SELECT a.user_id AS da, b.user_id AS db
        |         FROM ranked a JOIN ranked b ON a.pk = b.pk AND b.rn = a.rn + 1
        |         WHERE (SELECT n FROM nu) > 1024),
        |contrib AS (
        |  SELECT c.da, c.db, p.hour, p.v AS x
        |  FROM cand c JOIN prof p ON c.da = p.user_id
        |  UNION ALL
        |  SELECT c.da, c.db, p.hour, -p.v AS x
        |  FROM cand c JOIN prof p ON c.db = p.user_id),
        |perHour AS (SELECT da, db, hour, sum(x) AS d FROM contrib GROUP BY da, db, hour)
        |SELECT da, db, sum(abs(d)) AS l1_cents FROM perHour GROUP BY da, db
        |ORDER BY l1_cents, da, db LIMIT 20""".stripMargin,
    "c60_minhash_calibration" ->
      s"""WITH banded AS (
         |  SELECT doc_id, posexplode(minhash_bands(text)) AS (band_id, bv)
         |  FROM documents WHERE doc_id % 5 = 0),
         |sigs AS (SELECT doc_id,
         |                max(CASE WHEN band_id = 0 THEN bv END) AS b0,
         |                max(CASE WHEN band_id = 1 THEN bv END) AS b1
         |         FROM banded GROUP BY doc_id),
         |cand AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db
         |  FROM banded a JOIN banded b
         |    ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id),
         |t AS (SELECT doc_id, toks, CAST(size(toks) AS BIGINT) AS sz FROM (
         |  SELECT doc_id, array_remove(array_distinct(split(text, ' ')), '') AS toks
         |  FROM documents WHERE doc_id % 5 = 0)),
         |pairs AS (
         |  SELECT c.da, c.db,
         |         CAST(size(array_intersect(ta.toks, tb.toks)) AS BIGINT) AS inter,
         |         ta.sz AS xa, tb.sz AS xb
         |  FROM cand c JOIN t ta ON c.da = ta.doc_id JOIN t tb ON c.db = tb.doc_id),
         |m AS (SELECT p.inter, (p.xa + p.xb - p.inter) AS uni,
         |             CAST(${(0 until 8).map { j =>
                  val (band, off) = (j / 4, 1 + 32 * (j % 4))
                  s"CASE WHEN substring(sa.b$band, $off, 32) = substring(sb.b$band, $off, 32) THEN 1 ELSE 0 END"
                }.mkString("\n         |                  + ")} AS BIGINT) AS n_match
         |      FROM pairs p JOIN sigs sa ON p.da = sa.doc_id
         |                   JOIN sigs sb ON p.db = sb.doc_id)
         |SELECT n_match, CAST(count(*) AS BIGINT) AS n_pairs,
         |       sum(inter) AS sum_inter, sum(uni) AS sum_union,
         |       CAST(CAST(sum(inter) AS DECIMAL(38,0)) * 1000 div sum(uni) AS BIGINT)
         |         AS jaccard_proxy_x1000
         |FROM m GROUP BY n_match ORDER BY n_match""".stripMargin,
    "c68_winnow_pairs" ->
      """WITH grams AS (
        |  SELECT doc_id, CAST(size(gs) AS BIGINT) AS ng, CAST(pos AS BIGINT) AS pos,
        |         md5(CAST(g AS BINARY)) AS h
        |  FROM (SELECT doc_id, gs, posexplode(gs) AS (pos, g)
        |        FROM (SELECT doc_id, token_ngrams(text, 4) AS gs FROM documents))),
        |wm AS (SELECT doc_id, ng, pos,
        |              min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |                           ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wmin
        |       FROM grams),
        |f AS (SELECT DISTINCT doc_id, wmin AS fp FROM wm
        |      WHERE pos <= greatest(CAST(0 AS BIGINT), ng - 8)),
        |kept AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 256),
        |ff AS (SELECT f.doc_id, f.fp FROM f JOIN kept ON f.fp = kept.fp),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM ff GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS da, b.doc_id AS db,
        |                 CAST(count(*) AS BIGINT) AS n_shared
        |          FROM ff a JOIN ff b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |          GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 2)
        |SELECT da, db, n_shared, sa.sz AS fp_a, sb.sz AS fp_b
        |FROM pairs JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
        |ORDER BY n_shared DESC, da, db LIMIT 50""".stripMargin,
    "c49_curation_funnel" ->
      """WITH base AS (
        |  SELECT doc_id, lang, text, n_chars,
        |         CAST(size(filter(split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |quality AS (SELECT doc_id, lang, text, n_tokens FROM (
        |    SELECT *, CASE WHEN n_chars < 50 THEN 'too_short'
        |                   WHEN n_chars > 5000 THEN 'too_long'
        |                   WHEN length(regexp_replace(text, '[^a-z]', '')) * 10
        |                        < n_chars * 6 THEN 'low_alpha'
        |                   WHEN size(array_distinct(filter(split(text, ' '), t -> t <> ''))) * 10
        |                        < size(filter(split(text, ' '), t -> t <> '')) * 3
        |                     THEN 'repetitive'
        |                   ELSE 'keep' END AS reason
        |    FROM base)
        |  WHERE reason = 'keep'),
        |withH AS (SELECT *, md5(CAST(text AS BINARY)) AS h FROM quality),
        |exact AS (SELECT w.doc_id, w.lang, w.text, w.n_tokens FROM withH w
        |          JOIN (SELECT h, min(doc_id) AS doc_id FROM withH GROUP BY h) m
        |            ON w.h = m.h AND w.doc_id = m.doc_id),
        |withFp AS (SELECT *, simhash64(text) AS fp FROM exact),
        |nearDup AS (SELECT w.doc_id, w.lang, w.n_tokens FROM withFp w
        |            JOIN (SELECT fp, min(doc_id) AS doc_id FROM withFp GROUP BY fp) m
        |              ON w.fp = m.fp AND w.doc_id = m.doc_id),
        |sampled AS (SELECT doc_id, n_tokens FROM nearDup
        |  WHERE CAST(conv(substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 2),
        |                  16, 10) AS INT)
        |        < CASE WHEN lang = 'de' THEN 64 WHEN lang = 'en' THEN 32 ELSE 128 END)
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS stage_id, 'raw' AS stage,
        |         CAST(count(*) AS BIGINT) AS n_docs, sum(n_tokens) AS sum_tokens FROM base
        |  UNION ALL SELECT 1, 'quality_keep', count(*), sum(n_tokens) FROM quality
        |  UNION ALL SELECT 2, 'exact_dedup', count(*), sum(n_tokens) FROM exact
        |  UNION ALL SELECT 3, 'neardup_keep', count(*), sum(n_tokens) FROM nearDup
        |  UNION ALL SELECT 4, 'sampled', count(*), sum(n_tokens) FROM sampled)
        |ORDER BY stage_id""".stripMargin)
}
