package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 (late) corpus operators: TextRank keyword extraction (the
  * iterative-graph workload class — PageRank over the token
  * co-occurrence graph), deletion-request propagation (the
  * right-to-be-forgotten purge with its content-closure subtlety), and
  * temperature-based mixture weights (the multilingual α-sampler that
  * complements c52's uniform-target DoReMi shape).
  *
  * All three follow the house determinism contract: integer-only
  * arithmetic (DECIMAL(38,0) cross-multiplies where products can pass
  * 2^63), total output orders, and a DuckDB twin that replays every
  * step — including all four PageRank rounds — bit-for-bit.
  */
object CorpusRank {
  import Tables.load

  /** PageRank damping (×1000) and iteration count for c62. Fixed rounds
    * — not convergence-tested — so the oracle can replay the loop as
    * chained CTEs; 4 rounds separate hubs from leaves on co-occurrence
    * graphs (TextRank's own experiments converge in 20–30 rounds to
    * tight tolerances; the RANKING stabilizes far earlier).
    */
  private val Damping = 850
  private val Rounds = 4

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // c62 — TextRank keyword extraction: PageRank over the token
    // co-occurrence graph (nodes = tokens, edge weight = adjacency
    // count, symmetrized), the classic unsupervised keyword ranker.
    // This is the engine's representative ITERATIVE-GRAPH workload
    // beyond c15's connected components: per-round cost is one keyed
    // join + one aggregate over the EDGE table — vocabulary²-bounded
    // (observed-bigram-bounded in practice), corpus-size-independent
    // after the first aggregate, with localCheckpoint truncating the
    // lineage each round exactly like the c15/Lloyd loops. Ranks are
    // scaled ×1e6 BIGINTs; per-edge contributions and the damped update
    // widen to DECIMAL(38,0) (oracle: HUGEINT) so a 1e9-token vocab at
    // 100 TB cannot overflow — and the division-truncation order is
    // pinned, so all 4 rounds are bit-identical cross-engine. Every
    // node of the symmetrized graph has in-degree = out-degree ≥ 1, so
    // there is NO dangling-mass term to model. Output: top 30 tokens by
    // final rank (total order: rank desc, token).
    "c62_textrank_keywords" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      // Adjacent-pair counts ride the same skip-empty bigram spelling as
      // c50 (TokenNgrams kernel: one compiled pass per doc, no token
      // explode before the pair aggregate).
      val bi = docs.select(
          explode(org.apache.spark.sql.GraftBridge.column(
            graft.functions.TokenNgrams(
              org.apache.spark.sql.GraftBridge.expression(col("text")),
              n = 2, maxStarts = Int.MaxValue, skipEmpty = true))).as("bigram"))
        .select(expr("split(bigram, ' ')[0]").as("u"),
          expr("split(bigram, ' ')[1]").as("v"))
        .filter(col("u") =!= col("v")) // self-loops carry no ranking signal
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("c"))
      // Symmetrize: e(u,v) = c(u,v) + c(v,u). Materialized once — the
      // edge table is reused by all rounds AND the degree readout.
      // Kept under the r13 checkpoint audit with a measured 6% cost
      // (ScanShapeAb ckptab at 10×: 7.01 s vs 6.60 s without — the
      // rounds' identical subplans would dedup via ReusedExchange):
      // the checkpoints BOUND PLAN DEPTH — without them round k's
      // optimized plan embeds rounds 1..k−1, so analysis/optimization
      // cost grows with the round count even though execution dedups;
      // a production run raising Rounds must not cliff on the planner.
      val e = bi.select(col("u"), col("v"), col("c"))
        .union(bi.select(col("v").as("u"), col("u").as("v"), col("c")))
        .groupBy(col("u"), col("v")).agg(sum(col("c")).as("w"))
        .localCheckpoint(true)
      val wo = e.groupBy(col("u"))
        .agg(sum(col("w")).as("wt"), count(lit(1)).as("degree"))
        .localCheckpoint(true)
      var r = wo.select(col("u").as("tok"), lit(1000000L).as("r"))
      for (_ <- 1 to Rounds) {
        val contrib = e.join(wo.select(col("u"), col("wt")), "u")
          .join(r.select(col("tok").as("u"), col("r")), "u")
          .select(col("v"),
            // div yields BIGINT; re-widen so the per-node SUM of
            // contributions is 128-bit (oracle: HUGEINT), not a BIGINT
            // that wraps silently when a hub's in-mass passes 2^63.
            expr("CAST(CAST(r AS DECIMAL(38,0)) * w div wt AS DECIMAL(38,0))").as("m"))
        r = contrib.groupBy(col("v"))
          .agg(expr(s"CAST($Damping * sum(m) div 1000 + ${1000000 - Damping * 1000} AS BIGINT)")
            .as("r"))
          .select(col("v").as("tok"), col("r"))
          .localCheckpoint(true)
      }
      r.join(wo.select(col("u").as("tok"), col("degree"), col("wt").as("w_out")), "tok")
        .select(col("tok"), col("degree"), col("w_out"), col("r").as("rank_x1m"))
        .orderBy(col("rank_x1m").desc, col("tok")).limit(30)
    }),

    // c67 — triangle census of the co-occurrence graph: the classic
    // distributed-graph workload beyond c62's PageRank (iteration) and
    // c15's connected components (propagation) — a MULTI-WAY SELF-JOIN
    // whose naive spelling explodes on hub nodes. The fix is the
    // published degree-ordered orientation: every edge points from its
    // lower-(degree, token) endpoint, wedges form only at each
    // triangle's LOWEST-degree corner, and each triangle is found
    // exactly once — join cost O(m^1.5) regardless of hub degree, the
    // difference between feasible and not on a power-law vocab at
    // 100 TB. Edges need support ≥ 5 (c50's floor) so corpus noise
    // never densifies the graph. Readout: top-10 tokens by triangle
    // participation (each triangle credits all three corners), total
    // order (count desc, token).
    "c67_triangle_tokens" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      val bi = docs.select(
          explode(org.apache.spark.sql.GraftBridge.column(
            graft.functions.TokenNgrams(
              org.apache.spark.sql.GraftBridge.expression(col("text")),
              n = 2, maxStarts = Int.MaxValue, skipEmpty = true))).as("bigram"))
        .select(expr("split(bigram, ' ')[0]").as("u"),
          expr("split(bigram, ' ')[1]").as("v"))
        .filter(col("u") =!= col("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("c"))
      val e = bi
        .select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"), col("c"))
        .groupBy(col("u"), col("v")).agg(sum(col("c")).as("w"))
        .filter(col("w") >= 5)
        .select(col("u"), col("v"))
        .localCheckpoint(true) // reused by orientation AND closure
      val deg = e.select(col("u").as("t")).union(e.select(col("v").as("t")))
        .groupBy(col("t")).agg(count(lit(1)).as("deg"))
      val low = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val o = e
        .join(deg.select(col("t").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("t").as("v"), col("deg").as("dv")), "v")
        .select(when(low, col("u")).otherwise(col("v")).as("a"),
          when(low, col("v")).otherwise(col("u")).as("b"))
        // both wedge sides read o: materialize so the degree join runs
        // once, not once per reference
        .localCheckpoint(true)
      val tri = o
        .join(o.select(col("a"), col("b").as("c")), "a")
        .filter(col("b") < col("c"))
        .join(e.select(col("u").as("b"), col("v").as("c")), Seq("b", "c"))
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n_triangles"))
        .orderBy(col("n_triangles").desc, col("tok")).limit(10)
    }),

    // c63 — deletion-request propagation: the right-to-be-forgotten
    // purge audit. Deletion requests name doc_ids (simulated here as
    // doc_id % 97 = 0), but honoring them by id alone is WRONG at
    // corpus scale: exact copies of a deleted document (mirrors,
    // re-crawls, cross-source shares — c58 measures how common) retain
    // the content, so the purge must close over the content hash. Per
    // source: corpus size, direct requests, docs actually purged
    // (request ∪ content closure), docs kept. Shuffles carry (source,
    // 16-byte hash) — document text never moves; the closure is one
    // left-semi join against the distinct tombstone-hash set (keyed,
    // never forced broadcast — at 100 TB the request log is itself a
    // big table; AQE may still choose broadcast when it IS small).
    // Invariants (asserted in CorpusRankSpec): every requested doc is in
    // its own closure, so n_purged ≥ n_requests per source; kept +
    // purged = total.
    "c63_tombstone_purge" -> ((s, dir) => {
      val d = load(s, dir, "documents")
        .select(col("doc_id"), col("source"), md5(col("text").cast("binary")).as("h"))
      val tombHashes = d.filter(col("doc_id") % 97 === 0).select(col("h")).distinct()
      val purged = d.join(tombHashes, Seq("h"), "left_semi")
        .groupBy(col("source")).agg(count(lit(1)).as("n_purged"))
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") % 97 === 0, 1L).otherwise(0L)).as("n_requests"))
        .join(purged, Seq("source"), "left_outer")
        .select(col("source"), col("n_docs"), col("n_requests"),
          coalesce(col("n_purged"), lit(0L)).as("n_purged"))
        .withColumn("n_kept", col("n_docs") - col("n_purged"))
        .orderBy(col("source"))
    }),

    // c64 — temperature-based mixture weights: the multilingual
    // α-sampler (XLM-R / mC4 style), p_lang ∝ n_tokens^α with α = 1/2 —
    // upsample low-resource languages, damp the head. Complements c52,
    // which is the uniform-TARGET (DoReMi-static) shape; this is the
    // power-law reweighting between proportional (α=1) and uniform
    // (α=0). n^(1/2) is the one α where the power is exactly computable:
    // w = floor(sqrt(n)) with IEEE-754 sqrt correctly rounded in BOTH
    // engines (JVM Math.sqrt per JLS; DuckDB libm), and n_tokens < 2^53
    // keeps the BIGINT→DOUBLE cast exact — a per-language token count
    // beyond 9e15 (a ~30 PB single language) would need an integer
    // sqrt; noted in PERF.md with the other 2^53 bounds. Shares,
    // proportional shares, and the boost ratio are ×1e6/×1000 integer
    // divisions off DECIMAL(38,0) cross-multiplies. The 1-row total
    // broadcasts (the c52/b19 scalar pattern — allowlisted in
    // PlanSpec's hygiene sweep).
    "c64_temperature_mix" -> ((s, dir) => {
      val perLang = load(s, dir, "documents")
        .select(col("lang"),
          size(array_remove(split(col("text"), " "), "")).cast("long").as("n_tokens"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .withColumn("w", expr("CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)"))
      val tot = perLang.agg(sum(col("n_tokens")).as("tot_tokens"), sum(col("w")).as("tot_w"))
      perLang.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          expr("CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000 div tot_tokens AS BIGINT)")
            .as("prop_x1m"),
          expr("CAST(CAST(w AS DECIMAL(38,0)) * 1000000 div tot_w AS BIGINT)").as("p_x1m"))
        .withColumn("boost_x1000",
          expr("CAST(CAST(p_x1m AS DECIMAL(38,0)) * 1000 div greatest(prop_x1m, 1) AS BIGINT)"))
        .orderBy(col("lang"))
    }),

    // c69 — two-sample Kolmogorov–Smirnov drift between sources: for
    // every source pair, D = max over x |F_a(x) − F_b(x)| on the
    // doc-length distribution (16-char buckets). The distribution-shape
    // complement to c48's L1-on-histograms: KS is the standard "did
    // this source's length profile shift?" test, and its statistic is
    // exactly computable with integers — the CDF difference
    // cross-multiplies to |cum_a·n_b − cum_b·n_a| in DECIMAL(38,0)
    // (≤ n_a·n_b ~ 10²² at 100 TB, 16 digits of headroom), reported in
    // parts-per-million. Everything after the one corpus scan is
    // value-domain-bounded: counts per (source, bucket), a generated
    // sources × buckets grid (bounded BNLJ, allowlisted like the other
    // by-construction-bounded broadcasts), per-source running sums over
    // ≤ |buckets| rows, and a bucket-keyed pair join.
    "c69_ks_drift" -> ((s, dir) => {
      val d = load(s, dir, "documents")
        .select(col("source"), expr("CAST(n_chars div 16 AS BIGINT)").as("bkt"))
      val counts = d.groupBy(col("source"), col("bkt")).agg(count(lit(1)).as("n"))
      val grid = d.select(col("source")).distinct()
        .crossJoin(broadcast(d.select(col("bkt")).distinct()))
      val wc = Window.partitionBy(col("source")).orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = grid.join(counts, Seq("source", "bkt"), "left_outer")
        .withColumn("cn", sum(coalesce(col("n"), lit(0L))).over(wc))
      val tot = d.groupBy(col("source")).agg(count(lit(1)).as("nt"))
      val a = cum.select(col("source").as("source_a"), col("bkt"), col("cn").as("ca"))
      val b = cum.select(col("source").as("source_b"), col("bkt"), col("cn").as("cb"))
      a.join(b, "bkt").filter(col("source_a") < col("source_b"))
        .join(tot.select(col("source").as("source_a"), col("nt").as("n_a")), "source_a")
        .join(tot.select(col("source").as("source_b"), col("nt").as("n_b")), "source_b")
        .groupBy(col("source_a"), col("source_b"), col("n_a"), col("n_b"))
        .agg(expr("CAST(max(abs(CAST(ca AS DECIMAL(38,0)) * n_b - CAST(cb AS DECIMAL(38,0)) * n_a)) " +
          "* 1000000 div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("ks_x1e6"))
        .orderBy(col("source_a"), col("source_b"))
    })
  )

  /** The c62 oracle's four unrolled PageRank rounds, generated so the
    * round count cannot drift from [[Rounds]].
    */
  private def rankCtes: String = (1 to Rounds).map { k =>
    s"""r$k AS (SELECT e.v AS tok,
       |  CAST($Damping * sum(CAST(r.r AS HUGEINT) * e.w // wo.wt) // 1000
       |       + ${1000000 - Damping * 1000} AS BIGINT) AS r
       |  FROM e JOIN wo ON e.u = wo.u JOIN r${k - 1} r ON r.tok = e.u
       |  GROUP BY e.v)""".stripMargin
  }.mkString(",\n")

  def oracle: Map[String, String] = Map(
    "c62_textrank_keywords" ->
      s"""WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tk
         |           FROM documents),
         |bg0 AS (SELECT unnest(list_transform(range(1, len(tk)),
         |    i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i + 1 AS INT)])) AS bigram
         |  FROM t WHERE len(tk) >= 2),
         |bi AS (SELECT string_split(bigram, ' ')[1] AS u,
         |              string_split(bigram, ' ')[2] AS v,
         |              CAST(count(*) AS BIGINT) AS c
         |       FROM bg0
         |       WHERE string_split(bigram, ' ')[1] <> string_split(bigram, ' ')[2]
         |       GROUP BY 1, 2),
         |e AS (SELECT u, v, CAST(sum(c) AS BIGINT) AS w FROM (
         |        SELECT u, v, c FROM bi
         |        UNION ALL SELECT v AS u, u AS v, c FROM bi)
         |      GROUP BY u, v),
         |wo AS (SELECT u, CAST(sum(w) AS BIGINT) AS wt,
         |              CAST(count(*) AS BIGINT) AS degree
         |       FROM e GROUP BY u),
         |r0 AS (SELECT u AS tok, CAST(1000000 AS BIGINT) AS r FROM wo),
         |$rankCtes
         |SELECT r$Rounds.tok, wo.degree, wo.wt AS w_out, r$Rounds.r AS rank_x1m
         |FROM r$Rounds JOIN wo ON wo.u = r$Rounds.tok
         |ORDER BY rank_x1m DESC, tok LIMIT 30""".stripMargin,
    "c67_triangle_tokens" ->
      """WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tk
        |           FROM documents),
        |bg0 AS (SELECT unnest(list_transform(range(1, len(tk)),
        |    i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i + 1 AS INT)])) AS bigram
        |  FROM t WHERE len(tk) >= 2),
        |bi AS (SELECT string_split(bigram, ' ')[1] AS u,
        |              string_split(bigram, ' ')[2] AS v, count(*) AS c
        |       FROM bg0
        |       WHERE string_split(bigram, ' ')[1] <> string_split(bigram, ' ')[2]
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
        |x AS (SELECT unnest([a, b, c]) AS tok FROM tri)
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
        |    CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |l AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |        CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE))) AS BIGINT) AS w
        |      FROM d GROUP BY lang),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
        |             CAST(sum(w) AS BIGINT) AS tot_w FROM l),
        |sel AS (SELECT lang, n_docs, n_tokens,
        |         CAST(CAST(n_tokens AS HUGEINT) * 1000000 // tot_tokens AS BIGINT)
        |           AS prop_x1m,
        |         CAST(CAST(w AS HUGEINT) * 1000000 // tot_w AS BIGINT) AS p_x1m
        |        FROM l CROSS JOIN t)
        |SELECT lang, n_docs, n_tokens, prop_x1m, p_x1m,
        |       CAST(CAST(p_x1m AS HUGEINT) * 1000 // greatest(prop_x1m, 1) AS BIGINT)
        |         AS boost_x1000
        |FROM sel ORDER BY lang""".stripMargin,
    "c69_ks_drift" ->
      """WITH d AS (SELECT source, CAST(n_chars // 16 AS BIGINT) AS bkt FROM documents),
        |c AS (SELECT source, bkt, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1, 2),
        |grid AS (SELECT s.source, b.bkt FROM (SELECT DISTINCT source FROM d) s
        |         CROSS JOIN (SELECT DISTINCT bkt FROM d) b),
        |cum AS (SELECT g.source, g.bkt,
        |        sum(coalesce(c.n, 0)) OVER (PARTITION BY g.source ORDER BY g.bkt
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
        |        FROM grid g LEFT JOIN c ON c.source = g.source AND c.bkt = g.bkt),
        |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS nt FROM d GROUP BY source),
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |             abs(CAST(a.cn AS HUGEINT) * tb.nt - CAST(b.cn AS HUGEINT) * ta.nt)
        |               AS dd,
        |             ta.nt AS n_a, tb.nt AS n_b
        |      FROM cum a JOIN cum b ON a.bkt = b.bkt AND a.source < b.source
        |      JOIN tot ta ON ta.source = a.source
        |      JOIN tot tb ON tb.source = b.source)
        |SELECT source_a, source_b, n_a, n_b,
        |       CAST(max(dd) * 1000000 // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
        |         AS ks_x1e6
        |FROM p GROUP BY source_a, source_b, n_a, n_b
        |ORDER BY source_a, source_b""".stripMargin
  )
}
