package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Round-4 corpus operators: cross-source overlap (the dataset-mixing
  * contamination audit), BPE merge-pair mining (tokenizer training's
  * first iteration), and MinHash estimator calibration (how well the
  * sketch tracks exact Jaccard — the audit that justifies trusting c1's
  * candidates at 100 TB, where the exact verify pass is the expensive
  * step you want to SKIP for low-estimate pairs).
  */
object CorpusExtra {
  import Tables.load

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // c58 — cross-source content overlap: for every source pair, how
    // many distinct documents they share — verbatim (full-content hash)
    // and near-verbatim (b1b's 4-token-prefix normalization, which
    // catches shared templates exact hashing misses). The mixing-weights
    // question "are my sources actually disjoint?" answered with two
    // 16-byte-hash self-joins — shuffles carry (source, hash), never
    // text; distinct-before-join caps each hash's posting list at the
    // source count, so join output is bounded by n_hashes × |sources|²,
    // not corpus².
    "c58_cross_source_overlap" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      def pairCounts(h: DataFrame, cnt: String): DataFrame = {
        val a = h.select(col("h"), col("source").as("source_a"))
        val b = h.select(col("h"), col("source").as("source_b"))
        a.join(b, "h")
          .filter(col("source_a") < col("source_b"))
          .groupBy(col("source_a"), col("source_b"))
          .agg(countDistinct(col("h")).as(cnt))
      }
      val prefix = pairCounts(docs.select(col("source"),
        // limit-5 split: only the 4-token prefix is kept (b1b rule)
        md5(array_join(slice(split(col("text"), " ", 5), 1, 4), " ").cast("binary")).as("h"))
        .distinct(), "n_shared_prefix")
      val exact = pairCounts(docs.select(col("source"),
        md5(col("text").cast("binary")).as("h")).distinct(), "n_shared_exact")
      prefix.join(exact, Seq("source_a", "source_b"), "left_outer")
        .select(col("source_a"), col("source_b"), col("n_shared_prefix"),
          coalesce(col("n_shared_exact"), lit(0L)).as("n_shared_exact"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // c59 — BPE merge-pair mining: the first iteration of byte-pair-
    // encoding tokenizer training — adjacent character-pair frequencies
    // across the corpus, weighted by token frequency. The corpus
    // collapses to its VOCABULARY first (the c26 discipline: one
    // token-count aggregate, everything after is vocab-sized, corpus-
    // size-independent), then each vocab entry explodes to its ≤len−1
    // pairs. Top 30 pairs = the first 30 merge candidates. Both stages
    // are the ONE spelling shared with the streaming twin
    // (streaming.VocabStream: live-ingest vocab maintenance + the same
    // readout), so backfill and live paths cannot drift.
    "c59_bpe_pairs" -> ((s, dir) =>
      graft.streaming.VocabStream.bpePairs(
        graft.streaming.VocabStream.vocabCounts(load(s, dir, "documents")), 30)),

    // c61 — embedding snapshot drift: per label, the L1 distance between
    // the two snapshot halves' centroids (even/odd vec_id — the c46/c48
    // snapshot convention applied to the EMBEDDING table). Centroids use
    // c39's exact spelling (4-decimal scaled longs, decimal-rounded
    // mean), so the drift figure is integer-exact cross-engine. The
    // monitoring twin of c48 for vector columns: a retrained embedding
    // model or a corrupted ingest shows up as per-label centroid motion
    // before it shows up in training. Shuffles carry (label, dim)
    // aggregates — ≤ labels × 64 rows, corpus-size-independent.
    "c61_embedding_drift" -> ((s, dir) => {
      def centroids(half: DataFrame): DataFrame = half
        .select(col("label").cast("long").as("label"),
          posexplode(expr(
            "transform(embedding, x -> CAST(CAST(x AS DECIMAL(12,4)) * 10000 AS BIGINT))")))
        .select(col("label"), (col("pos") + 1).cast("long").as("i"), col("col").as("sv"))
        .groupBy(col("label"), col("i"))
        .agg(count(lit(1)).as("n"), sum(col("sv")).as("ss"))
        .withColumn("cv",
          expr("CAST(CAST(CAST(ss AS DOUBLE) / n AS DECIMAL(16,0)) AS BIGINT)"))
      val e = load(s, dir, "embeddings")
      val a = centroids(e.filter(col("vec_id") % 2 === 0))
        .select(col("label"), col("i"), col("cv").as("cva"), col("n").as("na"))
      val b = centroids(e.filter(col("vec_id") % 2 === 1))
        .select(col("label"), col("i"), col("cv").as("cvb"), col("n").as("nb"))
      a.join(b, Seq("label", "i"))
        .groupBy(col("label"))
        .agg(max(col("na")).as("n_vecs_a"), max(col("nb")).as("n_vecs_b"),
          sum(abs(col("cva") - col("cvb"))).as("l1_x10000"))
        .orderBy(col("label"))
    }),

    // c60 — MinHash estimator calibration: candidate pairs from c1's
    // banded LSH, bucketed by how many of the 8 minhashes agree, with
    // the EXACT Jaccard mass in each bucket. E[matching/8] = Jaccard,
    // so the report shows whether the sketch orders pairs correctly —
    // the audit that decides how aggressively the verify pass can prune
    // low-estimate candidates at scale. All aggregates are integer
    // (inter/union sums; the proxy mean is an integer cross-division),
    // so the result is bit-exact cross-engine: no double ever sums.
    "c60_minhash_calibration" -> ((s, dir) => {
      val docs = load(s, dir, "documents")
      val toks = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          array_remove(array_distinct(split(col("text"), " ")), "").as("toks"))
        .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("sz"))
      // The per-doc signatures come FROM the band values: each band is
      // the concat of 4 fixed-width (32 hex char) minhashes, so the 8
      // signature components are substrings of the 2 bands — no second
      // tokenize pass, no posting-list shuffle; the only sig cost is a
      // 2-rows→1 pivot of the kernel's output. (The banded table is
      // materialized once for the pivot + both candidate sides.)
      val banded = Dedup.minhashBanded(docs, 5).localCheckpoint(true)
      val sigs = banded.groupBy(col("doc_id"))
        .agg(max(when(col("band_id") === 0, col("bv"))).as("b0"),
          max(when(col("band_id") === 1, col("bv"))).as("b1"))
      val cands = Dedup.lshCandidates(banded)
      val sa = sigs.toDF("da", "a0", "a1")
      val sb = sigs.toDF("db", "c0", "c1")
      val nMatch = (0 until Dedup.NumHashes).map { j =>
        val (band, off) = (j / 4, 1 + 32 * (j % 4))
        when(substring(col(s"a$band"), off, 32) === substring(col(s"c$band"), off, 32),
          1L).otherwise(0L)
      }.reduce(_ + _)
      cands
        .join(toks.select(col("doc_id").as("da"), col("toks").as("ta"), col("sz").as("xa")), "da")
        .join(toks.select(col("doc_id").as("db"), col("toks").as("tb"), col("sz").as("xb")), "db")
        .select(col("da"), col("db"),
          size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"),
          col("xa"), col("xb"))
        .join(sa, "da").join(sb, "db")
        .select(nMatch.as("n_match"), col("inter"),
          (col("xa") + col("xb") - col("inter")).as("uni"))
        .groupBy(col("n_match"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("inter")).as("sum_inter"), sum(col("uni")).as("sum_union"),
          expr("CAST(CAST(sum(inter) AS DECIMAL(38,0)) * 1000 div sum(uni) AS BIGINT)")
            .as("jaccard_proxy_x1000"))
        .orderBy(col("n_match"))
    }),

    // c68 — winnowing fingerprint pairs (the MOSS local-fingerprinting
    // family, third distinct near-dup mechanism after MinHash's global
    // sketch and SimHash's bit fingerprint): docs sharing ≥ 2 winnowed
    // k-gram hashes, with each side's fingerprint-set size. Winnowing's
    // guarantee — any shared run of ≥ w+k−1 tokens yields a shared
    // fingerprint — makes this the EXCERPT detector: a lifted paragraph
    // always collides, regardless of how the rest of the docs differ.
    // The posting-list self-join is bounded by the same df cap as
    // c3/c55 (fingerprints in > 256 docs are boilerplate, not
    // plagiarism); everything that shuffles is (doc_id, 32-byte hash).
    "c68_winnow_pairs" -> ((s, dir) => {
      // Materialized once (the c55 discipline): the fingerprint table
      // feeds the df cap, both join sides and the sizes.
      val f = Dedup.winnowFingerprints(load(s, dir, "documents"))
        .localCheckpoint(true)
      val ff = f.join(
        f.groupBy(col("fp")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= Dedup.ShingleDfCap).select(col("fp")),
        "fp")
      val sizes = ff.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val a = ff.select(col("doc_id").as("da"), col("fp"))
      val b = ff.select(col("doc_id").as("db"), col("fp"))
      a.join(b, "fp").filter(col("da") < col("db"))
        .groupBy(col("da"), col("db")).agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .join(sizes.select(col("doc_id").as("da"), col("sz").as("fp_a")), "da")
        .join(sizes.select(col("doc_id").as("db"), col("sz").as("fp_b")), "db")
        .select(col("da"), col("db"), col("n_shared"), col("fp_a"), col("fp_b"))
        .orderBy(col("n_shared").desc, col("da"), col("db"))
        .limit(50)
    }),

    // c71 — sketch-space cross-source overlap: c58's question ("how
    // much do my sources share?") answered WITHOUT a corpus-sized
    // pairwise hash join. Each source keeps M=32 oracle-replayable HLL
    // registers (operators.HllDistinct — every bit md5-derived,
    // integer-only readout); a pair's UNION is the element-wise
    // register max (HLL's defining mergeability), and the shared-count
    // estimate is inclusion-exclusion est_a + est_b − est_union,
    // clamped at 0. Scale shape: the corpus is touched ONCE and the
    // register aggregate combines map-side like any HLL — only
    // |sources|·M longs cross the wire; the pairwise leg is registers ⋈
    // registers, |sources|²·M/2 rows of pure arithmetic, corpus-size-
    // INDEPENDENT — where c58's exact join moves n_hashes × |sources|²
    // rows. At 10⁴ sources over 100 TB that is 1.6e9 tiny rows vs
    // re-shuffling every document hash 10⁸ times. The exact shared
    // count rides along to GRADE the sketch (the c24/c45 discipline):
    // with 32 registers σ ≈ 18% per estimate, so small intersections
    // are noise — the exact column is the audit that says so. To be
    // explicit about the production-vs-audit split: the SHIPPED
    // readout at scale is SketchStore.overlap alone (registers only,
    // corpus never re-touched); the `n_exact_shared` column below —
    // the one distinct-hash self-join that re-reads the corpus — is
    // the bench-scale grader and is DROPPED at 100 TB.
    "c71_overlap_hll" -> ((s, dir) => {
      import graft.operators.HllDistinct
      val docs = load(s, dir, "documents")
      // tiny (|sources|·M rows) with three consumers — checkpoint once
      // instead of replaying the corpus scan for each (c55 discipline).
      // The register algebra + readout live in HllDistinct.pairwiseOverlap,
      // the ONE spelling shared with streaming.OverlapStream's live monitor.
      val regs = HllDistinct.registers(docs, col("source"), col("text"))
        .localCheckpoint(true)
      val h = docs.select(col("source"),
        md5(col("text").cast("binary")).as("h")).distinct()
      val exact = h.select(col("h"), col("source").as("source_a"))
        .join(h.select(col("h"), col("source").as("source_b")), "h")
        .filter(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_exact_shared"))
      HllDistinct.pairwiseOverlap(regs)
        .join(exact, Seq("source_a", "source_b"), "left_outer")
        .select(col("source_a"), col("source_b"), col("est_a"), col("est_b"),
          col("est_union"), col("est_shared"),
          coalesce(col("n_exact_shared"), lit(0L)).as("n_exact_shared"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // c72 — Bloom membership gate: for every eval doc (the c27 split,
    // doc_id % 97 = 0), does its b1b 4-token-prefix template appear in
    // the TRAINING split? The cheap production gate the c27 n-gram
    // audit backs: the filter is sources.BloomStore's (w, bits) words
    // TABLE (md5-derived positions, one bit_or aggregate — partials
    // combine map-side, the shuffle carries ≤ min(n·K, M/32) words at
    // any corpus size, and probing is an equi-join, never a driver-side
    // bitset). The exact prefix join rides along as the audit:
    // n_false_neg is structurally 0 (Bloom's contract), pinned by the
    // oracle, which replays the ENTIRE filter bit-for-bit (positions
    // are md5 hex arithmetic, the c45 discipline). False positives are
    // possible by design and show as n_flagged > n_hits_exact. To be
    // explicit about the production-vs-audit split (the c71 sentence,
    // applied here): the SHIPPED readout at scale is BloomStore.probe
    // against the persisted words table alone; the exact-membership
    // legs below — `trainKeys` distinct+join and the n_hits_exact /
    // n_false_neg columns they feed — are the bench-scale graders and
    // are DROPPED at 100 TB (the corpus is touched once to build the
    // filter, once per probe batch, never again). Sizing at scale:
    // don't hand-pick mBits — `BloomStore.sizeFor(expectedKeys,
    // targetFp)` inverts the FP arithmetic (e.g. sizeFor(10e9, 0.01)
    // ≈ 96 Gbit = a 3-billion-row words table, still a table); the
    // query keeps the MBits default only so the DuckDB oracle replays
    // the same constant.
    "c72_membership_gate" -> ((s, dir) => {
      import graft.sources.BloomStore
      // the ONE template-key spelling shared with the streaming gate
      // (the c59/VocabStream batch-stream discipline)
      val key = graft.streaming.MembershipStream.templateKey
      val docs = load(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      val eval_ = docs.filter(col("doc_id") % 97 === 0)
      val bits = BloomStore.bitsOf(train, key)
      val probed = BloomStore.probe(eval_, col("doc_id"), key, bits)
      val trainKeys = train.select(key.as("k")).distinct()
        .withColumn("in_train", lit(1L))
      eval_.select(col("doc_id"), col("lang"), key.as("k"))
        .join(probed, col("doc_id") === col("id"))
        .join(trainKeys, Seq("k"), "left_outer")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_eval"),
          sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_flagged"),
          sum(when(col("in_train").isNotNull, 1L).otherwise(0L)).as("n_hits_exact"),
          sum(when(col("in_train").isNotNull && !col("bloom_hit"), 1L)
            .otherwise(0L)).as("n_false_neg"))
        .orderBy(col("lang"))
    })
  )

  private val minhashCols =
    (0 until Dedup.NumHashes).map(j => s"min(md5('$j|' || tok)) AS m$j").mkString(", ")

  def oracle: Map[String, String] = Map(
    "c58_cross_source_overlap" ->
      """WITH hp AS (SELECT DISTINCT source,
        |    md5(array_to_string(list_slice(string_split(text, ' '), 1, 4), ' ')) AS h
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
    "c59_bpe_pairs" ->
      """WITH v AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE tok <> '' GROUP BY tok),
        |p AS (SELECT tok, n, unnest(range(1, len(tok))) AS i
        |      FROM v WHERE len(tok) >= 2),
        |q AS (SELECT substring(tok, CAST(i AS INT), 2) AS pair, tok, n FROM p)
        |SELECT pair, CAST(sum(n) AS BIGINT) AS n_occ,
        |       CAST(count(DISTINCT tok) AS BIGINT) AS n_types
        |FROM q GROUP BY pair ORDER BY n_occ DESC, pair LIMIT 30""".stripMargin,
    "c61_embedding_drift" ->
      """WITH el AS (SELECT vec_id, e.label, t.i,
        |    CAST(CAST(CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,4)) * 10000
        |      AS BIGINT) AS sv
        |  FROM embeddings e, range(1, 65) t(i)),
        |a AS (SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
        |             CAST(count(*) AS BIGINT) AS na,
        |             CAST(CAST(CAST(sum(sv) AS DOUBLE) / count(*) AS DECIMAL(16,0)) AS BIGINT) AS cva
        |      FROM el WHERE vec_id % 2 = 0 GROUP BY label, i),
        |b AS (SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
        |             CAST(count(*) AS BIGINT) AS nb,
        |             CAST(CAST(CAST(sum(sv) AS DOUBLE) / count(*) AS DECIMAL(16,0)) AS BIGINT) AS cvb
        |      FROM el WHERE vec_id % 2 = 1 GROUP BY label, i)
        |SELECT a.label, CAST(max(na) AS BIGINT) AS n_vecs_a,
        |       CAST(max(nb) AS BIGINT) AS n_vecs_b,
        |       CAST(sum(abs(cva - cvb)) AS BIGINT) AS l1_x10000
        |FROM a JOIN b ON a.label = b.label AND a.i = b.i
        |GROUP BY a.label ORDER BY a.label""".stripMargin,
    "c60_minhash_calibration" ->
      s"""WITH raw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |             FROM documents WHERE doc_id % 5 = 0),
         |toks AS (SELECT DISTINCT doc_id, tok FROM raw WHERE tok <> ''),
         |sigs AS (SELECT doc_id, $minhashCols FROM toks GROUP BY doc_id),
         |banded AS (
         |  SELECT doc_id, 0 AS band_id, concat(m0, m1, m2, m3) AS bv FROM sigs
         |  UNION ALL SELECT doc_id, 1, concat(m4, m5, m6, m7) FROM sigs),
         |cand AS (SELECT a.doc_id AS da, b.doc_id AS db
         |  FROM banded a JOIN banded b
         |    ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
         |inter AS (SELECT c.da, c.db, count(*) AS inter FROM cand c
         |  JOIN toks ta ON ta.doc_id = c.da
         |  JOIN toks tb ON tb.doc_id = c.db AND ta.tok = tb.tok
         |  GROUP BY c.da, c.db),
         |pairs AS (
         |  SELECT c.da, c.db,
         |    (${(0 until Dedup.NumHashes)
              .map(j => s"CASE WHEN A.m$j = B.m$j THEN 1 ELSE 0 END")
              .mkString(" + ")}) AS n_match,
         |    coalesce(i.inter, 0) AS inter,
         |    sa.sz + sb.sz - coalesce(i.inter, 0) AS uni
         |  FROM cand c
         |  JOIN sigs A ON A.doc_id = c.da
         |  JOIN sigs B ON B.doc_id = c.db
         |  LEFT JOIN inter i ON c.da = i.da AND c.db = i.db
         |  JOIN sizes sa ON sa.doc_id = c.da
         |  JOIN sizes sb ON sb.doc_id = c.db)
         |SELECT CAST(n_match AS BIGINT) AS n_match,
         |       CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(sum(inter) AS BIGINT) AS sum_inter,
         |       CAST(sum(uni) AS BIGINT) AS sum_union,
         |       CAST(CAST(sum(inter) AS HUGEINT) * 1000 // sum(uni) AS BIGINT)
         |         AS jaccard_proxy_x1000
         |FROM pairs GROUP BY n_match ORDER BY n_match""".stripMargin,
    "c68_winnow_pairs" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
        |t4 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 4),
        |g0 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) - 3 AS ng,
        |       unnest(range(1, len(toks) - 2)) AS i, toks FROM t4),
        |g AS (SELECT doc_id, ng, i,
        |      md5(array_to_string(list_slice(toks, CAST(i AS INT), CAST(i + 3 AS INT)), ' ')) AS h
        |      FROM g0),
        |w AS (SELECT doc_id, i, ng,
        |      min(h) OVER (PARTITION BY doc_id ORDER BY i
        |        ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wmin FROM g),
        |f AS (SELECT DISTINCT doc_id, wmin AS fp FROM w WHERE i <= greatest(1, ng - 7)),
        |d AS (SELECT fp FROM f GROUP BY fp HAVING count(*) <= 256),
        |ff AS (SELECT f.doc_id, f.fp FROM f JOIN d USING (fp)),
        |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM ff GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS n_shared
        |      FROM ff a JOIN ff b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2
        |      HAVING count(*) >= 2)
        |SELECT p.da, p.db, p.n_shared, sa.sz AS fp_a, sb.sz AS fp_b
        |FROM p JOIN sz sa ON sa.doc_id = p.da JOIN sz sb ON sb.doc_id = p.db
        |ORDER BY n_shared DESC, da, db LIMIT 50""".stripMargin,
    "c71_overlap_hll" -> {
      import graft.operators.HllDistinct.{M, Num}
      // Positional hex decode (the c42/c45 technique): digit k of the
      // md5 hex string as an integer 0..15.
      def digit(k: Int) = s"(instr('0123456789abcdef', substr(h, $k, 1)) - 1)"
      val x = (3 to 10).map(k => s"${digit(k)} * ${1L << (4 * (10 - k))}")
        .mkString("\n         + ")
      s"""WITH h AS (SELECT DISTINCT source, md5(text) AS h FROM documents
         |           WHERE source IS NOT NULL AND text IS NOT NULL),
         |d AS (SELECT source,
         |        (${digit(1)} * 16 + ${digit(2)}) % $M AS bucket,
         |        CAST($x AS BIGINT) AS x
         |      FROM h),
         |rk AS (SELECT source, bucket,
         |         CASE WHEN x = 0 THEN 33 ELSE 33 - length(bin(x)) END AS rank FROM d),
         |regs0 AS (SELECT source, bucket, max(rank) AS mj FROM rk GROUP BY source, bucket),
         |frame AS (SELECT s.source, b.bucket FROM (SELECT DISTINCT source FROM h) s,
         |          (SELECT unnest(range(0, $M)) AS bucket) b),
         |regs AS (SELECT f.source, f.bucket, coalesce(r.mj, 0) AS mj
         |         FROM frame f LEFT JOIN regs0 r
         |           ON f.source = r.source AND f.bucket = r.bucket),
         |per AS (SELECT source,
         |          CAST(($Num::BIGINT // CAST(sum(1::BIGINT << (33 - mj)) AS BIGINT))
         |            // 1000000 AS BIGINT) AS est
         |        FROM regs GROUP BY source),
         |un AS (SELECT a.source AS source_a, b.source AS source_b,
         |         CAST(sum(1::BIGINT << (33 - greatest(a.mj, b.mj))) AS BIGINT) AS s_u
         |       FROM regs a JOIN regs b
         |         ON a.bucket = b.bucket AND a.source < b.source
         |       GROUP BY 1, 2),
         |eu AS (SELECT source_a, source_b,
         |         CAST(($Num::BIGINT // s_u) // 1000000 AS BIGINT) AS est_union FROM un),
         |ex AS (SELECT a.source AS source_a, b.source AS source_b,
         |         CAST(count(*) AS BIGINT) AS n_exact_shared
         |       FROM h a JOIN h b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2)
         |SELECT eu.source_a, eu.source_b, pa.est AS est_a, pb.est AS est_b,
         |       eu.est_union,
         |       CAST(greatest(pa.est + pb.est - eu.est_union, 0) AS BIGINT) AS est_shared,
         |       coalesce(ex.n_exact_shared, 0) AS n_exact_shared
         |FROM eu JOIN per pa ON pa.source = eu.source_a
         |        JOIN per pb ON pb.source = eu.source_b
         |        LEFT JOIN ex ON ex.source_a = eu.source_a AND ex.source_b = eu.source_b
         |ORDER BY eu.source_a, eu.source_b""".stripMargin
    },
    "c72_membership_gate" -> {
      // Positional hex decode of 15 md5 digits from `from` (60 bits,
      // positive) — the c45/c71 technique, here for the two double-
      // hashing halves (BloomStore.withPositions: p_j = (h1+j·(h2|1))%M).
      def digit(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
      def p60(from: Int) = (from until from + 15)
        .map(i => s"${digit(i)} * ${1L << (4 * (from + 14 - i))}")
        .mkString("\n         + ")
      s"""WITH dk AS (SELECT doc_id, lang,
         |        md5(array_to_string(list_slice(string_split(text, ' '), 1, 4), ' ')) AS k
         |      FROM documents WHERE text IS NOT NULL),
         |hx AS (SELECT doc_id, md5(k) AS h FROM dk),
         |hh AS (SELECT doc_id, CAST(${p60(1)} AS BIGINT) AS h1,
         |              (CAST(${p60(16)} AS BIGINT) | 1) AS h2 FROM hx),
         |pwm AS (SELECT doc_id, (h1 + j * h2) % 1048576 AS p
         |        FROM hh CROSS JOIN (SELECT unnest(range(0, 5)) AS j)),
         |wm AS (SELECT doc_id, p // 32 AS w,
         |              (1::BIGINT << CAST(p % 32 AS INT)) AS m FROM pwm),
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
         |FROM ev GROUP BY lang ORDER BY lang""".stripMargin
    }
  )
}
