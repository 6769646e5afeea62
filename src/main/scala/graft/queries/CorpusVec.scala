package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector-space curation operators over the labeled embedding table:
  * label-outlier (mislabel) detection via exact distance-to-centroid.
  * Complements c40 (scalar IQR outliers) with the VECTOR-column member
  * of the outlier-filter family, and reuses c39's scaled-long centroid
  * domain so every step is integer-exact and DuckDB-replayable.
  */
object CorpusVec {
  import Tables.load

  /** c65's outlier threshold as an exact rational: a row is flagged
    * when its distance exceeds `Num/Den ×` its label's mean distance
    * (cross-multiplied — no division ever happens on the row side).
    * 17/16 = 1.0625×: L1 distance over 64 near-iid dims concentrates
    * hard around its mean (the synthetic corpus spans 0.88–1.12×), so
    * the flag must sit inside that band to read the tail; real
    * mislabels land far outside it.
    */
  private val OutlierNum = 17
  private val OutlierDen = 16

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // c65 — label-outlier detection (mislabel / contamination scan in
    // embedding space): per-row exact L1 distance to the row's OWN
    // label centroid, flagged when > 17/16× the label's mean distance.
    // The
    // pre-training pass that catches mislabeled or off-distribution
    // vectors before they pollute a classifier head or a hard-negative
    // mine. All arithmetic is integer-exact in c39's ×10⁴ scaled-long
    // domain: the mean centroid is kept as (per-dim SUM, count) — never
    // divided — so the per-row distance is Σ_i |v_i·n − s_i| (the L1
    // distance ×n, exact BIGINT: |v|≤10⁴ scaled × n<2³⁰ rows/label × 64
    // dims stays far under 2⁶³), and the outlier test cross-multiplies
    // d·n·16 > 17·Σd in DECIMAL(38,0) (oracle: HUGEINT). Scale shape: two
    // aggregates over the (row, dim) explosion — map-side partials on
    // (label, dim) for the centroid (≤ labels×64 groups, broadcast
    // back), then per-row distances re-keyed by vec for the readout;
    // the label-stats join is a broadcast of a labels-row table. The
    // embedding scan runs twice (once per aggregate) — at 100 TB both
    // passes prune to (vec_id, label, embedding) and the first pass's
    // centroid table would be persisted, never a cache of the corpus.
    "c65_label_outliers" -> ((s, dir) => {
      val sv = load(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          posexplode(expr(
            "transform(embedding, x -> CAST(CAST(x AS DECIMAL(12,4)) * 10000 AS BIGINT))")))
        .select(col("vec_id"), col("label"),
          col("pos").as("i"), col("col").as("v"))
      val cent = sv.groupBy(col("label"), col("i"))
        .agg(sum(col("v")).as("cs"), count(lit(1)).as("n"))
      val dist = sv.join(broadcast(cent), Seq("label", "i"))
        .select(col("vec_id"), col("label"),
          abs(col("v") * col("n") - col("cs")).as("ad"))
        .groupBy(col("vec_id"), col("label"))
        .agg(sum(col("ad")).as("d"))
      val st = dist.groupBy(col("label"))
        .agg(expr("CAST(sum(CAST(d AS DECIMAL(38,0))) AS DECIMAL(38,0))").as("sum_d"),
          count(lit(1)).as("n_vecs"))
      dist.join(broadcast(st), Seq("label"))
        .select(col("label"), col("n_vecs"), col("sum_d"),
          when(expr(s"CAST(d AS DECIMAL(38,0)) * n_vecs * $OutlierDen > $OutlierNum * sum_d"), 1L)
            .otherwise(0L).as("is_out"))
        .groupBy(col("label"))
        .agg(min(col("n_vecs")).as("n_vecs"),
          expr("CAST(min(sum_d) div (CAST(min(n_vecs) AS DECIMAL(38,0)) * min(n_vecs)) AS BIGINT)")
            .as("mean_dist"),
          sum(col("is_out")).as("n_outliers"))
        .orderBy(col("label"))
    }),

    // c66 — kNN label-agreement (the other half of the label-noise
    // story): c65 asks "is this vector far from its own label's
    // centroid?"; c66 asks "do this vector's nearest neighbors VOTE for
    // its label?" — the confident-learning signal that catches mislabels
    // sitting between clusters where centroid distance is ambiguous.
    // Semantics + scale shape documented on
    // [[graft.operators.Similarity.knnLabelAgreement]]; the oracle
    // replays the Lloyd loop (c31's shared CTE generator), the
    // within-cell cosine ranking, and the 2/5 cross-multiplied flag.
    "c66_knn_agreement" -> ((s, dir) =>
      graft.operators.Similarity.knnLabelAgreement(
        load(s, dir, "embeddings"), k = 5, nCells = 8, lloydIters = 2))
  )

  def oracle: Map[String, String] = Map(
    "c65_label_outliers" ->
      s"""WITH sv AS (SELECT vec_id, CAST(label AS BIGINT) AS label, t.i,
         |    CAST(CAST(CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(12,4)) * 10000
         |      AS BIGINT) AS v
         |  FROM embeddings e, range(1, 65) t(i)),
         |cent AS (SELECT label, i, CAST(sum(v) AS BIGINT) AS cs,
         |           CAST(count(*) AS BIGINT) AS n
         |         FROM sv GROUP BY label, i),
         |dist AS (SELECT sv.vec_id, sv.label,
         |           CAST(sum(abs(sv.v * c.n - c.cs)) AS BIGINT) AS d
         |         FROM sv JOIN cent c ON sv.label = c.label AND sv.i = c.i
         |         GROUP BY sv.vec_id, sv.label),
         |st AS (SELECT label, CAST(sum(CAST(d AS HUGEINT)) AS HUGEINT) AS sum_d,
         |         CAST(count(*) AS BIGINT) AS n_vecs
         |       FROM dist GROUP BY label)
         |SELECT d.label, min(st.n_vecs) AS n_vecs,
         |       CAST(min(st.sum_d) // (CAST(min(st.n_vecs) AS HUGEINT) * min(st.n_vecs))
         |         AS BIGINT) AS mean_dist,
         |       CAST(sum(CASE WHEN CAST(d.d AS HUGEINT) * st.n_vecs * $OutlierDen
         |                          > $OutlierNum * st.sum_d
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM dist d JOIN st ON d.label = st.label
         |GROUP BY d.label ORDER BY d.label""".stripMargin,
    "c66_knn_agreement" ->
      s"""WITH ${ExtOps.kmeansCtes(nCells = 8, iters = 2, finalProbe = 1)},
         |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
         |prs AS (SELECT a.cell, a.vec_id AS va, b.vec_id AS vb
         |  FROM a3 a JOIN a3 b ON a.cell = b.cell AND a.vec_id < b.vec_id),
         |dots AS (SELECT p.va, p.vb, CAST(sum(x.sv * y.sv) AS DOUBLE) / 1e8 AS dot
         |  FROM prs p JOIN el x ON x.vec_id = p.va
         |             JOIN el y ON y.vec_id = p.vb AND x.i = y.i
         |  GROUP BY 1, 2),
         |cs AS (SELECT d.va, d.vb, d.dot / (na.nv * nb.nv) AS cos
         |  FROM dots d JOIN nrm na ON na.vec_id = d.va
         |              JOIN nrm nb ON nb.vec_id = d.vb),
         |sym AS (SELECT va, vb, cos FROM cs
         |        UNION ALL SELECT vb AS va, va AS vb, cos FROM cs),
         |nn AS (SELECT va, vb FROM (
         |    SELECT va, vb, row_number() OVER (PARTITION BY va
         |             ORDER BY cos DESC, vb) AS rn FROM sym)
         |  WHERE rn <= 5),
         |pv AS (SELECT n.va, la.label AS la, CAST(count(*) AS BIGINT) AS nn_cnt,
         |         CAST(sum(CASE WHEN lb.label = la.label THEN 1 ELSE 0 END) AS BIGINT)
         |           AS agree
         |       FROM nn n JOIN lab la ON la.vec_id = n.va
         |                 JOIN lab lb ON lb.vec_id = n.vb
         |       GROUP BY 1, 2)
         |SELECT la AS label, CAST(count(*) AS BIGINT) AS n_vecs,
         |       CAST(sum(agree) * 1000 // sum(nn_cnt) AS BIGINT) AS agree_pml,
         |       CAST(sum(CASE WHEN agree * 5 < nn_cnt * 2 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_suspect
         |FROM pv GROUP BY la ORDER BY label""".stripMargin
  )
}
