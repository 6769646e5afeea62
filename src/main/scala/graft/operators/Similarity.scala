package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Determinism: elements are quantized to decimal(12,4) and dot products /
  * norms accumulate in exact decimal — order-independent sums whose scaled
  * integer value stays < 2^53, so BOTH engines' decimal→double conversion
  * is exact and results are bit-identical to the DuckDB oracle (which
  * replays the same arithmetic in exploded form — exact decimal makes the
  * summation order irrelevant). Scale 4 shifts cosine by ~1e-4 vs
  * float-exact: an explicit, documented quantization applied identically
  * in engine and oracle. The final division/sqrt run in double,
  * IEEE-identical on identical inputs.
  *
  * Scale shapes: dot products are flat codegen'd 64-term sums — NO
  * position-explode, NO 64× shuffle amplification, NO interpreted
  * higher-order functions on the pair path. The brute-force path
  * broadcasts the (small) query batch and scans the vector table once;
  * the LSH path joins on the sign-bucket key so each query only meets
  * ~N/2^bits candidates; near-dup pairs run banded candidate generation
  * then verify (see [[nearDupPairs]]). Top-k heap-prunes the candidate
  * rows per query (native TopKPerKey, no sort) before the tiny ranking
  * window (see [[topK]]).
  */
object Similarity {

  /** Embedding dimensionality (the synthetic tables are all 64-dim; the
    * oracle's `range(1, 65)` hardcodes the same).
    */
  val Dims = 64

  /** Quantized integer embedding: each element as round(x, 4) × 10⁴ — the
    * decimal(12,4) quantization as an exact scaled long, so the fold runs
    * in primitive long arithmetic instead of BigDecimal.
    */
  private[graft] def scaled(a: String): String =
    s"transform($a, x -> CAST(CAST(x AS DECIMAL(12,4)) * 10000 AS BIGINT))"

  /** Exact dot product of two pre-scaled long-array columns (|sum| ≤
    * dims·(10⁵)² < 2^53, so the double conversion is exact), unscaled by
    * 10⁸. Bit-identical to the oracle's decimal-sum formulation: both are
    * the same rational. Runs as the custom [[graft.functions.LongArrayDot]]
    * codegen loop — `aggregate(zip_with(...))` is CodegenFallback (~100
    * µs/pair boxed) and a flat 64-term `element_at` sum exceeds HotSpot's
    * huge-method JIT limit (~25 µs/pair interpreted); the loop is ~100
    * ns/pair and keeps the pair join inside whole-stage codegen.
    */
  private[graft] def dot(a: String, b: String): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.LongArrayDot(
      GraftBridge.expression(col(a)), GraftBridge.expression(col(b))))
      .cast("double") / 1.0e8
  }

  /** L2 norm of a pre-scaled long-array column. */
  private[graft] def norm(a: String): Column = sqrt(dot(a, a))

  /** Top-k per query with the rank column: the candidate table is
    * heap-pruned FIRST by the native [[graft.plans.TopKPerKey]] operator
    * (bounded per-key heaps, map-side partial, NO sort of the candidate
    * table — the shuffle moves ≤ partitions×queries×k rows), then the
    * ≤ queries×k survivors get their `rn` from a window that now ranks a
    * tiny input. Row-identical to ranking the full candidate table:
    * (cos desc, vec_id asc) is a total order per query — (qid, vec_id)
    * is unique — so the heap keeps exactly the window's rn ≤ k rows.
    * The direct window form sorted EVERY candidate row: at ×100 scale
    * the probe join can emit ~10⁸ rows into a handful of map partitions
    * (broadcast join preserves the scan's partitioning) and the
    * window's map-side group-limit sort spill-merged one such partition
    * for ~45 min on one core (r7, measured) — the heap pass is
    * single-scan, spill-free, and order-insensitive.
    */
  private[graft] def topK(cos: DataFrame, k: Int): DataFrame = {
    val pruned = graft.plans.TopK.perKey(cos, Seq("qid"),
      Seq(("cos", false), ("vec_id", true)), k)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    pruned.withColumn("rn", row_number().over(w).cast("long"))
      .select(col("qid"), col("vec_id"), col("cos"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** Brute-force cosine top-k: every `queryMod`-th vector against ALL
    * vectors — the exact baseline an ANN index is judged against. One scan
    * of the vector table; the query batch rides along as a broadcast.
    */
  def bruteForceTopK(emb: DataFrame, queryMod: Int, k: Int): DataFrame = {
    val base = emb.select(col("vec_id"), expr(scaled("embedding")).as("ie"))
      .withColumn("nv", norm("ie"))
    val queries = base.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("ie").as("qe"), col("nv").as("qn"))
    val cos = base.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        (dot("ie", "qe") / (col("qn") * col("nv"))).as("cos"))
    topK(cos, k)
  }

  /** Sign-LSH bucket: concatenated sign bits of the first `nBits`
    * dimensions (axis-aligned random-projection hashing). 2^nBits buckets.
    */
  def signBucket(emb: DataFrame, nBits: Int): DataFrame = {
    val bits = (1 to nBits).map { d =>
      when(expr(s"element_at(embedding, $d)") >= 0, lit("1")).otherwise(lit("0"))
    }
    emb.withColumn("bucket", concat(bits: _*))
  }

  /** LSH-bucketed ANN: neighbors searched only within the query's sign
    * bucket — the 100 TB path (bucket is the join/partition key; each
    * query meets ~N/2^bits candidates instead of N).
    */
  def lshTopK(emb: DataFrame, queryMod: Int, k: Int, nBits: Int = 4): DataFrame = {
    val base = signBucket(emb, nBits)
      .select(col("vec_id"), col("bucket"), expr(scaled("embedding")).as("ie"))
      .withColumn("nv", norm("ie"))
    val queries = base.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("bucket"),
        col("ie").as("qe"), col("nv").as("qn"))
    val cos = base.join(broadcast(queries), "bucket")
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        (dot("ie", "qe") / (col("qn") * col("nv"))).as("cos"))
    topK(cos, k)
  }

  /** One trained centroid, collected to the driver: id, quantized-mean
    * scaled-long vector, norm. The set is BOUNDED by the index parameter
    * `nCells` (8 here; thousands at 100 TB — still kilobytes), which is
    * what makes the driver-side collect sanctioned: every production IVF
    * implementation ships its centroid codebook to the planner.
    */
  private[graft] case class Cent(cid: Long, ce: Seq[Long], cn: Double)

  private def collectCents(df: DataFrame): Seq[Cent] =
    df.select(col("cid").cast("long"), col("ce"), col("cn")).collect()
      .map(r => Cent(r.getLong(0), r.getSeq[Long](1), r.getDouble(2)))
      .toSeq.sortBy(_.cid)

  /** Cosine of the `ie` column against one LITERAL centroid vector —
    * the same LongArrayDot codegen loop as the pair path, with the
    * centroid as a constant array operand.
    */
  private def cosLit(c: Cent): Column = {
    import org.apache.spark.sql.GraftBridge
    (GraftBridge.column(graft.functions.LongArrayDot(
      GraftBridge.expression(col("ie")), GraftBridge.expression(lit(c.ce.toArray))))
      .cast("double") / 1.0e8) / (col("nv") * c.cn)
  }

  /** Cell ASSIGNMENT as a pure projection: argmax over the literal
    * centroids as ONE linear expression — `array_max` over (cos, −cid)
    * structs, so the max cosine wins and ties go to the LOWEST cid
    * (highest −cid), matching the previous window formulation's
    * `orderBy(ccos desc, cid)` exactly (incl. NaN-greatest doubles).
    * Each cosine is evaluated exactly once; a when-chain fold was tried
    * first and is a trap: `getField(CaseWhen)` is expanded by
    * SimplifyExtractValueOps into a CaseWhen of getFields, doubling the
    * tree per centroid — exponential in nCells. This projection
    * replaced a crossJoin(broadcast(centroids)) +
    * Window.partitionBy(vec_id), which shuffled nCells× the vector
    * table PER LLOYD ROUND — now only the nCells-row mean aggregate
    * exchanges data (A/B in PERF.md).
    *
    * Codebooks LARGER than [[HierThreshold]] dispatch to the two-level
    * coarse quantizer [[withCellHier]] — flat O(nCells) dots per row is
    * exactly IVF-flat's published assignment cost and goes quadratic
    * when corpus and codebook grow together (the r6 ScaleSmoke measured
    * 174× at 10×-data/10×-cells); the hierarchical path is
    * O(√nCells) per row, the same flat-vs-IMI/HNSW coarse-quantizer
    * switch FAISS makes at large nlist. Oracle-replayed configs all
    * sit at nCells = 8 ≤ threshold, so their assignment stays
    * bit-identical to the flat argmax the DuckDB oracle replays.
    */
  private[graft] def withCell(df: DataFrame, cents: Seq[Cent]): DataFrame =
    if (cents.size > HierThreshold) withCellHier(df, cents)
    else {
      val arr = array(cents.map(c =>
        struct(cosLit(c).as("c"), lit(-c.cid).as("negcell"))): _*)
      df.withColumn("cell", (-array_max(arr).getField("negcell")).cast("long"))
    }

  /** Codebook size above which assignment goes two-level. */
  private[graft] val HierThreshold = 16

  /** Driver-side grouping of the codebook into ~√nCells super-cells:
    * the same deterministic Lloyd discipline as [[trainedLit]] run in
    * plain Scala over the nCells centroid points (seed = lowest-cid
    * centroids, cosine argmax with ties to the lowest super index,
    * half-away-quantized means). Pure function of the codebook —
    * deterministic, and microseconds of driver work for any realistic
    * nCells.
    */
  private[graft] def groupCents(cents: Seq[Cent], nSupers: Int,
      iters: Int = 2): Seq[(Cent, Seq[Cent])] = {
    def dotL(a: Seq[Long], b: Seq[Long]): Double =
      a.lazyZip(b).map(_ * _).sum / 1e8
    def normL(a: Seq[Long]): Double = math.sqrt(dotL(a, a))
    def assign(supers: Seq[(Seq[Long], Double)]): Map[Int, Seq[Cent]] =
      cents.groupBy { c =>
        supers.zipWithIndex.map { case ((sv, sn), si) =>
          (dotL(c.ce, sv) / (c.cn * sn), -si)
        }.max._2 * -1
      }
    def meanQ(ms: Seq[Cent]): Seq[Long] =
      (0 until Dims).map { j =>
        val d = ms.map(_.ce(j)).sum.toDouble / ms.size
        BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
    var supers = cents.sortBy(_.cid).take(nSupers)
      .map(c => (c.ce, c.cn))
    for (_ <- 1 to iters) {
      supers = assign(supers).toSeq.sortBy(_._1).map { case (_, ms) =>
        val m = meanQ(ms); (m, normL(m))
      }
    }
    assign(supers).toSeq.sortBy(_._1).map { case (si, ms) =>
      val (sv, sn) = supers(si)
      (Cent(si.toLong, sv, sn), ms)
    }
  }

  /** Two-level cell assignment, still a pure no-shuffle projection:
    * stage 1 argmaxes over the ~√nCells super-centroids, stage 2 over
    * the member cells of the chosen super only — O(√nCells + |members|)
    * ≈ 2√nCells dot products per row. The codebook rides ONE referenced
    * [[graft.functions.CodebookModel]] object and the generated code is
    * a single compiled-method call — constant source size in nCells.
    * (Two r7 dead ends, kept for the record: unrolling the argmax as a
    * literal expression tree cost ~20 s of Janino compilation PER STAGE
    * at nCells = 80, and forcing that tree interpreted traded the
    * compile bomb for ~90 s of boxed tree-walking; the method call is
    * compile-free AND JIT-compiled.) Approximate like every
    * hierarchical coarse quantizer: a vector whose true-best cell lives
    * in a different super than its best super-centroid lands one cell
    * over — the standard IMI trade-off, only taken above
    * [[HierThreshold]] where the oracle never looks.
    */
  private[graft] def withCellHier(df: DataFrame, cents: Seq[Cent]): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    df.withColumn("cell", GraftBridge.column(graft.functions.CodebookCellHier(
      GraftBridge.expression(col("ie")), GraftBridge.expression(col("nv")),
      buildModel(cents))))
  }

  /** [[graft.functions.CodebookModel]] over this codebook: centroids
    * ascending by cid, supers from the same deterministic [[groupCents]]
    * grouping the expression form used (ties → lowest index, exact
    * cosine arithmetic `(dot/1e8)/(nv·cn)` — bit-identical semantics).
    */
  private def buildModel(cents: Seq[Cent]): graft.functions.CodebookModel = {
    val sorted = cents.sortBy(_.cid)
    val idxOf = sorted.zipWithIndex.map { case (c, i) => c.cid -> i }.toMap
    val nSupers = math.max(2, math.round(math.sqrt(cents.size.toDouble)).toInt)
    val groups = groupCents(cents, nSupers)
    graft.functions.CodebookModel(
      sorted.map(_.cid).toArray,
      sorted.map(_.ce.toArray).toArray,
      sorted.map(_.cn).toArray,
      groups.map(_._1.ce.toArray).toArray,
      groups.map(_._1.cn).toArray,
      groups.map(_._2.map(c => idxOf(c.cid)).sorted.toArray).toArray)
  }


  /** Ranks 1..`maxRank` of the literal centroids per row (ties → lowest
    * cid) — the multi-probe cell list. Explode + window over
    * nCells×|df| rows: only ever applied to the QUERY subset, never the
    * full corpus (assignment is [[withCell]]'s projection).
    */
  private def withCellRanks(df: DataFrame, cents: Seq[Cent], maxRank: Int): DataFrame = {
    if (cents.size > HierThreshold) {
      // Same compile-bomb rule as assignment: above the threshold the
      // probe list comes from the compiled-method CodebookTopCells call
      // (identical rank semantics: global cosine order, ties → lowest
      // cid) — and posexplode of the ranked array replaces the
      // explode-all + window, dropping a per-query-row sort exchange.
      import org.apache.spark.sql.GraftBridge
      val probes = GraftBridge.column(graft.functions.CodebookTopCells(
        GraftBridge.expression(col("ie")), GraftBridge.expression(col("nv")),
        buildModel(cents), maxRank))
      df.select(col("vec_id"), col("ie"), col("nv"),
          posexplode(probes).as(Seq("pos", "cell")))
        .select(col("vec_id"), col("ie"), col("nv"), col("cell"),
          (col("pos") + 1).cast("int").as("arn"))
    } else {
      val arr = array(cents.map(c =>
        struct(cosLit(c).as("ccos"), lit(c.cid).as("cell"))): _*)
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cc.ccos").desc, col("cc.cell"))
      df.select(col("vec_id"), col("ie"), col("nv"), explode(arr).as("cc"))
        .withColumn("arn", row_number().over(w))
        .filter(col("arn") <= maxRank)
        .select(col("vec_id"), col("ie"), col("nv"), col("cc.cell").as("cell"), col("arn"))
    }
  }

  /** Elementwise-mean centroids of an assignment, quantized back to the
    * scaled-long domain so one arithmetic (and one oracle formulation)
    * covers vectors and centroids alike: per cell and dimension,
    * `round_half_away(Σ ie_j / n)` via a double→decimal(16,0) cast (both
    * engines round half away from zero; Σ < 2^53 so the double is
    * exact). 64 tiny sum aggregates — map-side partials, nCells×64 longs
    * of state, no position-explode of the vector table.
    */
  private def meanCentroids(assigned: DataFrame): DataFrame = {
    val sums = (1 to Dims).map(j =>
      sum(expr(s"try_element_at(ie, $j)")).as(s"s$j")) :+ count(lit(1)).as("cnt")
    val meanCols = (1 to Dims).map { j =>
      coalesce(
        expr(s"CAST(CAST(CAST(s$j AS DOUBLE) / cnt AS DECIMAL(16,0)) AS BIGINT)"),
        lit(0L))
    }
    assigned.groupBy(col("cell"))
      .agg(sums.head, sums.tail: _*)
      .select(col("cell").as("cid"), array(meanCols: _*).as("ce"))
      .withColumn("cn", norm("ce"))
  }

  /** IVF (inverted-file) ANN: k-means cells + multi-probe search. Seeding
    * is deterministic (the `nCells` lowest-id vectors), then `lloydIters`
    * Lloyd iterations (assign to max-cosine centroid → recompute
    * quantized-mean centroids — empty cells drop out), then the final
    * assignment; each query searches its `nProbe` closest cells (its own
    * plus the next nProbe−1 by centroid cosine — single-probe missed
    * ~70% of true neighbors on the synthetic data because near-boundary
    * neighbors land one cell over; the shipped c12 config is 6 probes of
    * 8 cells, recall ≥ 0.9 asserted, swept in IvfSweep). Every step is
    * exact scaled-long
    * arithmetic, so the DuckDB oracle replays the training loop
    * bit-for-bit. The centroid codebook is collected to the driver
    * (bounded by nCells) and assignment is a literal-centroid codegen
    * projection; the cell id is the join key, so at 100 TB each query
    * touches ~nProbe·N/nCells vectors — the recall/cost dial every IVF
    * index exposes (recall floor asserted in SimilaritySpec).
    *
    * Scaling: coarse assignment against a codebook larger than
    * [[HierThreshold]] rides the two-level quantizer ([[withCellHier]]
    * — O(√nCells) dots per row instead of the flat O(nCells) whose
    * corpus×codebook co-growth the r6 ScaleSmoke measured at ~100× the
    * work for a 10×-data/10×-cells step); oracle-replayed configs sit
    * at nCells = 8 and keep the flat bit-exact argmax. At real scale
    * train/assign INCREMENTALLY via the persisted IvfIndexLayout (the
    * production path: the full-corpus assignment happens once, appends
    * assign against the stored codebook).
    */
  /** Default Lloyd training subsample modulus: rounds train on the
    * `vec_id % trainMod == 0` subsample (assignment of the FULL corpus
    * happens once, after training) — every production system trains its
    * codebook on a sample because a per-round full scan is wrong at
    * 100 TB; the modulus is a pure function of the id, so the DuckDB
    * oracle replays the same sample (mirrored in
    * [[graft.queries.ExtOps.kmeansCtes]]). Seeds stay the `nCells`
    * lowest ids of the full corpus. Modulus 2 holds the c12 recall
    * floors (6/8 probes: ≥ 0.9 at sf0.001/0.01, ≥ scan-fraction at
    * sf0.1 where near-uniform vectors bound recall at ~0.85 — swept
    * with correctly-per-dataset codebooks in IvfSweep r6; mod 4
    * measures in the same band, the floor is data-bound not
    * sample-bound at these sizes).
    * At 100 TB pass the modulus explicitly and scale it WITH the
    * corpus: what matters for codebook quality is the absolute sample
    * size per cell (~10⁴–10⁵ vectors/cell is the published IVF rule of
    * thumb), so a 10¹¹-row corpus with 10⁵ cells wants trainMod on the
    * order of 10²–10³, not 2 (and the persisted IvfIndexLayout is the
    * production path anyway — train once, assign incrementally).
    */
  val TrainSampleMod = 2

  /** Codebooks are deterministic functions of (input dataset, nCells,
    * lloydIters, trainMod), so one training run serves every query of a
    * session that clusters the same embeddings — c12/c31/c34/c56/c66
    * share one Lloyd loop instead of five. Bounded: nCells×64 longs per
    * entry.
    */
  /** LRU-bounded (32 entries): VALUES are tiny (nCells×64 longs) but a
    * KEY for an in-memory input retains the full analyzed LogicalPlan
    * (row-inclusive for LocalRelation) — unbounded key growth across a
    * long session would be a leak, so the eldest entry is evicted.
    */
  private val centCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(AnyRef, Int, Int, Int), Seq[Cent]](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(AnyRef, Int, Int, Int), Seq[Cent]]): Boolean =
        size() > 32
    })

  /** Cache identity of a training input. The canonicalized plan STRING
    * alone is NOT enough: canonicalization strips data-identifying
    * detail (a parquet scan prints `Relation [none#0L,...] parquet`
    * with no path; a LocalRelation omits its rows), so two same-schema
    * datasets would collide and the second would silently reuse the
    * first's codebook — the exact bug IvfSweep's cross-sf loop hid
    * until r6. For file-backed plans the identity is (canonical plan
    * string — it carries pushed filters/projections distinguishing two
    * reads of the same files — plus the sorted input file list with
    * each file's length and mtime): same files+filters ⇒ same training
    * problem; rewritten files ⇒ new key. One driver-side FileStatus
    * call per input file, the same order of work as the listing Spark
    * already did to plan the scan. In-memory plans (LocalRelation test
    * fixtures) carry no file identity and instead key on the analyzed
    * plan OBJECT: LogicalPlan case-class equality is structural and
    * row-inclusive for LocalRelation, so equal keys really hold the
    * same data — never a false hit, at worst a redundant retrain.
    */
  private def datasetKey(df: DataFrame): AnyRef = {
    val analyzed = df.queryExecution.analyzed
    val files = df.inputFiles
    if (files.isEmpty) analyzed
    else {
      val hconf = df.sparkSession.sessionState.newHadoopConf()
      analyzed.canonicalized.toString + "\n@@\n" + files.sorted.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        val fs = p.getFileSystem(hconf)
        val st = fs.getFileStatus(p)
        // (len, mtime) alone misses a same-length in-place rewrite
        // inside the FS's mtime granularity; fold in the FS checksum /
        // etag where the filesystem exposes one (HDFS block checksums,
        // object-store etags via their Hadoop connectors). Local FS
        // returns null — len+mtime-millis remains the identity there.
        val ck = Option(fs.getFileChecksum(p))
          .map(c => ":" + c.getBytes.map("%02x".format(_)).mkString)
          .getOrElse("")
        s"$f:${st.getLen}:${st.getModificationTime}$ck"
      }.mkString("\n")
    }
  }

  /** Deterministically seeded Lloyd training shared by the IVF index,
    * SemDeDup and the cluster profile: returns (base, centroids). Each
    * round collects the nCells mean rows to the driver (bounded by the
    * index parameter — the rounding arithmetic stays in Spark, so the
    * oracle replay is untouched) and the next round's assignment is a
    * literal-centroid projection: per round, ONE scan of the training
    * sample + one nCells×64-long aggregate, no crossjoin, no window, no
    * checkpoint. `trainMod` is the training-subsample rate (see
    * [[TrainSampleMod]] for the 100 TB sizing guidance).
    */
  private[graft] def trainedLit(emb: DataFrame, nCells: Int, lloydIters: Int,
      trainMod: Int = TrainSampleMod): (DataFrame, Seq[Cent]) = {
    val base = emb.select(col("vec_id"), expr(scaled("embedding")).as("ie"))
      .withColumn("nv", norm("ie"))
    val key = (datasetKey(base), nCells, lloydIters, trainMod)
    // Training runs OUTSIDE the cache's monitor (get → train →
    // putIfAbsent): computeIfAbsent on a synchronizedMap would hold the
    // map lock for the whole multi-job Lloyd loop, serializing
    // concurrent sessions that train on DIFFERENT datasets. The race is
    // benign — training is deterministic (seeded, ordered ties), so two
    // concurrent trainers for the same key produce identical codebooks
    // and putIfAbsent keeps exactly one.
    val cached = centCache.get(key)
    val cents = if (cached != null) cached else {
      val train = base.filter(col("vec_id") % trainMod === 0)
      val seed = collectCents(base.filter(col("vec_id") < nCells)
        .select(col("vec_id").as("cid"), col("ie").as("ce"), col("nv").as("cn")))
      val trained = (1 to lloydIters).foldLeft(seed) { (c, _) =>
        collectCents(meanCentroids(withCell(train, c)))
      }
      // Above the oracle threshold, fill empty slots by splitting the
      // largest cells (the standard empty-cell reassignment every
      // production k-means/IVF trainer performs) — ≤ 16-cell codebooks
      // keep the exact drop-out semantics the DuckDB oracle replays.
      val computed =
        if (nCells > HierThreshold && trained.size < nCells)
          reseedEmpty(train, trained, nCells)
        else trained
      val prev = centCache.putIfAbsent(key, computed)
      if (prev != null) prev else computed
    }
    (base, cents)
  }

  /** Deterministic empty-slot reassignment (the FAISS
    * `Clustering::post_process_centroids` idea, public): for up to FOUR
    * rounds while slots are empty, split the most-populated cells — the
    * member FARTHEST from its centroid (min cosine; ties → lowest
    * vec_id) becomes the seed of a missing cid — then run one polish
    * Lloyd iteration. The polish pass can re-empty a freshly seeded
    * slot, so the bounded loop may exit with a codebook still short of
    * `nCells`; that residual is not silent — it is reported on stderr
    * (below) so a scale log can distinguish a full codebook from a
    * partially filled one. Near-uniform
    * data with adjacent-id seeding leaves half the slots empty (r7
    * measured 409 of 800 at ×100 scale — and probe candidate mass
    * carries the resulting skew: top cells held 23× the balanced
    * population), so this is what makes `nCells`-grows-with-corpus a
    * real dial rather than a nominal one. Deterministic: every pick is
    * ordered (pop desc, cell asc / missing cid asc), so the codebook is
    * a pure function of the data — the cache key needs no change. All
    * driver state is ≤ nCells rows per round.
    */
  private def reseedEmpty(train: DataFrame, cents0: Seq[Cent],
      nCells: Int): Seq[Cent] = {
    import org.apache.spark.sql.GraftBridge
    var cents = cents0
    var round = 0
    while (cents.size < nCells && round < 4) {
      val model = buildModel(cents)
      val missing = (0L until nCells.toLong)
        .filterNot(cents.map(_.cid).toSet).sorted
      val cellCol = GraftBridge.column(graft.functions.CodebookCellHier(
        GraftBridge.expression(col("ie")), GraftBridge.expression(col("nv")),
        model))
      val assigned = train.withColumn("cell", cellCol)
      val ccCol = GraftBridge.column(graft.functions.CodebookCos(
        GraftBridge.expression(col("ie")), GraftBridge.expression(col("nv")),
        GraftBridge.expression(col("cell")), model))
      // per cell: population + farthest member id (one distributed pass,
      // ≤ |cents| result rows)
      val far = assigned.withColumn("cc", ccCol)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("pop"), min(struct(col("cc"), col("vec_id"))).as("fm"))
        .select(col("cell"), col("pop"), col("fm.vec_id").as("fid"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val splitFrom = far.filter(_._2 >= 2).sortBy { case (cell, pop, _) => (-pop, cell) }
      val picks = missing.zip(splitFrom.map(_._3))
      if (picks.isEmpty) {
        reportResidual(cents, nCells)
        return cents
      }
      val seedRows = train.filter(col("vec_id").isin(picks.map(_._2): _*))
        .select(col("vec_id"), col("ie"), col("nv")).collect()
        .map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getDouble(2)))).toMap
      cents = (cents ++ picks.collect {
        case (cid, fid) if seedRows.contains(fid) =>
          val (ce, cn) = seedRows(fid); Cent(cid, ce, cn)
      }).sortBy(_.cid)
      cents = collectCents(meanCentroids(withCell(train, cents)))
      round += 1
    }
    reportResidual(cents, nCells)
    cents
  }

  /** Stderr note when reseeding exits below the requested codebook size
    * — callers and scale logs can tell a partial codebook from a full
    * one without re-deriving the count.
    */
  private def reportResidual(cents: Seq[Cent], nCells: Int): Unit =
    if (cents.size < nCells)
      System.err.println(s"[graft] reseedEmpty: codebook has ${cents.size} " +
        s"of $nCells requested cells after bounded reseeding " +
        s"(${nCells - cents.size} slots remain empty)")

  /** Final cell assignment (vec_id → cell) after Lloyd training — the
    * join surface for cross-modal cluster analysis (see c34).
    */
  def cellAssignments(emb: DataFrame, nCells: Int = 8, lloydIters: Int = 2,
      trainMod: Int = TrainSampleMod): DataFrame = {
    val (base, cents) = trainedLit(emb, nCells, lloydIters, trainMod)
    withCell(base, cents)
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
  }

  def ivfTopK(emb: DataFrame, queryMod: Int, k: Int, nCells: Int = 8,
      lloydIters: Int = 2, nProbe: Int = 3,
      trainMod: Int = TrainSampleMod): DataFrame = {
    val (base, cents) = trainedLit(emb, nCells, lloydIters, trainMod)
    // Full-corpus side: assignment is a pure projection (no shuffle).
    val assigned = withCell(base, cents)
    // One row per (query, probed cell): rank ≤ nProbe. A neighbor appears
    // at most once per query — it lives in exactly one rank-1 cell. The
    // explode+window ranking touches only the query subset.
    val queries = withCellRanks(
        base.filter(col("vec_id") % queryMod === 0), cents, nProbe)
      .select(col("vec_id").as("qid"), col("cell"), col("ie").as("qe"), col("nv").as("qn"))
    val cos = assigned.join(broadcast(queries), "cell")
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        (dot("ie", "qe") / (col("qn") * col("nv"))).as("cos"))
    topK(cos, k)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    * k-means-cluster the embedding space, then WITHIN each cluster drop
    * every vector that has a higher-priority (lower vec_id) cluster-mate
    * with cosine above `tau` — pairwise comparison never crosses a
    * cluster boundary, which is the whole trick: the O(n²) semantic
    * pair space shrinks to Σ|cell|², and at 100 TB `nCells` scales WITH
    * the corpus so cell sizes stay bounded (the published recipe: cells
    * ≈ N/target_cell_size; here it is an explicit knob). Training reuses
    * the c12 IVF Lloyd loop — deterministic seeding, quantized-mean
    * centroids, exact scaled-long arithmetic — so the DuckDB oracle
    * replays clustering AND the drop decision bit-for-bit. Returns one
    * row per cell: population and number dropped.
    */
  def semDedup(emb: DataFrame, nCells: Int = 8, lloydIters: Int = 2,
      tau: Double = 0.42, trainMod: Int = TrainSampleMod): DataFrame = {
    val (base, cents) = trainedLit(emb, nCells, lloydIters, trainMod)
    // Final assignment feeds three consumers (both pair sides + the per-
    // cell census) — materialize once so the scan+projection runs once.
    // r13 checkpoint audit: measured a WASH at 10× (0.455 s vs 0.449
    // without — ScanShapeAb ckptab); kept because `assigned` has no
    // exchange beneath it, so without the checkpoint each consumer
    // re-reads the embedding parquet — at 100 TB that is 3× the scan
    // I/O, the one cost the bench-scale wash cannot see.
    val assigned = withCell(base, cents).localCheckpoint(true)
    val pairs = assigned
      .select(col("cell"), col("vec_id").as("va"), col("ie").as("ia"), col("nv").as("na"))
      .join(assigned.select(col("cell"), col("vec_id").as("vb"),
        col("ie").as("ib"), col("nv").as("nb")), "cell")
      .filter(col("va") < col("vb"))
      .select(col("cell"), col("vb"),
        (dot("ia", "ib") / (col("na") * col("nb"))).as("cos"))
    val drops = pairs.filter(col("cos") > tau)
      .select(col("cell"), col("vb")).distinct()
    assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_vecs"))
      .join(drops.groupBy(col("cell")).agg(count(lit(1)).as("n_dropped")),
        Seq("cell"), "left")
      .select(col("cell").cast("long").as("cell"), col("n_vecs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
      .orderBy(col("cell"))
  }

  /** kNN label-agreement scan (label-noise detection, in the spirit of
    * published confident-learning/cleanlab pipelines): for every vector,
    * the share of its k nearest cluster-mates that carry the SAME label
    * — exact cosine WITHIN the vector's k-means cell (the SemDeDup
    * cell-bounding trick, so the pair space is Σ|cell|², never O(n²)).
    * Per label: vectors scored, pooled agreement Σagree·1000 div Σnn
    * (exact integer permille — ratio of sums, robust to vectors with
    * fewer than k cell-mates), and suspects (agreement < 2/5 by integer
    * cross-multiply — likely mislabels). Cosines are computed once per
    * unordered pair and mirrored by a union; per-vector top-k rides the
    * TopKPerKey heap operator, never a sort of the pair table. A vector
    * alone in its cell has no neighbors and drops out of the readout
    * (documented, not silent: n_vecs counts SCORED vectors). At 100 TB
    * nCells scales with the corpus so cells stay bounded, and training
    * reuses the deterministic c12 Lloyd loop — the DuckDB oracle
    * replays clustering, neighbor ranking, and the flag bit-for-bit.
    */
  def knnLabelAgreement(emb: DataFrame, k: Int = 5, nCells: Int = 8,
      lloydIters: Int = 2, trainMod: Int = TrainSampleMod): DataFrame = {
    val (base, cents) = trainedLit(emb, nCells, lloydIters, trainMod)
    val assigned = withCell(base, cents)
      .join(emb.select(col("vec_id"), col("label").cast("long").as("label")), "vec_id")
      .localCheckpoint(true)
    val half = assigned
      .select(col("cell"), col("vec_id").as("va"), col("ie").as("ia"), col("nv").as("na"))
      .join(assigned.select(col("cell"), col("vec_id").as("vb"),
        col("ie").as("ib"), col("nv").as("nb")), "cell")
      .filter(col("va") < col("vb"))
      .select(col("va"), col("vb"),
        (dot("ia", "ib") / (col("na") * col("nb"))).as("cos"))
    val sym = half.union(
      half.select(col("vb").as("va"), col("va").as("vb"), col("cos")))
    val nn = graft.plans.TopK.perKey(sym, Seq("va"), Seq("cos" -> false, "vb" -> true), k)
    val lab = assigned.select(col("vec_id"), col("label"))
    val perVec = nn
      .join(lab.select(col("vec_id").as("va"), col("label").as("la")), "va")
      .join(lab.select(col("vec_id").as("vb"), col("label").as("lb")), "vb")
      .groupBy(col("va"), col("la"))
      .agg(count(lit(1)).as("nn"),
        sum(when(col("lb") === col("la"), 1L).otherwise(0L)).as("agree"))
    perVec.groupBy(col("la"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("CAST(sum(agree) * 1000 div sum(nn) AS BIGINT)").as("agree_pml"),
        sum(when(col("agree") * 5 < col("nn") * 2, 1L).otherwise(0L)).as("n_suspect"))
      .select(col("la").as("label"), col("n_vecs"), col("agree_pml"), col("n_suspect"))
      .orderBy(col("label"))
  }

  /** Int8-quantized brute-force ANN — the MEMORY-scale path: each vector
    * becomes 64 bytes of per-vector-scaled int8 (q_i = round_half_away(
    * x_i·127 / max|x|)) — 4× smaller than float32, 8× smaller than the
    * scaled-long exact path, which at 100 TB is the difference between
    * an index that fits executor memory and one that doesn't. Cosine
    * over the quantized values approximates true cosine (recall vs the
    * exact c5 baseline asserted in SimilaritySpec); every arithmetic
    * step (double multiply/divide, half-away decimal cast, integer dot,
    * IEEE division) is replayed bit-for-bit by the oracle. The
    * quantization transform is a one-pass per-VECTOR HOF (not on the
    * pair path — pairs run the native LongArrayDot loop on the int8
    * values). Zero vectors (scale 0) are excluded on both sides.
    */
  def quantizedTopK(emb: DataFrame, queryMod: Int, k: Int): DataFrame = {
    val base = emb
      .withColumn("scale",
        expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
      .filter(col("scale") > 0)
      .select(col("vec_id"), expr(
        "transform(embedding, x -> " +
          "CAST(CAST(CAST(x AS DOUBLE) * 127 / scale AS DECIMAL(16,0)) AS BIGINT))")
        .as("ie"))
      .withColumn("nv", norm("ie"))
    val queries = base.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("ie").as("qe"), col("nv").as("qn"))
    val cos = base.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        (dot("ie", "qe") / (col("qn") * col("nv"))).as("cos"))
    topK(cos, k).withColumnRenamed("cos", "qcos")
  }

  /** Product quantization (PQ) ANN — the memory-scale path PAST c28's
    * scalar int8: the 64-dim vector splits into `nSub` subvectors, each
    * encoded as the id of its nearest subspace centroid (min exact L2
    * over scaled longs), so a vector stores as `nSub` small ints —
    * 8 bytes/vector at the default nSub=8/nCent=16 (4 bits each),
    * 32× smaller than float32. Search is
    * asymmetric distance (ADC): per query, a tiny nSub×k lookup table
    * of exact subspace distances; a candidate's approximate distance is
    * the sum of its codes' table entries — here a flat codegen CASE
    * chain, no join wider than the (broadcast) query batch. Training
    * reuses the literal-centroid Lloyd discipline per subspace
    * (driver-collected codebooks, bounded by nSub·k rows). Everything
    * is exact integer/scaled-long arithmetic; SimilaritySpec measures
    * recall against the exact c5 baseline and asserts the floor.
    */
  /** Trained PQ codebooks: `codebooks(s)(c)` is centroid c of subspace
    * s (scaled-long subvectors). Bounded driver state like [[Cent]]:
    * nSub·nCent rows.
    */
  private[graft] case class PqModel(nSub: Int, codebooks: Seq[Seq[Seq[Long]]]) {
    val subDims: Int = Dims / nSub

    /** Subvector s of the `ie` column (dims s·subDims+1 ..). */
    private def subCol(s: Int): Column =
      expr(s"slice(ie, ${s * subDims + 1}, $subDims)")

    private def sq(v: Seq[Long]): Long = v.map(x => x * x).sum

    private[Similarity] def dotLit(c: Column, ce: Seq[Long]): Column = {
      import org.apache.spark.sql.GraftBridge
      GraftBridge.column(graft.functions.LongArrayDot(
        GraftBridge.expression(c), GraftBridge.expression(lit(ce.toArray))))
    }

    private def selfSq(c: Column): Column = {
      import org.apache.spark.sql.GraftBridge
      GraftBridge.column(graft.functions.LongArrayDot(
        GraftBridge.expression(c), GraftBridge.expression(c)))
    }

    /** Exact squared L2 between a subvector column and a literal
      * centroid: ||x||² − 2·x·c + ||c||², scaled-long domain.
      */
    private[Similarity] def d2(c: Column, ssq: Column, ce: Seq[Long]): Column =
      ssq - lit(2L) * dotLit(c, ce) + lit(sq(ce))

    /** code_s = argmin exact L2 over subspace s's codebook (ties →
      * lowest centroid id: struct(d, i) under array_min needs no
      * negation, contrast [[withCell]]'s max).
      */
    def codeCol(s: Int): Column = {
      val sv = subCol(s)
      val arr = array(codebooks(s).zipWithIndex.map { case (ce, i) =>
        struct(d2(sv, selfSq(sv), ce).as("d"), lit(i.toLong).as("c"))
      }: _*)
      array_min(arr).getField("c").as(s"code$s")
    }

    def codeCols: Seq[Column] = (0 until nSub).map(codeCol)

    /** Per-query ADC lookup columns: d(q_s, centroid c) for every
      * (s, c) — the nSub×nCent table a PQ query ships instead of its
      * vector.
      */
    def queryDistCols: Seq[Column] =
      for (s <- 0 until nSub; c <- codebooks(s).indices) yield {
        val sv = subCol(s)
        d2(sv, selfSq(sv), codebooks(s)(c)).as(s"q_${s}_$c")
      }

    /** ADC distance: Σ_s table[s][code_s] — a flat codegen CASE chain
      * over code columns + query table columns.
      */
    def adcExpr: Column = (0 until nSub).map { s =>
      codebooks(s).indices.foldLeft(lit(0L)) { (acc, c) =>
        when(col(s"code$s") === c.toLong, col(s"q_${s}_$c")).otherwise(acc)
      }
    }.reduce(_ + _)
  }

  /** Train per-subspace PQ codebooks over `base(vec_id, ie)` — the
    * literal-centroid Lloyd discipline per subspace (min exact L2,
    * quantized means, deterministic lowest-id seeding).
    */
  private[graft] def trainPq(base: DataFrame, nSub: Int, nCent: Int,
      lloydIters: Int): PqModel = {
    require(Dims % nSub == 0, "subspaces must tile the dimensions")
    val subDims = Dims / nSub
    val m0 = PqModel(nSub, Seq.fill(nSub)(Nil))
    def subExpr(s: Int) = expr(s"slice(ie, ${s * subDims + 1}, $subDims)")
    val codebooks = (0 until nSub).map { s =>
      var cents: Seq[Seq[Long]] = base.filter(col("vec_id") < nCent)
        .select(col("vec_id"), subExpr(s).as("sv")).collect()
        .sortBy(_.getLong(0)).map(_.getSeq[Long](1).toSeq).toSeq
      for (_ <- 1 to lloydIters) {
        val withSq = base.select(col("vec_id"), subExpr(s).as("sv"))
          .withColumn("ssq", {
            import org.apache.spark.sql.GraftBridge
            GraftBridge.column(graft.functions.LongArrayDot(
              GraftBridge.expression(col("sv")), GraftBridge.expression(col("sv"))))
          })
        val arr = array(cents.zipWithIndex.map { case (ce, i) =>
          struct(m0.d2(col("sv"), col("ssq"), ce).as("d"), lit(i.toLong).as("c"))
        }: _*)
        val assigned = withSq.withColumn("code", array_min(arr).getField("c"))
        val sums = (1 to subDims).map(j =>
          sum(expr(s"try_element_at(sv, $j)")).as(s"s$j")) :+ count(lit(1)).as("cnt")
        val meanCols = (1 to subDims).map(j => coalesce(
          expr(s"CAST(CAST(CAST(s$j AS DOUBLE) / cnt AS DECIMAL(16,0)) AS BIGINT)"),
          lit(0L)))
        cents = assigned.groupBy(col("code")).agg(sums.head, sums.tail: _*)
          .select(col("code"), array(meanCols: _*).as("ce"))
          .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
          .sortBy(_._1).map(_._2).toSeq
      }
      cents
    }
    PqModel(nSub, codebooks)
  }

  def pqTopK(emb: DataFrame, queryMod: Int, k: Int, nSub: Int = 8,
      nCent: Int = 16, lloydIters: Int = 2): DataFrame = {
    val topN = k
    val base = emb.select(col("vec_id"), expr(scaled("embedding")).as("ie"))
    val model = trainPq(base, nSub, nCent, lloydIters)
    val encoded = base.select((col("vec_id") +: model.codeCols): _*)
    // queries carry their per-subspace distance tables as columns
    val queries = base.filter(col("vec_id") % queryMod === 0)
      .select((col("vec_id").as("qid") +: model.queryDistCols): _*)
    val adc = model.adcExpr
    val scored = encoded.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), adc.as("adist"))
    // PQ is a SHORTLIST generator: exact-cosine rerank of the ADC
    // top-`shortlist` per query (the production two-stage shape — the
    // compressed scan touches only codes; full vectors are fetched for
    // shortlist·|queries| rows, never the corpus).
    val shortlist = math.max(topN * 20, 100)
    val wA = Window.partitionBy(col("qid")).orderBy(col("adist"), col("vec_id"))
    val short = scored.withColumn("srn", row_number().over(wA))
      .filter(col("srn") <= shortlist)
      .select(col("qid"), col("vec_id"))
    val withNv = base.withColumn("nv", norm("ie"))
    val qVec = withNv.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("ie").as("qe"), col("nv").as("qn"))
    val cos = short.join(withNv, "vec_id").join(broadcast(qVec), "qid")
      .select(col("qid"), col("vec_id"),
        (dot("ie", "qe") / (col("qn") * col("nv"))).as("cos"))
    topK(cos, topN)
  }

  /** Sign-LSH bands: `nBands` rows per vector, each a 4-bit integer from
    * the sign bits of 4 consecutive dimensions (band b covers dims
    * 4b+1..4b+4). Two vectors are near-dup CANDIDATES iff they agree on
    * at least one whole band — the banding trick from MinHash LSH applied
    * to random-projection signs, so candidate generation is a join on
    * (label, band_id, band_value), never an all-pairs product.
    */
  def signBands(emb: DataFrame, nBands: Int): DataFrame = {
    val bandRows = (0 until nBands).map { b =>
      // try_element_at: out-of-range dims → null → ELSE 0, matching the
      // oracle's `embedding[i]` NULL semantics (and ANSI-safe for
      // shorter-than-64-dim inputs).
      val bv = (1 to 4).map { k =>
        when(expr(s"try_element_at(embedding, ${4 * b + k})") >= 0, lit(1 << (4 - k)))
          .otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(b).as("band_id"), bv.as("bv"))
    }
    emb.select(col("label"), col("vec_id"), explode(array(bandRows: _*)).as("band"))
      .select(col("label"), col("vec_id"), col("band.band_id"), col("band.bv"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`: LSH-banded
    * candidate generation (within the `label` blocking key), then exact
    * cosine verification ONLY on candidates — the same
    * candidates-then-verify shape MinHash LSH uses for text (Dedup.scala).
    *
    * At 100 TB the all-pairs-within-label join is O(n²/L) and was the
    * measured bench bottleneck; here each of the `nBands` band joins
    * meets only same-bucket rows, and the verify pass is bounded by the
    * candidate count. Recall is tunable via nBands (more bands = higher
    * recall, more candidates); 16 bands of 4 bits recalls 53/54 of the
    * all-pairs result on the synthetic data (threshold 0.42 sits barely
    * above the within-label background similarity — a hard LSH regime).
    */
  def nearDupPairs(emb: DataFrame, threshold: Double, nBands: Int = 16): DataFrame = {
    val bands = signBands(emb, nBands)
    val cands = bands.select(col("label"), col("band_id"), col("bv"), col("vec_id").as("va"))
      .join(bands.select(col("label"), col("band_id"), col("bv"), col("vec_id").as("vb")),
        Seq("label", "band_id", "bv"))
      .filter(col("va") < col("vb"))
      .select(col("label"), col("va"), col("vb"))
      .distinct()
    val base = emb.select(col("vec_id"), expr(scaled("embedding")).as("ie"))
      .withColumn("nv", norm("ie"))
    cands
      .join(base.select(col("vec_id").as("va"), col("ie").as("ea"), col("nv").as("na")), "va")
      .join(base.select(col("vec_id").as("vb"), col("ie").as("eb"), col("nv").as("nb")), "vb")
      .select(col("label"), col("va"), col("vb"),
        (dot("ea", "eb") / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") > threshold)
      .orderBy(col("cos").desc, col("va"), col("vb"))
  }
}
