package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.functions._

/** Document deduplication operators for LLM-data pipelines: MinHash+LSH
  * and SimHash near-dup detection (the exact-hash pass lives in
  * GroupB.b1). All hashing is md5-based so the DuckDB oracle can replay
  * every step bit-for-bit; at 100 TB the shapes are what matter:
  *
  *  - MinHash/LSH shuffles on (band_id, band_value) — candidate
  *    generation never materializes the O(n²) pair space;
  *  - exact Jaccard verification runs only on LSH candidates;
  *  - SimHash reduces each doc to a 64-bit fingerprint, so the
  *    bucket-groupBy shuffles 8 bytes per doc.
  */
object Dedup {

  val NumHashes: Int = graft.functions.MinHashOps.NumHashes // 8
  val NumBands: Int = graft.functions.MinHashOps.NumBands // 2 (4 minhashes per band)

  /** Distinct (doc_id, tok) postings for sampled docs. */
  def tokenPostings(docs: DataFrame, sampleMod: Int): DataFrame =
    docs.filter(col("doc_id") % sampleMod === 0)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()

  /** LSH banded rows (doc_id, band_id, bv) per sampled doc via the
    * native [[graft.functions.MinHashBands]] kernel (minhash_j =
    * min over distinct tokens of md5("<j>|" ++ tok), band = concat of 4
    * consecutive hex minhashes — string-min over lowercase hex is
    * engine-portable, binary collation both sides). One compiled pass
    * per doc: scan → kernel → band rows, NO shuffle before the
    * candidate join (r3; the postings formulation it replaces survives
    * as DedupSpec's independent model and as the DuckDB oracle).
    * Zero-token docs have no postings and no band rows (the generator
    * skips the kernel's null).
    */
  def minhashBanded(docs: DataFrame, sampleMod: Int): DataFrame =
    docs.filter(col("doc_id") % sampleMod === 0)
      .select(col("doc_id"),
        posexplode(GraftBridge.column(graft.functions.MinHashBands(
          GraftBridge.expression(col("text"))))))
      .toDF("doc_id", "band_id", "bv")

  /** LSH candidate pairs: docs sharing at least one band, with the
    * number of shared bands.
    */
  def lshCandidates(banded: DataFrame): DataFrame = {
    val a = banded.select(col("band_id"), col("bv"), col("doc_id").as("da"))
    val b = banded.select(col("band_id"), col("bv"), col("doc_id").as("db"))
    a.join(b, Seq("band_id", "bv")).filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("shared_bands"))
  }

  /** Exact token-set Jaccard on given pairs (columns da, db) — the
    * verification pass, O(candidates), not O(n²).
    */
  def verifyJaccard(pairs: DataFrame, postings: DataFrame): DataFrame = {
    val sizes = postings.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(postings.select(col("doc_id").as("da"), col("tok")), "da")
      .join(postings.select(col("doc_id").as("db"), col("tok").as("tok2")), "db")
      .filter(col("tok") === col("tok2"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    pairs.join(inter, Seq("da", "db"), "left")
      .join(sizes.select(col("doc_id").as("da"), col("sz").as("sa")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("sz").as("sb")), "db")
      .select(col("da"), col("db"), col("shared_bands"),
        (coalesce(col("inter"), lit(0L)).cast("double") /
          (col("sa") + col("sb") - coalesce(col("inter"), lit(0L)))).as("jaccard"))
  }

  /** MinHash→LSH→verify: every candidate pair with its exact Jaccard.
    * Candidate generation is shuffle-free (native banded kernel). The
    * verify pass (r3) never builds an inverted index at all: the
    * pre-r3 formulation referenced the token postings three times
    * (sizes + both intersection sides) and the candidate subtree twice
    * — Spark re-executes a shared subtree once per plan reference, so
    * that was three corpus-wide token shuffles and a doubled band join
    * per run. Here each candidate pair joins to the two docs'
    * DISTINCT-TOKEN ARRAYS (split/array_distinct/array_remove — all
    * codegen'd builtins, computed in the scan projection, no explode,
    * no shuffle wider than the docs themselves) and the exact
    * intersection is one compiled `array_intersect` per pair. The
    * candidate subtree is referenced once; what moves through the two
    * verify joins is proportional to the CANDIDATE set, and the token
    * work is a per-row compiled kernel — the 100 TB shape and the
    * fewest-stages local plan at the same time. Results are
    * bit-identical to [[verifyJaccard]] over [[tokenPostings]]
    * (DedupSpec asserts).
    *
    * r13: the token arrays carried through the verify joins hold
    * xxhash64(token) LONGS, not the token strings — Jaccard needs only
    * set sizes, so the element value is a pure INTERNAL equality key
    * (the shingleContainment collision contract applies; the oracle
    * intersects raw token text). 8-byte flat elements shuffle and
    * intersect for less than UTF8String pointers: the verify leg
    * measured 2.84 → 1.32 s at the 10× fair layout (ScanShapeAb
    * hashab), and c1/c15/c25 all ride this path.
    */
  def minhashVerified(docs: DataFrame, sampleMod: Int): DataFrame = {
    val toks = docs.filter(col("doc_id") % sampleMod === 0)
      .select(col("doc_id"),
        array_remove(array_distinct(split(col("text"), " ")), "").as("t0"))
      .select(col("doc_id"),
        transform(col("t0"), t => xxhash64(t)).as("toks"),
        size(col("t0")).cast("long").as("sz"))
    val cands = lshCandidates(minhashBanded(docs, sampleMod))
    cands
      .join(toks.select(col("doc_id").as("da"), col("toks").as("ta"), col("sz").as("sa")), "da")
      .join(toks.select(col("doc_id").as("db"), col("toks").as("tb"), col("sz").as("sb")), "db")
      .select(col("da"), col("db"), col("shared_bands"), col("sa"), col("sb"),
        size(array_intersect(col("ta"), col("tb"))).cast("long").as("inter"))
      .select(col("da"), col("db"), col("shared_bands"),
        (col("inter").cast("double") /
          (col("sa") + col("sb") - col("inter"))).as("jaccard"))
  }

  /** Top-50 most similar pairs (the c1 declared query). */
  def minhashLsh(docs: DataFrame, sampleMod: Int): DataFrame =
    minhashVerified(docs, sampleMod)
      .orderBy(col("jaccard").desc, col("da"), col("db"))
      .limit(50)

  /** Near-duplicate GROUPS: connected components over the verified
    * near-dup edges (Jaccard ≥ `minJaccard`), labeled by the component's
    * minimum doc_id. This is the step that turns pairwise similarity
    * into the keep-one-per-group decision an LLM-data dedup pipeline
    * actually needs.
    *
    * Implementation is iterative min-label propagation (the pregel-style
    * formulation: each round every node takes the min of its own and its
    * neighbors' labels) run to FIXPOINT, with per-round checkpointing and
    * a single changed-row count to the driver per round. Rounds needed =
    * component diameter; the label table shuffles on doc_id each round —
    * the 100 TB shape (no driver-side union-find, no edge collection).
    * The DuckDB oracle reaches the same fixpoint by recursive transitive
    * closure — min-label CC is iteration-order independent, so the two
    * formulations provably agree.
    */
  def dedupGroups(docs: DataFrame, sampleMod: Int, minJaccard: Double): DataFrame =
    dedupLabels(docs, sampleMod, minJaccard)
      .groupBy(col("label").as("component"))
      .agg(count(lit(1)).as("n_docs"),
        concat_ws(",", sort_array(collect_list(col("doc_id").cast("string")))).as("doc_ids"))
      .filter(col("n_docs") > 1)
      .orderBy(col("component"))

  /** Per-doc component labels (doc_id, label) for every edge-incident
    * doc — the join-back surface a keep-one-per-group pipeline needs
    * (see c25). Docs with no near-dup edge are absent (singleton
    * components).
    */
  def dedupLabels(docs: DataFrame, sampleMod: Int, minJaccard: Double): DataFrame = {
    val edges = minhashVerified(docs, sampleMod)
      .filter(col("jaccard") >= minJaccard)
      .select(col("da"), col("db"))
      .localCheckpoint(true)
    // Label propagation runs over edge ENDPOINTS only: a node with no
    // edge is a singleton component and the final n_docs > 1 filter drops
    // it, so looping over the whole corpus would be pure waste. At 100 TB
    // this is the load-bearing shape — per-round cost tracks the (small)
    // near-dup graph, not corpus size.
    val nbrs = edges.select(col("da").as("doc_id"), col("db").as("nbr"))
      .union(edges.select(col("db").as("doc_id"), col("da").as("nbr")))
    // Round 1 fused into initialization: label₀ = min(self, min neighbor)
    // comes straight off the edge list — the same aggregation dedups the
    // endpoint set, so there is no separate nodes-distinct shuffle and
    // the loop starts one round further along (pair/clique components —
    // the common case — converge without entering it at all).
    var labels = nbrs.groupBy(col("doc_id"))
      .agg(least(col("doc_id"), min(col("nbr"))).as("label"))
      .localCheckpoint(true)
    var changed = 1L
    while (changed > 0) {
      val nbrMin = nbrs
        .join(labels.select(col("doc_id").as("nbr"), col("label").as("nl")), "nbr")
        .groupBy(col("doc_id")).agg(min(col("nl")).as("nbr_min"))
      // The convergence flag rides along in the same pass (no extra
      // old-vs-new join): a row changed iff a neighbor's label undercut
      // its own.
      val next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          (col("nbr_min") < col("label")).as("chg"))
        .localCheckpoint(true)
      changed = next.filter(col("chg")).count()
      labels.unpersist()
      labels = next.drop("chg")
    }
    labels
  }

  /** 64-bit SimHash fingerprint per doc via the native
    * [[graft.functions.SimHash64]] expression: one compiled loop per doc
    * inside whole-stage codegen — no token explode, no 64-column
    * aggregation, no shuffle (r3; the declarative 64-sum formulation it
    * replaces survives as DedupSpec's independent model and as the DuckDB
    * oracle). Docs with no tokens are dropped, matching the explode-based
    * row set.
    */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        GraftBridge.column(graft.functions.SimHash64(
          GraftBridge.expression(col("text")))).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** SimHash collision buckets (Hamming distance 0): near-dup groups.
    * At 64 bits only true near-dups collide — 2^64 buckets discriminate
    * at corpus scale (the 16-bit version saturated at 65k buckets);
    * Hamming>0 neighborhoods are [[simhashNearDup]]'s banded join.
    */
  def simhashBuckets(docs: DataFrame): DataFrame =
    simhash(docs)
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("n_docs"),
        concat_ws(",", sort_array(collect_list(col("doc_id").cast("string")))).as("doc_ids"))
      .filter(col("n_docs") > 1)
      .orderBy(col("simhash"))

  /** The 4 × 16-bit bands of the 64-bit SimHash (band k covers bits
    * 16k+1..16k+16, each band a non-negative int < 2^16 — no sign-bit
    * arithmetic anywhere near the band values). Bands are plain bit
    * slices of the fingerprint: band k = (fp >>> 16k) & 0xFFFF.
    */
  def simhashBands(docs: DataFrame): DataFrame = {
    val bandCols = (0 until 4).map { k =>
      expr(s"shiftrightunsigned(simhash, ${16 * k}) & 65535").as(s"b$k")
    }
    simhash(docs).select(col("doc_id") +: bandCols: _*)
  }

  /** INCREMENTAL SimHash near-dup: new batch docs against an existing
    * corpus — the shape periodic ingest needs (the near-dup twin of
    * c21's exact incremental anti-join). Both sides fingerprint
    * independently (a corpus bands table would be precomputed/persisted
    * in production — fingerprints depend only on each doc's text, so
    * splitting changes nothing); candidates are batch×corpus pairs
    * sharing a 16-bit band (full recall ≤ Hamming 3 by pigeonhole),
    * verified with exact popcounts on candidates only. Returns
    * (da = batch doc, db = corpus doc, hamming).
    */
  def incrementalNearDup(corpus: DataFrame, batch: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming=$maxHamming exceeds the 4-band recall guarantee (max 3)")
    val cb = simhashBands(corpus).localCheckpoint(true)
    val bb = simhashBands(batch).localCheckpoint(true)
    val cBanded = cb.selectExpr("doc_id AS db", BandStackSql)
    val bBanded = bb.selectExpr("doc_id AS da", BandStackSql)
    val cand = bBanded.join(cBanded, Seq("band_id", "bv"))
      .select(col("da"), col("db")).distinct()
    verifyHamming(cand, bb, cb, maxHamming)
      .orderBy(col("da"), col("db"))
  }

  /** THE one SQL spelling of the 4-band (band_id, bv) explode of a
    * bands table — every banded candidate join (batch and streaming)
    * must use it so band count/width can never silently diverge.
    */
  private[graft] val BandStackSql =
    "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band_id, bv)"

  /** Exact Hamming distance between band vectors projected as
    * (a0..a3) and (e0..e3) — the verify expression shared with the
    * streaming ingest gate.
    */
  private[graft] def hammingExpr: Column = (0 until 4)
    .map(k => bit_count(col(s"a$k").bitwiseXOR(col(s"e$k"))).cast("long"))
    .reduce(_ + _)

  /** Shared verify step of the banded SimHash joins: join the (da, db)
    * candidate pairs back to their band tables and keep pairs whose
    * exact popcount Hamming distance is ≤ `maxHamming`. Unordered —
    * callers append their own total ORDER BY.
    */
  private def verifyHamming(
      cand: DataFrame, leftBands: DataFrame, rightBands: DataFrame,
      maxHamming: Int): DataFrame = {
    val left = leftBands.select(col("doc_id").as("da"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val right = rightBands.select(col("doc_id").as("db"), col("b0").as("e0"),
      col("b1").as("e1"), col("b2").as("e2"), col("b3").as("e3"))
    cand.join(left, "da").join(right, "db")
      .select(col("da"), col("db"), hammingExpr.as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash near-duplicate pairs at Hamming distance ≤ `maxHamming`:
    * candidates share at least one whole 16-bit band (by pigeonhole, any
    * pair within Hamming ≤ 3 agrees on ≥1 of 4 bands — FULL recall up to
    * 3), verified with an exact per-band popcount on candidates only.
    * The band join shuffles (band_id, value) keys — the pair space is
    * bounded by band-bucket sizes, never O(n²).
    */
  def simhashNearDup(docs: DataFrame, maxHamming: Int): DataFrame = {
    // 4 bands guarantee a shared band only up to Hamming 3 (pigeonhole);
    // beyond that the candidate set would be silently incomplete.
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming=$maxHamming exceeds the 4-band recall guarantee (max 3); " +
        "use more/narrower bands for larger radii")
    // The bands table is consumed three times (band explosion + both
    // sides of the verify join-back); without materialization each use
    // recomputes the full token scan + 64-sum aggregation. The table is
    // tiny (one row of 5 longs per doc) — checkpoint it once.
    val bands = simhashBands(docs).localCheckpoint(true)
    val banded = bands.selectExpr("doc_id", BandStackSql)
    val cand = banded.select(col("band_id"), col("bv"), col("doc_id").as("da"))
      .join(banded.select(col("band_id"), col("bv"), col("doc_id").as("db")),
        Seq("band_id", "bv"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"))
      .distinct()
    verifyHamming(cand, bands, bands, maxHamming)
      .orderBy(col("hamming"), col("da"), col("db"))
  }

  /** Character-shingle (3-gram) Jaccard over sampled docs — the n-gram
    * flavor of near-dup detection; pair space bounded by the sample.
    */
  /** Shingle document-frequency cap (the b2 discipline applied to
    * character shingles): a common trigram posts in ~every doc, making
    * the postings self-join quadratic at corpus scale. Shingles above
    * the cap drop from the universe (sizes AND intersections), bounding
    * pairs to ≤ |shingle vocab|·CAP². No-op at the local SFs (≤ 200
    * sampled docs); mirrored in the oracle.
    */
  val ShingleDfCap = 256

  /** DIRECTED containment (subsumption) report: pairs (da → db) where at
    * least `tauX1000`/1000 of da's 4-token-shingle set also appears in
    * db — the ASYMMETRIC twin of [[shingleJaccard]]. An excerpt, a
    * quoted block, or a superset page scores near-1 containment at low
    * Jaccard, which is exactly the inclusion case a symmetric threshold
    * misses (both directions emit independently: A-in-B and B-in-A are
    * different findings). Shingles ride the native TokenNgrams kernel;
    * the same [[ShingleDfCap]] bounds the postings self-join; the
    * threshold is the integer cross-multiply inter·1000 ≥ τ·|A| and the
    * reported score is inter·1000 div |A| — exact at any corpus size.
    */
  /** The shingle key is xxhash64(shingle) — an INTERNAL equality key
    * only (every output column is a count or doc id, never a hash
    * value), so the 64-bit non-crypto hash replaces the r12-era md5:
    * ~20× cheaper per row and 8-byte instead of 16-byte shuffle keys —
    * measured at the 10× fair layout under the shipped AQE-on config,
    * 8.03 → 4.92 s end-to-end together with the checkpoint removal
    * below (ScanShapeAb hashab, both orderings). The oracle keys on its
    * own md5 — equality classes agree as long as EACH side is
    * collision-free, which the oracle gate verifies per fixture. A
    * 64-bit key stays collision-free w.h.p. to ~10⁹ distinct shingles
    * (birthday: P ≈ n²/2⁶⁵, ~3% at n=10⁹). THE 100 TB CONTRACT, stated
    * so the approximation is a recorded decision: at ~10¹² distinct
    * shingles the expected number of colliding key PAIRS is n²/2⁶⁵ ≈
    * 2.7·10⁴ — ~10⁴ spurious shingle-equalities spread across 10¹²
    * keys. A collision can only ADD to an intersection count, never
    * remove (two genuinely-equal shingles always hash equal), so for
    * the threshold queries riding this key (c55's ≥ 80% containment,
    * c57's ≥ 50% boilerplate line, c27's df-capped overlap counts) the
    * perturbation is one-sided and ≤ 10⁴/10¹² ≈ 10⁻⁸ relative — far
    * below the integer threshold granularity; a borderline pair can
    * only cross INTO the report, and the odds any single doc pair gains
    * even one phantom shared shingle are ~10⁻⁸. A corpus past that
    * tolerance swaps the one hash expression back to a 128-bit digest
    * — the key's width is the only thing the plan cares about.
    *
    * `materialize = true` restores the r12-era shingle-table
    * localCheckpoint; OFF is the default since r13: the distinct's
    * consumers share its shuffle via ReusedExchange (the c27/c70
    * full-row-cache-vs-pruned-work lesson, PERF.md r13), re-measured
    * here at 10×/AQE-on: md5 8.03 s (ckpt) vs 8.00 (reuse), xxh64 5.43
    * vs 4.92.
    */
  def shingleContainment(docs: DataFrame, tauX1000: Int, k: Int = 50,
      materialize: Boolean = false): DataFrame = {
    // Per-doc shingle-SET semantics via array_distinct INSIDE the row
    // (late r13): a (doc_id, sh) duplicate can only come from the same
    // shingle repeating within one document, so deduplicating the
    // n-gram array before explode is exactly the old corpus-wide
    // `.distinct()` — minus its full n-gram-table exchange + hash
    // aggregate, the largest shuffle in the query. Interleaved A/B at
    // 10× (ScanShapeAb c55ab, 5 alternating passes): 7.73 → 3.90 s
    // median, with run-to-run spread collapsing too (6.7–8.7 → 3.8–4.0);
    // table build alone 0.95 → 0.19 s. The trade is a second
    // scan+explode (census side no longer shares the distinct's
    // exchange), which costs ~0.14 s at sf0.1 (1.20 → 1.34) and is why
    // c27/c57 — whose downstreams are lighter relative to their 8-gram
    // scans — measured a wash and KEEP their corpus distinct. Same
    // xxhash64 collision contract as below: string dedup vs hash dedup
    // diverge only on an intra-doc 64-bit collision.
    // r14 shape (ScanShapeAb c55v4, row-identity require()d before
    // timing): the r13 spelling referenced the df-join subtree three
    // times (sizes + both self-join sides) and — the real waste — sent
    // every df=1 posting (the overwhelming majority) through BOTH sides
    // of the pair join only to produce da==db rows the filter discards.
    // Here the pair machinery runs ONLY on postings whose shingle has
    // df in [2, cap]: census, the shared-keys semi join and both
    // self-join sides all ride ONE sh-keyed exchange (every operator's
    // required distribution is hashpartitioning(sh) — ReusedExchange
    // collapses them), so what crosses the wire twice is the genuinely
    // SHARED posting set, not the corpus. Sizes leave the posting path
    // entirely (the c57 decomposition discipline): size_a = the in-row
    // distinct-shingle count (a second TokenNgrams scan over the pruned
    // text column — measured cheaper than a posting-mass groupBy) minus
    // the doc's few df>cap postings, which fall out of the same census.
    // 10× A/B (AQE-off, same session): shipped-r13 3.68–8.74 s across
    // runs vs 1.73 s for this shape; the collect_list-array variant of
    // the same idea read 2.97 s (ObjectHashAggregate tax) and the
    // self-pair-sizes variant 6.28 s (df=1 self-pairs through the pair
    // exchange) — both rejected, spellings preserved in ScanShapeAb.
    val sh1x = docs
      .select(col("doc_id"),
        explode(array_distinct(org.apache.spark.sql.GraftBridge.column(
          graft.functions.TokenNgrams(
            org.apache.spark.sql.GraftBridge.expression(col("text")),
            n = 4, maxStarts = Int.MaxValue, skipEmpty = true)))).as("g0"))
      .select(col("doc_id"), xxhash64(col("g0")).as("sh"))
    val sh1 = if (materialize) sh1x.localCheckpoint(true) else sh1x
    val census = sh1.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val shared = census
      .filter(col("df") >= 2 && col("df") <= ShingleDfCap)
      .select(col("sh"))
    // shuffle_hash pinned (the b12 broadcast-kills-the-ride lesson,
    // re-measured here): AQE sees `shared` under the broadcast
    // threshold and converts this join, which discards p2's
    // hashpartitioning(sh) and forces BOTH self-join sides through
    // fresh corpus-wide exchanges — bench-default A/B read 3.2 s
    // broadcast vs 1.8 s pinned at 10×. At 100 TB the pin is the only
    // admissible shape anyway: `shared` is the pair-forming shingle
    // vocabulary and scales with the corpus.
    val p2 = sh1.join(shared.hint("shuffle_hash"), "sh")
    val pairs = p2.select(col("doc_id").as("da"), col("sh"))
      .join(p2.select(col("doc_id").as("db"), col("sh")), "sh")
      .filter(col("da") =!= col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    val docLevel = docs.select(col("doc_id"),
      size(array_distinct(org.apache.spark.sql.GraftBridge.column(
        graft.functions.TokenNgrams(
          org.apache.spark.sql.GraftBridge.expression(col("text")),
          n = 4, maxStarts = Int.MaxValue, skipEmpty = true))))
        .cast("long").as("n_sh"))
    val capCnt = sh1.join(
        census.filter(col("df") > ShingleDfCap).select(col("sh"))
          .hint("shuffle_hash"), "sh")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_cap"))
    val sizes = docLevel.join(capCnt, Seq("doc_id"), "left")
      .select(col("doc_id").as("da"),
        (col("n_sh") - coalesce(col("n_cap"), lit(0L))).as("size_a"))
    pairs.join(sizes, "da")
      .filter(col("inter") * 1000 >= lit(tauX1000.toLong) * col("size_a"))
      .select(col("da"), col("db"), col("inter"), col("size_a"),
        expr("inter * 1000 div size_a").as("containment_x1000"))
      .orderBy(col("containment_x1000").desc, col("da"), col("db"))
      .limit(k)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS algorithm): hash every k-token shingle, slide a w-position
    * window over the hash SEQUENCE, record each window's minimum hash;
    * the distinct recorded hashes are the doc's fingerprint set. The
    * property MinHash/SimHash cannot give: any shared token run of
    * length ≥ w+k−1 is GUARANTEED to yield a shared fingerprint (every
    * such run contains a full window, and equal windows select equal
    * minima), while only ~2/(w+1) of all shingle hashes are kept. Docs
    * shorter than one window keep the minimum of what they have (the
    * truncated first window), so no non-empty doc fingerprints to ∅.
    *
    * Returns distinct (doc_id, fp). Shapes for 100 TB: shingles ride the
    * native TokenNgrams kernel, the min-select is a per-doc window
    * (partitions bounded by DOC length, never corpus size), and the
    * output is ~|doc|/(w/2) rows of 32-byte hashes — the only thing that
    * ever shuffles. Hashes are md5 hex; string-min over lowercase hex is
    * engine-portable, so the DuckDB oracle replays the selection
    * bit-for-bit.
    */
  def winnowFingerprints(docs: DataFrame, k: Int = 4, w: Int = 8): DataFrame =
    // ONE kernel pass per document (late r13): tokenize → shingle → md5
    // → sliding min → per-doc distinct all inside
    // [[graft.functions.WinnowFingerprints]], replacing the relational
    // spelling (posexplode → md5 → per-doc window min → filter starts →
    // corpus distinct) whose WindowExec sorted the corpus-sized
    // (doc_id, pos) shingle table and whose distinct exchanged it.
    // Bit-identity with the relational spelling — which the DuckDB
    // oracle still runs — is asserted per fixture in WinnowOpsSpec
    // (and transitively by the c68 oracle row); a (doc_id, fp)
    // duplicate can only arise within one document, so the in-kernel
    // distinct is exactly the old corpus-wide one (the c55 argument).
    docs.select(col("doc_id"),
      explode(GraftBridge.column(graft.functions.WinnowFingerprints(
        GraftBridge.expression(col("text")), k, w))).as("fp"))

  def shingleJaccard(docs: DataFrame, sampleMod: Int, k: Int = 20): DataFrame = {
    // Positions capped at 2047 (matches the oracle's constant range — a
    // prefix-window bound, like fingerprinting the first ~2 KB); texts
    // under 3 chars have no shingles (sequence() would DESCEND for a
    // negative span — the length filter is load-bearing).
    // Materialized once (the c55 discipline): feeds the df cap and the
    // capped join below.
    val shingles0 = docs.filter(col("doc_id") % sampleMod === 0)
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"),
        explode(expr("sequence(1, least(length(text) - 2, 2047))")).as("i"), col("text"))
      .select(col("doc_id"), expr("substring(text, i, 3)").as("sh"))
      .distinct()
      .localCheckpoint(true)
    val shingles = shingles0.join(
      shingles0.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= ShingleDfCap).select(col("sh")),
      "sh")
    val sizes = shingles.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = shingles.select(col("doc_id").as("da"), col("sh"))
    val b = shingles.select(col("doc_id").as("db"), col("sh"))
    a.join(b, "sh").filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("da"), col("sz").as("sa")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("sz").as("sb")), "db")
      .select(col("da"), col("db"),
        (col("inter").cast("double") / (col("sa") + col("sb") - col("inter"))).as("jaccard"))
      .orderBy(col("jaccard").desc, col("da"), col("db"))
      .limit(k)
  }
}
