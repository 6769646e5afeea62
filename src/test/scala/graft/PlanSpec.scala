package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: the properties PERF.md claims are
  * asserted here against the actual physical plans, so a refactor that
  * silently loses a pushdown, broadcasts the wrong side, or reintroduces
  * an all-pairs join fails CI instead of only showing up in the bench.
  */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("b4 pricing: shipdate filter reaches the parquet scan; columns pruned") {
    val p = plan("b4_pricing_summary")
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"),
      "shipdate predicate must be pushed to the scan")
    assert(!p.contains("l_comment"), "untouched wide columns must not be read")
  }

  test("b5 top revenue: broadcast join + TakeOrderedAndProject, no global sort") {
    val p = plan("b5_top_revenue")
    assert(p.contains("BroadcastHashJoin"), "dimension side must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-10 must not globally sort")
  }

  test("c4 near-dup: banded candidate join, no cartesian/nested-loop product") {
    val p = plan("c4_embed_neardup")
    assert(!p.contains("CartesianProduct"), "all-pairs join must not come back")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "candidates must join on band keys, not a nested-loop filter")
  }

  test("c5 brute force is the one sanctioned cross join (documented exact baseline)") {
    val p = plan("c5_ann_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"),
      "c5 IS the intentional exact baseline — if this changed, update PERF.md")
  }

  test("b9 local supplier volume: date filter pushed, no cartesian in the 6-way join") {
    val p = plan("b9_local_supplier_volume")
    assert(p.contains("PushedFilters:") && p.contains("o_orderdate"),
      "order-date range must reach the orders scan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "all six relations must join on equi-keys")
    assert(p.contains("BroadcastHashJoin"), "the nation⋈region dim must broadcast")
  }

  test("b10 promo share: part join is key-equi, lineitem scan pruned to 3 columns") {
    val p = plan("b10_promo_share")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("l_shipdate") && !p.contains("l_quantity"),
      "lineitem scan must prune to partkey + price + discount")
  }

  test("d7 edit distance: inverted-index blocking, no all-pairs join on lang alone") {
    val p = plan("d7_edit_distance")
    // the candidate join must carry the token key, not just lang
    assert(p.contains("tok"), "blocking token must be a join key")
    assert(!p.contains("CartesianProduct"))
  }

  test("b2 jaccard: document-frequency cap filters the posting lists") {
    val p = plan("b2_jaccard_pairs")
    assert(p.contains(s"<= ${queries.GroupB.B2_DF_CAP}"),
      "df cap must bound every token's posting list (stop-word quadratic blow-up)")
    assert(!p.contains("CartesianProduct"))
  }

  test("c20 packing: running sum is bucketed, no full-corpus per-lang window") {
    // sparkPlan, not executedPlan: the AdaptiveSparkPlanExec wrapper
    // hides the tree from collect() until execution.
    val p = SparkEntry.queries("c20_pack_plan")(spark, dir)
      .queryExecution.sparkPlan
    // every Window over the full docs relation must carry the bucket key;
    // a lang-only partition spec is allowed only on the tiny bucket-total
    // (offset) window, whose child aggregates to ≤ max_doc_id/1024 rows.
    val windows = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "the prefix sum must still be a window")
    // at least one window must carry the bucket key (the doc-level local
    // cumsum), and any window WITHOUT it must run over bucket-level rows
    // (its child aggregates on the bucket key) — "child contains some
    // aggregate" is not enough: a groupBy(doc_id) feeding a lang-only
    // window would pass that vacuously while still serializing per lang.
    assert(windows.exists(_.partitionSpec.exists(_.toString.contains("bkt"))),
      "doc-level cumsum must partition by (lang, bkt)")
    val langOnly = windows.filterNot(_.partitionSpec.exists(_.toString.contains("bkt")))
    assert(langOnly.forall(w =>
      w.child.toString.contains("HashAggregate") && w.child.toString.contains("bkt")),
      "a lang-only window may only run over per-bucket aggregates")
  }

  test("c26 vocab coverage: ranked cumsum is range-partitioned, no single-task window") {
    val q = SparkEntry.queries("c26_vocab_coverage")(spark, dir)
    val p = q.queryExecution.sparkPlan
    val windows = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "the ranked cumsum must still be a window")
    // a Window with an empty partitionSpec is WindowExec's "moving all
    // data to a single partition" path — a web-scale vocab through one
    // task. Every window must carry the range-partition id.
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "no window may run unpartitioned; the vocab ranking must ride the " +
        "range-partition id")
    assert(p.toString.toLowerCase.contains("rangepartitioning"),
      "the vocab must be range-partitioned on the sort key so local " +
        "ranks + a 32-row offset table reconstruct the global rank")
  }

  test("c51 ts similarity: banded candidate join above the cap, no all-pairs product") {
    // The SCALE path (population forced past the brute-force cap): the
    // pair space must come from the (band_id, band_value) equi-join.
    val ev = queries.Tables.load(spark, dir, "events")
    val p = graft.operators.TimeSeries.topKSimilarPairs(ev, 20, bruteCap = 0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "the user-pair space must come from the band-bucket join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "candidates must join on (band_id, band_value) equi-keys")
    assert(p.contains(s"<= ${operators.TimeSeries.BandBucketCap}"),
      "overfull band buckets must be dropped (the flat-profile zero " +
        "bucket makes the pair space quadratic without the cap)")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must ride a bounded heap, not a global sort")
    // The declared query at sf0.001 sits under BruteForceUserCap and
    // takes the exact branch (covered by the sweep allowlist below).
    assert(plan("c51_ts_similar_users").contains("TakeOrderedAndProject"))
  }

  test("d7 edit distance: blocking tokens are df-capped") {
    val p = plan("d7_edit_distance")
    assert(p.contains(s"<= ${queries.Relational.D7_DF_CAP}"),
      "hot blocking tokens must be dropped, else one block is quadratic")
  }

  test("d11 interval join: bucketed equi-join, not a nested-loop range join") {
    val p = plan("d11_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range predicate must ride a bucket equi-join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "bucket key must be an equi-join key")
  }

  test("c3 shingle jaccard: shingle universe is df-capped") {
    val p = plan("c3_shingle_jaccard")
    assert(p.contains(s"<= ${operators.Dedup.ShingleDfCap}"),
      "common trigrams must be dropped, else their postings join is quadratic")
  }

  test("c55 containment: shingle universe df-capped; n-grams on the native kernel") {
    // materialize=false: the production checkpoint hides the upstream
    // (scan + kernel) behind an RDD scan — inspect the full lineage
    import graft.queries.Tables
    val p = operators.Dedup
      .shingleContainment(Tables.load(spark, dir, "documents"), 800, 50,
        materialize = false)
      .queryExecution.executedPlan.toString
    assert(p.contains(s"<= ${operators.Dedup.ShingleDfCap}"),
      "boilerplate shingles must drop, else their postings join is quadratic")
    assert(p.contains("token_ngrams"), "shingles must ride the TokenNgrams kernel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("b7c nearest as-of: two merge scans, no window, no nested loop") {
    val p = plan("b7c_asof_nearest")
    assert("MergeAsOf".r.findAllIn(p).size >= 2,
      "both directions must run the custom merge-scan operator")
    assert(!p.contains("WindowExec"),
      "no join-then-window formulation may reappear")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("c56 diverse sample: per-cell quota rides the TopKPerKey heap") {
    val p = plan("c56_diverse_sample")
    assert(p.contains("TopKPerKey"),
      "the rn<=quota draw must plan as bounded heaps, not a per-cell sort")
  }

  test("c54 fluency: count tables join on the bigram key — no cartesian") {
    val p = plan("c54_fluency_score")
    assert(p.contains("token_ngrams"), "bigrams must ride the TokenNgrams kernel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("similarity dot products stay native (no interpreted higher-order functions)") {
    val p = plan("c4_embed_neardup") + plan("c5_ann_brute") + plan("c6_ann_lsh")
    assert(p.contains("long_array_dot"), "LongArrayDot must power the dot products")
    assert(!p.toLowerCase.contains("zip_with"),
      "zip_with on the pair path = CodegenFallback regression")
  }

  test("b8 big orders: fact scan pruned, no global sort, no forced broadcast") {
    val p = plan("b8_big_orders")
    assert(p.contains("TakeOrderedAndProject"), "top-30 must not globally sort")
    assert(!p.contains("l_discount"), "lineitem scan must read only orderkey+quantity")
    // no broadcast() hint on the aggregate side: at 100 TB the HAVING
    // set exceeds the broadcast limit — AQE may still CHOOSE broadcast
    // at runtime when the set is actually small (that's the point).
    assert(!SparkEntry.queries("b8_big_orders")(spark, dir)
      .queryExecution.logical.toString.contains("UnresolvedHint"),
      "join strategy must be left to the optimizer/AQE")
  }

  test("b11 nation volume: nation-pair filter reaches the dim scans; no cartesian") {
    val p = plan("b11_nation_volume")
    assert(p.contains("PushedFilters:") && p.contains("n_name"),
      "the IN (pair) predicate must be pushed to the nation scan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("BroadcastHashJoin"), "nation must broadcast into supplier/customer")
  }

  test("b12 waiting suppliers: one orderkey backbone — the per-order aggregates " +
      "ride the shuffled join's partitioning, no semi/anti self-joins") {
    val p = plan("b12_waiting_suppliers")
    assert(p.contains("ShuffledHashJoin"),
      "lineitem⋈orders must shuffle on orderkey (a broadcast orders side " +
        "strands the downstream aggregates without a useful distribution " +
        "and cannot exist at 100 TB anyway)")
    assert(!p.contains("LeftSemi") && !p.contains("LeftAnti"),
      "the EXISTS/NOT-EXISTS pair is order-level arithmetic (≥2 distinct " +
        "suppliers, exactly 1 late) — self-joins re-scan lineitem 3×")
    // the backbone exchange feeds join + BOTH aggregates: lineitem,
    // orders, and the final tiny s_name rollup are the only shuffles.
    // Counted with a regex over the raw node name, NOT split-on-prefix:
    // split drops a trailing match and misses an Exchange rendered
    // without a tree-branch prefix, silently weakening the upper bound.
    assert("Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
        .findAllMatchIn(p).size <= 3,
      "the (orderkey,suppkey) and (orderkey) aggregates must reuse the " +
        "join's hash partitioning, not re-exchange")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("c27 contamination: train-side n-gram postings are df-capped") {
    val p = plan("c27_contamination")
    assert(p.contains(s"<= ${queries.ExtOps.C27_DF_CAP}"),
      "boilerplate 8-grams must be dropped, else one hot n-gram is quadratic")
    assert(!p.contains("CartesianProduct"))
  }

  test("d9 latest event: window formulation planned as the TopKPerKey heap operator") {
    val p = plan("d9_latest_event")
    assert(p.contains("TopKPerKey"),
      "RowNumberTopKRewrite must turn the rn=1 filter into the heap operator")
    assert(!p.contains("WindowExec") && !p.contains("WindowGroupLimit"),
      "no window machinery may remain under the rewrite")
  }

  test("b1 exact dedup: aggregation is partial (map-side combine) on the hash") {
    val p = plan("b1_exact_dedup")
    assert(p.contains("HashAggregate"), "dedup must hash-aggregate, not sort")
  }

  test("c39 centroids: exploded elements partial-aggregate before the shuffle") {
    val p = plan("c39_label_centroids")
    assert(p.contains("Generate") && p.contains("posexplode"),
      "elements must come from posexplode, not a per-dim self-join")
    assert(p.contains("HashAggregate"), "the (label, dim) sums must hash-aggregate")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      "centroid aggregation is a pure aggregate — no join may appear")
  }

  test("c40 outlier filter: per-lang quartile table joins broadcast") {
    val p = plan("c40_outlier_filter")
    assert(p.contains("BroadcastHashJoin"),
      "the tiny per-lang fence table must broadcast, not shuffle the corpus")
  }

  test("b13 top supplier per part: argmax plans as the TopKPerKey heap") {
    val p = plan("b13_part_top_supplier")
    assert(p.contains("TopKPerKey"),
      "the rn=1 filter over the aggregate must ride RowNumberTopKRewrite")
    assert(!p.contains("WindowExec") && !p.contains("WindowGroupLimit"),
      "no per-part sort machinery may remain")
  }

  test("c36 bloom join: fact scan probes the bloom before the join shuffle") {
    val p = plan("c36_bloom_join")
    assert(p.contains("bloom_might_contain"),
      "the lineitem side must carry the Bloom probe filter")
    // the probe must sit under the join, i.e. appear in a Filter node,
    // and the join itself must still be an equi-join (exact downstream)
    assert(p.contains("Join") || p.contains("HashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("c45 HLL: registers partial-aggregate map-side; frame cross is the tiny Range") {
    val p = plan("c45_hll_distinct")
    assert(p.contains("partial_max"),
      "the register max must combine map-side before its exchange")
    assert(!p.contains("CartesianProduct"),
      "the (groups × buckets) frame must broadcast (Range build side), not cartesian")
    assert(p.contains("Range"), "the bucket frame comes from a Range, not a scan")
  }

  test("c46 snapshot diff: only (id, md5) crosses the full-outer join") {
    val p = plan("c46_snapshot_diff")
    assert(p.contains("FullOuter"), "diff must be one full-outer join")
    assert(p.contains("md5"), "content must reduce to md5 below the join exchange")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("c52 mixture: 1-row corpus total broadcasts; per-source aggs partial") {
    val p = plan("c52_mixture_weights")
    assert(p.contains("BroadcastExchange"),
      "the 1-row total must broadcast (like c19's nDf), not shuffle")
    assert(p.contains("HashAggregate"),
      "the per-source token sums must hash-aggregate map-side")
  }

  test("c53 rarity: df joins by token key — no cartesian, no nested loop") {
    val p = plan("c53_rarity_score")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "token→df must be a keyed join; the vocab table never nested-loops")
    assert(p.contains("HashAggregate"),
      "df and per-doc sums must hash-aggregate (map-side partials)")
  }

  test("b14 order priority: EXISTS runs as a left-semi join, date filter pushed") {
    val p = plan("b14_order_priority")
    assert(p.contains("LeftSemi"),
      "the correlated EXISTS must be a semi join — never a join+distinct")
    assert(p.contains("PushedFilters:") && p.contains("o_orderdate"),
      "the quarter filter must reach the orders scan")
  }

  test("b15 forecast revenue: pure scan-and-aggregate, every predicate pushed") {
    val p = plan("b15_forecast_revenue")
    assert(!p.contains("Join"), "Q6 must not join anything")
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"),
      "the shipdate range must reach the parquet scan")
    assert(!p.contains("l_orderkey") && !p.contains("l_tax"),
      "scan must prune to the 4 touched columns")
  }

  test("b19 important suppliers: scalar total broadcasts; threshold has no division") {
    val p = plan("b19_important_suppliers")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 1-row global total must broadcast, never shuffle the per-supplier aggregate")
    assert(!p.contains("CartesianProduct"))
  }

  test("b21 custdist: zero-order customers survive via left outer; two aggregates") {
    val p = plan("b21_custdist")
    assert(p.contains("LeftOuter"),
      "the left join is the histogram's zero bucket — an inner join drops it")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "count-per-customer and histogram must both hash-aggregate")
  }

  test("b23 parts/suppliers: NOT IN runs as a broadcast anti join") {
    val p = plan("b23_parts_suppliers")
    assert(p.contains("LeftAnti"),
      "the complained-supplier exclusion must be an anti join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("b24 small-qty: per-part average compares cross-multiplied, partkey equi-joins") {
    val p = plan("b24_small_qty_revenue")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the avg-quantity probe must join on partkey")
  }

  test("b27 idle rich: NOT EXISTS is an anti join; balance threshold broadcasts") {
    val p = plan("b27_idle_rich_customers")
    assert(p.contains("LeftAnti"),
      "no-recent-orders must be a left-anti join on custkey")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 1-row positive-average must broadcast")
  }

  test("c58 overlap: hash self-joins are keyed, text never crosses a shuffle") {
    val p = plan("c58_cross_source_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "source-pair overlap must join on the content hash")
    assert(!p.contains("Exchange hashpartitioning(text"),
      "shuffles must carry (source, hash), never the document text")
  }

  test("c59 BPE pairs: corpus collapses to vocab before the pair explode") {
    val p = plan("c59_bpe_pairs")
    // the explode must sit ABOVE the token-count aggregate: the plan has
    // a Generate whose child subtree contains the vocab HashAggregate.
    val genIdx = p.indexOf("Generate explode")
    assert(genIdx >= 0, "pair explosion must be a Generate")
    assert(p.indexOf("HashAggregate", genIdx) >= 0,
      "vocab aggregate must feed the explode (corpus-sized explode would " +
        "multiply the corpus scan by token length)")
  }

  test("c60 calibration: candidates come from the banded join, no all-pairs") {
    val p = plan("c60_minhash_calibration")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "calibration pairs must be LSH candidates, never a cross product")
  }

  test("c62 textrank: readout joins are keyed on the token, top-30 rides a heap") {
    // (the per-round plans are truncated behind localCheckpoint — the
    // suite-wide sweep below still sees the final stage of every query)
    val p = plan("c62_textrank_keywords")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "rank ⋈ degree must be a keyed join")
    assert(p.contains("TakeOrderedAndProject"), "top-30 must not globally sort")
  }

  test("c63 purge: content closure is a semi join on the hash; text never shuffles") {
    val p = plan("c63_tombstone_purge")
    assert(p.contains("LeftSemi"),
      "the tombstone closure must plan as a left-semi join")
    assert(!p.contains("Exchange hashpartitioning(text"),
      "shuffles must carry (source, hash), never the document text")
  }

  test("c64 temperature mix: 1-row total broadcasts; per-lang aggs partial") {
    val p = plan("c64_temperature_mix")
    assert(p.contains("BroadcastExchange"),
      "the 1-row (tot_tokens, tot_w) total must broadcast, not shuffle")
    assert(p.contains("HashAggregate"),
      "per-lang token sums must hash-aggregate map-side")
  }

  /** The r8 blind spot: the suite-wide sweep banned UNPARTITIONED
    * WindowExec, but a window partitioned by a tiny-cardinality key
    * (c70's 3-value l_returnflag) over fact-sized input serializes just
    * as badly — |keys| tasks each sorting rows/|keys| of the fact table.
    * Detect it EMPIRICALLY on the optimized logical plan: for every
    * Window, count the child's rows and the partition key's distinct
    * values at this SF; ≥ 2000 rows with ≥ 256 rows per key means the
    * window's parallelism is key-bounded, not cluster-bounded. Bounded
    * inputs (per-bucket histograms, samples) pass the row floor or the
    * named allowlist below; a window keyed by spark_partition_id is
    * cluster-bounded by construction but still must be allowlisted by
    * name (c26) so the permission stays exact.
    */
  private def tinyKeyWindowOffenders(
      df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.GraftBridge
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.nonEmpty =>
        val child = GraftBridge.ofRows(spark, w.child)
        val rows = child.count()
        if (rows < 2000) None
        else {
          val keys = child
            .select(w.partitionSpec.map(GraftBridge.column): _*)
            .distinct().count()
          if (rows / math.max(keys, 1L) >= 256)
            Some(s"window over $rows rows with $keys partition-key values " +
              s"(spec: ${w.partitionSpec.mkString(", ")})")
          else None
        }
    }.flatten
  }

  test("the tiny-key window detector flags a planted 3-key window over lineitem") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    val planted = queries.Tables.load(spark, dir, "lineitem")
      .withColumn("rn", row_number().over(
        W.partitionBy("l_returnflag").orderBy("l_extendedprice")))
    assert(tinyKeyWindowOffenders(planted).nonEmpty,
      "a row_number partitioned by 3-value l_returnflag over the fact " +
        "table must be flagged — the detector has gone blind")
  }

  test("suite-wide plan hygiene: no cartesian, no unhinted nested loop, no global window") {
    // The whole declared inventory, not hand-picked queries: any product
    // join or single-partition window that sneaks into ANY query fails
    // here. Two allowlists, each entry justified:
    val productAllowed = Set(
      "c5_ann_brute" // THE documented exact yardstick — intentional cross join
    )
    // 1-row (or few-row, size-bounded-by-construction) broadcast scalars
    // joined without keys plan as BroadcastNestedLoopJoin — bounded and
    // intentional: global totals / thresholds / corpus-level constants.
    val scalarBroadcastAllowed = Set(
      "b19_important_suppliers", // 1-row global value total
      "b27_idle_rich_customers", // 1-row positive-balance average
      "c19_tfidf_terms",         // 1-row corpus doc count
      "c26_vocab_coverage",      // 1-row occurrence total + ≤32-row offsets
      "c45_hll_distinct",        // tiny Range(register-count) frame
      "c52_mixture_weights",     // 1-row corpus token total
      "c64_temperature_mix",     // 1-row (token total, weight total)
      "d13_big_spenders",        // 1-row global average
      "a7_status_rollup",        // 1-row total for the share division
      "c28_ann_quantized",       // bounded query-batch broadcast (ANN contract)
      "c42_heavy_hitters",       // 1-row CMS sketch broadcast to the probe
      "d8_percentiles",          // ≤(groups×3)-row bracketing-rank table
      "d31_date_spine",          // generated calendar × distinct types grid
      "c69_ks_drift",            // distinct sources × length-buckets grid
      "c51_ts_similar_users"     // ≤BruteForceUserCap-row exact all-pairs
                                 // small-N branch (banded equi-join above
                                 // the cap — asserted separately above)
    )
    // windows whose partition key is tiny but whose INPUT is bounded by
    // construction (never corpus-sized), plus the pid-keyed two-level
    // ranks — each entry justified, staleness-checked like the others.
    // (The empirical detector fires only when BOTH the row floor and the
    // rows-per-key ratio trip at this SF, so most bounded windows never
    // need an entry.)
    val tinyKeyWindowAllowed = Set(
      "c26_vocab_coverage", // spark_partition_id-keyed local ranks: keys =
                            // range-partition count = cluster width, and
                            // ~vocab/32 rows per key at 32 partitions trips
                            // the ratio at sf0.001 — parallelism-bounded by
                            // construction, asserted separately above
      "c70_quantile_sketch" // per-flag cumsum over the VALUE-BUCKET
                            // histogram (child aggregates on (flag,
                            // v>>12)): input is ≤ |flags|·|price domain|
                            // /4096 rows — bounded by the value domain,
                            // not the corpus, so it never grows past a
                            // few thousand rows at ANY data size (the
                            // c20 per-bucket-aggregate class; raw rows
                            // only ever see the slice-probe window,
                            // whose input is ≤ 4·|flags| buckets)
    )
    val offenders = scala.collection.mutable.ListBuffer[String]()
    val usedAllowances = scala.collection.mutable.Set[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, dir)
      val plan = df.queryExecution.executedPlan
      val s = plan.toString
      val tkw = tinyKeyWindowOffenders(df)
      if (tkw.nonEmpty) {
        if (tinyKeyWindowAllowed(name)) usedAllowances += name
        else offenders ++= tkw.map(o => s"$name: $o")
      }
      if (s.contains("CartesianProduct")) {
        if (productAllowed(name)) usedAllowances += name
        else offenders += s"$name: CartesianProduct"
      }
      if (s.contains("BroadcastNestedLoopJoin")) {
        if (productAllowed(name) || scalarBroadcastAllowed(name)) usedAllowances += name
        else offenders += s"$name: BroadcastNestedLoopJoin"
      }
      val globalWindows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      if (globalWindows.nonEmpty) offenders += s"$name: unpartitioned WindowExec"
    }
    assert(offenders.isEmpty,
      s"plan hygiene violations:\n  ${offenders.mkString("\n  ")}")
    // the allowlist must stay EXACT: an entry no longer exercised is a
    // stale permission a future regression could hide behind.
    val stale = (productAllowed ++ scalarBroadcastAllowed ++
      tinyKeyWindowAllowed) -- usedAllowances
    assert(stale.isEmpty, s"stale allowlist entries (tighten them away): $stale")
  }

  test("c47 KMV: sample rides bounded TopKPerKey heaps, windows stay off raw rows") {
    val p = plan("c47_kmv_quantile")
    assert(p.contains("TopKPerKey"), "the sample must use the heap operator")
    // two Window pairs are legitimate: over the ≤k-row sample and over
    // the (lang, n_tokens) histogram — both bounded by k / value domain.
    // A fifth window would mean raw corpus rows are being sorted.
    val windows = "\\bWindow\\b".r.findAllIn(p).size
    assert(windows <= 4, s"unexpected Window over raw rows ($windows found):\n$p")
  }
}
