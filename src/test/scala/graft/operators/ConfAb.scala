package graft.operators

import org.apache.spark.sql.SparkSession

/** Session-conf sweep over the weak cohort (r13): the per-query
  * constant-factor losses vs DuckDB at the 10× fair layout (b9, b10,
  * b12, b13, d22, c70, c55, c68 — VERDICT r12 "weak set") are all
  * plan-audited to the floor, so the remaining levers are the engine
  * knobs the suite has never A/B'd. Each variant below toggles ONE
  * runtime SQL conf against the shipped baseline (AQE on — the
  * size-derived default at this input size) and times the declared
  * queries; medians of 3 after a warm pass.
  *
  * Variants and why they're plausible:
  *  - shj: `spark.sql.join.preferSortMergeJoin=false` — shuffled hash
  *    join skips both sort legs of SMJ; risky as a blanket default at
  *    cluster scale (build side must fit a task), measured here to
  *    price the sorts.
  *  - shjthresh: `spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`
  *    = 64 MB — the SAFE spelling: AQE converts SMJ→SHJ only when the
  *    measured post-shuffle partition actually fits, so it holds at
  *    100 TB where the blanket knob doesn't.
  *  - batch16k: `spark.sql.parquet.columnarReaderBatchSize` 4096→16384 —
  *    fewer per-batch boundary crossings per scan.
  *  - vecagg: `spark.sql.codegen.aggregate.map.vectorized.enable=true` —
  *    the vectorized first-level hash map for partial aggregates.
  *  - cap20: `spark.sql.codegen.aggregate.fastHashMap.capacityBit`
  *    16→20 — 16× more keys stay in the codegen'd fast map before
  *    falling to BytesToBytesMap (d22/b13's ~unique keys overflow the
  *    64k default immediately).
  *
  * Run: `sbt "Test/runMain graft.operators.ConfAb <dir> [variant...]"`.
  */
object ConfAb {

  private def once(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  private def median(xs: Seq[Double]): Double =
    xs.sorted.apply(xs.size / 2)

  private val Cohort = Seq(
    "b9_local_supplier_volume", "b10_promo_share", "b12_waiting_suppliers",
    "b13_part_top_supplier", "d22_table_profile", "c70_quantile_sketch",
    "c55_containment", "c68_winnow_pairs")

  private val Variants: Seq[(String, Map[String, String])] = Seq(
    "base" -> Map.empty,
    "shj" -> Map("spark.sql.join.preferSortMergeJoin" -> "false"),
    "shjthresh" -> Map(
      "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "67108864"),
    "batch16k" -> Map("spark.sql.parquet.columnarReaderBatchSize" -> "16384"),
    "vecagg" -> Map(
      "spark.sql.codegen.aggregate.map.vectorized.enable" -> "true"),
    "cap20" -> Map(
      "spark.sql.codegen.aggregate.fastHashMap.capacityBit" -> "20"))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale10")
    // args order = run order (run the sweep twice, reversed, to separate
    // knob effects from warm-cache/JIT drift across the sweep)
    val order = if (args.length > 1) args.drop(1).toSeq else Variants.map(_._1)
    val byName = Variants.toMap
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        graft.Tuning.shufflePartitionsFor(graft.Tuning.dirBytes(dir)).toString)
      // AQE ON: the size-derived bench default at 10×+ (Bench.scala r13)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // INTERLEAVED passes: each pass visits every (variant, query) cell
    // once, so slow drift (page-cache warmth, JIT tiers, decaying
    // external load) lands evenly on every variant instead of on
    // whichever ran first — the first cut of this harness ran
    // variant-major and the order-reversal control showed run-to-run
    // variance on IDENTICAL configs (±25%) exceeding most knob deltas.
    val passes = sys.env.getOrElse("SPARK_GRAFT_CONFAB_PASSES", "5").toInt
    val timed = scala.collection.mutable.Map[(String, String), Vector[Double]]()
      .withDefaultValue(Vector.empty)
    // warm every (variant, query) cell once, untimed
    for (label <- order; confs <- byName.get(label)) {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      Cohort.foreach(q => graft.SparkEntry.queries(q)(spark, dir).collect())
      confs.keys.foreach(spark.conf.unset)
    }
    for (_ <- 1 to passes; label <- order; confs <- byName.get(label)) {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      for (q <- Cohort)
        timed((label, q)) :+= once(graft.SparkEntry.queries(q)(spark, dir).collect())
      confs.keys.foreach(spark.conf.unset)
    }
    for (q <- Cohort; label <- order) {
      val ts = timed((label, q))
      println(f"[confab] $label%-10s $q%-28s ${median(ts)}%7.3f s  " +
        ts.map(t => f"$t%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
