package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, GenericInternalRow}
import org.apache.spark.sql.execution.{ColumnarToRowExec, InputAdapter, ProjectExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{LongLongCountMap, QDigestKernel}

/** Columnar aggregate kernels: per-partition passes that consume the
  * vectorized parquet reader's `ColumnarBatch`es DIRECTLY, skipping the
  * columnar→row conversion and the row-at-a-time aggregate path.
  *
  * Why this exists (r14, the scan-trio residual): the r13/r14 knob
  * sweeps could not move the trio's per-row constant because every
  * row-side knob still pays ColumnarToRow + per-row aggregate-map
  * bookkeeping. The ColumnarAb decomposition (committed) shows where a
  * vector pass actually wins and where it does not, at 10× data:
  *
  *  - plain scan+sum: row pipeline 0.037 s vs vector loop 0.070 s —
  *    whole-stage codegen is ALREADY at raw-loop parity on trivial
  *    aggregates; no kernel ships for these (and d22's high-cardinality
  *    histogram kernel measured at best ~1.2× once partial emission and
  *    the re-merge are paid — the JVM's ~17 ns/value map cost IS the
  *    floor there, vs DuckDB's ~5 ns; recorded in PERF.md, no kernel).
  *  - c70's three fact passes: q-digest build 1.21→0.98 s (the
  *    TypedImperativeAggregate row path pays eval+boxing per row),
  *    bucket histogram 0.42→0.11 s, bucket slice 0.52→0.09 s — the
  *    aggregate STATE is tiny (≤ |flags|·digest / |buckets| / |slice
  *    rows|), so the vector pass keeps everything L1-resident and
  *    emits bounded partials. These three ship here.
  *
  * Scale contract (100 TB): each kernel is a map-side PARTIAL — output
  * is bounded per partition (|flags| digest rows / |flags|·|buckets|
  * counts / slice matches), and the merge runs as a normal Spark
  * aggregation over those partials ([[graft.functions.QDigestMergeAgg]]
  * for digests — NOT a driver-side merge, so 10^5 partitions of
  * partials tree-reduce like any aggregate). A kernel never holds more
  * than its own partition's bounded state.
  *
  * Safety contract: [[scanBatches]] returns Some only when the plan is
  * EXACTLY a columnar scan under benign wrappers (ColumnarToRow /
  * WholeStageCodegen / InputAdapter / attribute-only Project). Any
  * filter, computed projection, exchange, or adaptive wrapper → None,
  * and the caller keeps its row-path spelling. Column indices are
  * resolved from the SCAN's own output order (relation schema order
  * after pruning — NOT the caller's select order; assuming select
  * order was the first bug the ColumnarAb harness caught).
  */
object ColumnarKernel {

  /** Three-state kernel gate. `spark.graft.columnarKernel` = true/false
    * forces the choice (tests force-true at tiny SF; A/B arms force
    * either way); env SPARK_GRAFT_NO_KERNEL=1 forces the row path;
    * otherwise `autoDefault` decides — call sites pass their input-shape
    * rule (c70 reuses its row-group gate: the kernel's win is per-row
    * vector work, its cost is ~3 extra fixed action/plan latencies, so
    * it pays on multi-row-group data-sized inputs — measured at sf0.1
    * single-file bench: row 1.61 s vs kernel 1.98; at 10× multi-file:
    * kernel 2.6 s vs row 3.6, clean paired arms both times).
    */
  def enabled(spark: SparkSession, autoDefault: => Boolean): Boolean =
    spark.conf.getOption("spark.graft.columnarKernel")
      .map(_.trim.toLowerCase) match {
      case Some("true") => true
      case Some("false") => false
      case Some(other) =>
        // fail loudly: an A/B arm set with "1"/"yes"/"on" silently
        // falling through to the auto default would test the wrong path
        throw new IllegalArgumentException(
          s"spark.graft.columnarKernel must be 'true' or 'false', got '$other'")
      case None =>
        !sys.env.get("SPARK_GRAFT_NO_KERNEL").exists(_.trim == "1") &&
          autoDefault
    }

  /** Resolved-type gate (r14 ADVICE, medium): the kernels read vectors
    * with `getUTF8String`/`getDouble`, but [[scanBatches]] gates on plan
    * SHAPE only — a schema variant (e.g. DECIMAL(12,2) prices, common in
    * real TPC-H parquet) would engage the kernel and silently read
    * garbage from the ColumnVector while the row path's CAST handles it.
    * Each kernel checks its columns' resolved types and returns None on
    * mismatch, so the caller keeps its row-path spelling.
    */
  private def typesOk(
      table: DataFrame, flagCol: String, valueCol: String): Boolean =
    table.schema(flagCol).dataType == StringType &&
      table.schema(valueCol).dataType == DoubleType

  /** Bit-identical twin of the row path's `CAST(ROUND(x*100) AS BIGINT)`:
    * Spark's ROUND on a double is BigDecimal.valueOf (shortest-decimal)
    * + HALF_UP. `Math.round` (floor(x+0.5)) agrees everywhere EXCEPT
    * when the double sits within half an ulp below/above a `.5`
    * shortest-decimal boundary — so take the fast path unless the
    * fractional part is within 1e-6 of .5 (covers every half-ulp case
    * for |x·100| < 2^40; prices·100 stay < 2^31) and defer those rare
    * rows to the exact BigDecimal spelling. On 2-decimal price data the
    * slow path never triggers; correctness no longer ASSUMES that
    * (r14 ADVICE, low).
    */
  private[graft] def roundCents(d: Double): Long = {
    val x = d * 100.0
    val fl = Math.floor(x)
    if (Math.abs(x - fl - 0.5) < 1e-6)
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    else Math.round(x)
  }

  /** The scan's columnar batches + name→vector-index map, if `df` is a
    * pure columnar scan (see safety contract above).
    */
  private[graft] def scanBatches(
      df: DataFrame): Option[(RDD[ColumnarBatch], Map[String, Int])] = {
    def strip(p: SparkPlan): Option[SparkPlan] = p match {
      case w: WholeStageCodegenExec => strip(w.child)
      case i: InputAdapter => strip(i.child)
      case c: ColumnarToRowExec => strip(c.child)
      case pr: ProjectExec
          if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        strip(pr.child)
      case s if s.supportsColumnar && s.children.isEmpty => Some(s)
      case _ => None
    }
    strip(df.queryExecution.executedPlan).map { scan =>
      (scan.executeColumnar(), scan.output.map(_.name).zipWithIndex.toMap)
    }
  }

  /** Per-row flag interning off a string ColumnVector: byte-compares
    * against the last seen value (no per-row String allocation; the
    * `null` flag is a legal group, as in a row-path groupBy).
    */
  private final class FlagIntern {
    private val ids = new java.util.HashMap[String, Int]()
    private var lastU: UTF8String = null
    private var lastWasNull = false
    private var lastId = -1
    private var registered: Int => Unit = null
    def onNew(f: Int => Unit): Unit = registered = f
    def idOf(u: UTF8String): Int = {
      if (u == null) {
        if (lastWasNull) return lastId
      } else if (lastU != null && u.equals(lastU)) return lastId
      val s = if (u == null) null else u.toString
      var x = ids.getOrDefault(s, -1)
      if (x < 0) {
        x = ids.size(); ids.put(s, x)
        if (registered != null) registered(x)
      }
      lastWasNull = u == null
      lastU = if (u == null) null else u.clone()
      lastId = x
      x
    }
    def foreach(f: (String, Int) => Unit): Unit = ids.forEach((s, i) => f(s, i))
  }

  /** K1 — per-flag (n, lo, hi, q-digest partial) off one vector pass.
    * `n` counts ALL rows of the flag (value-null included, matching
    * `count(lit(1))`); lo/hi/digest cover non-null values of
    * `ROUND(value·100)` (the s2 scaled-long spelling). Values outside
    * the digest universe throw, exactly like [[graft.functions.QDigestAgg]].
    *
    * Output: (flag string, n long, lo long?, hi long?, dig binary?) —
    * one row per (scan partition, flag); merge with
    * sum(n)/min(lo)/max(hi)/[[graft.functions.QDigestMergeAgg]].
    */
  private[graft] def flagStatsDigestPartials(
      spark: SparkSession,
      table: DataFrame,
      flagCol: String,
      valueCol: String,
      bits: Int,
      k: Int): Option[DataFrame] =
    if (!typesOk(table, flagCol, valueCol)) None
    else scanBatches(table.select(col(flagCol), col(valueCol))).map {
      case (batches, idx) =>
        val fI = idx(flagCol); val vI = idx(valueCol)
        val leafBase = 1L << bits
        val schema = StructType(Seq(
          StructField("flag", StringType, nullable = true),
          StructField("n", LongType, nullable = false),
          StructField("lo", LongType, nullable = true),
          StructField("hi", LongType, nullable = true),
          StructField("dig", BinaryType, nullable = true)))
        val rdd = batches.mapPartitions { it =>
          val intern = new FlagIntern
          var ns = new Array[Long](0)
          var los = new Array[Long](0)
          var his = new Array[Long](0)
          var digs = new Array[LongLongCountMap](0)
          intern.onNew { _ =>
            ns = ns :+ 0L; los = los :+ Long.MaxValue
            his = his :+ Long.MinValue; digs = digs :+ new LongLongCountMap()
          }
          val trigger = QDigestKernel.compressTrigger(k)
          while (it.hasNext) {
            val b = it.next()
            val f = b.column(fI); val p = b.column(vI)
            val n = b.numRows()
            var i = 0
            while (i < n) {
              val id = intern.idOf(if (f.isNullAt(i)) null else f.getUTF8String(i))
              ns(id) += 1
              if (!p.isNullAt(i)) {
                val v = roundCents(p.getDouble(i))
                require(v >= 0 && v < leafBase,
                  s"qdigest value $v outside universe [0, $leafBase) — rescale or raise bits")
                if (v < los(id)) los(id) = v
                if (v > his(id)) his(id) = v
                val d = digs(id)
                d.addTo(leafBase + v, 1L)
                if (d.size > trigger) QDigestKernel.compress(d, k)
              }
              i += 1
            }
          }
          val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
          intern.foreach { (s, id) =>
            val any = los(id) != Long.MaxValue
            out += new GenericInternalRow(Array[Any](
              if (s == null) null else UTF8String.fromString(s), ns(id),
              if (any) los(id) else null,
              if (any) his(id) else null,
              if (any) QDigestKernel.serialize(digs(id), k) else null))
          }
          out.iterator
        }
        GraftBridge.ofInternalRows(spark, rdd, schema)
    }

  /** K2 — per-flag value-bucket histogram at `shift`: the exact rows a
    * `groupBy(flag, shiftright(v, shift)).count` produces, including
    * the null-flag group and the null-bucket row for value-null rows.
    * Output: (flag, b long?, c long), FULLY aggregated.
    */
  private[graft] def flagBucketCounts(
      spark: SparkSession,
      table: DataFrame,
      flagCol: String,
      valueCol: String,
      shift: Int): Option[DataFrame] =
    if (!typesOk(table, flagCol, valueCol)) None
    else scanBatches(table.select(col(flagCol), col(valueCol))).map {
      case (batches, idx) =>
        val fI = idx(flagCol); val vI = idx(valueCol)
        val schema = StructType(Seq(
          StructField("flag", StringType, nullable = true),
          StructField("b", LongType, nullable = true),
          StructField("c", LongType, nullable = false)))
        val rdd = batches.mapPartitions { it =>
          val intern = new FlagIntern
          var maps = new Array[LongLongCountMap](0)
          var nullV = new Array[Long](0)
          intern.onNew { _ =>
            maps = maps :+ new LongLongCountMap(1 << 12)
            nullV = nullV :+ 0L
          }
          while (it.hasNext) {
            val b = it.next()
            val f = b.column(fI); val p = b.column(vI)
            val n = b.numRows()
            var i = 0
            while (i < n) {
              val id = intern.idOf(if (f.isNullAt(i)) null else f.getUTF8String(i))
              if (p.isNullAt(i)) nullV(id) += 1
              else {
                val v = roundCents(p.getDouble(i))
                // same non-negative domain the digest pass enforces; a
                // negative bucket would collide with the map's 0-key
                // empty-slot sentinel after the +1 shift below
                require(v >= 0, s"bucket kernel value $v is negative")
                // +1: LongLongCountMap reserves key 0 for empty slots;
                // bucket ids are ≥ 0, so shift the key space by one
                maps(id).addTo((v >> shift) + 1L, 1L)
              }
              i += 1
            }
          }
          // emission is |flags|·|buckets| per partition — ~6M rows at
          // 100× — so it goes out as InternalRows (the boxed Row
          // converter path made this emission the pass's dominant cost
          // at 100×: 63 s vs the row path's 18.6, GraftBridge scaladoc)
          val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
          intern.foreach { (s, id) =>
            val u = if (s == null) null else UTF8String.fromString(s)
            maps(id).foreachEntry((bk, c) =>
              out += new GenericInternalRow(Array[Any](u, bk - 1L, c)))
            if (nullV(id) > 0)
              out += new GenericInternalRow(Array[Any](u, null, nullV(id)))
          }
          out.iterator
        }
        GraftBridge.ofInternalRows(spark, rdd, schema)
          .groupBy(col("flag"), col("b")).agg(sum(col("c")).as("c"))
    }

  /** K3 — bucket-slice extract: the rows an inner equi-join of the scan
    * against a tiny (flag, bucket) selection keeps, as (flag, b, v).
    * Null flags/values never match (inner-join semantics). `sel` is
    * the collected selection — ≤ 4·|flags| pairs by construction at
    * the c70 call site, a closure literal, never data-sized.
    */
  private[graft] def flagBucketSlice(
      spark: SparkSession,
      table: DataFrame,
      flagCol: String,
      valueCol: String,
      shift: Int,
      sel: Set[(String, Long)]): Option[DataFrame] =
    if (!typesOk(table, flagCol, valueCol)) None
    else scanBatches(table.select(col(flagCol), col(valueCol))).map {
      case (batches, idx) =>
        val fI = idx(flagCol); val vI = idx(valueCol)
        val byFlag: Map[String, Set[Long]] =
          sel.groupBy(_._1).map { case (f, s) => (f, s.map(_._2)) }
        val schema = StructType(Seq(
          StructField("flag", StringType, nullable = false),
          StructField("b", LongType, nullable = false),
          StructField("v", LongType, nullable = false)))
        val rdd = batches.mapPartitions { it =>
          val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
          var lastU: UTF8String = null
          var lastSet: Set[Long] = null
          while (it.hasNext) {
            val b = it.next()
            val f = b.column(fI); val p = b.column(vI)
            val n = b.numRows()
            var i = 0
            while (i < n) {
              if (!f.isNullAt(i) && !p.isNullAt(i)) {
                val u = f.getUTF8String(i)
                if (lastU == null || !u.equals(lastU)) {
                  lastU = u.clone()
                  lastSet = byFlag.getOrElse(lastU.toString, null)
                }
                if (lastSet != null) {
                  val v = roundCents(p.getDouble(i))
                  val bk = v >> shift
                  if (lastSet.contains(bk))
                    out += new GenericInternalRow(Array[Any](lastU, bk, v))
                }
              }
              i += 1
            }
          }
          out.iterator
        }
        GraftBridge.ofInternalRows(spark, rdd, schema)
    }
}
