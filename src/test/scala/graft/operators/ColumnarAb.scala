package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch
import graft.queries.Tables.load

/** Feasibility A/B for a COLUMNAR aggregate kernel (r14, verdict item 2
  * follow-through): PERF.md prices the scan trio's residual to "the
  * engine's row-pipeline constant" — the vectorized parquet reader
  * decodes into ColumnVectors, then ColumnarToRow + whole-stage codegen
  * pay a per-row conversion before the first aggregate touches a value.
  * The knob sweep could not remove that constant because every row-side
  * knob still goes through the row pipeline. The only way to prove (or
  * beat) the floor is to NOT convert: consume the scan's
  * `executeColumnar()` batches directly and aggregate off the vectors.
  *
  * Legs (each row-path arm vs its vector-path twin, value-checked):
  *  - rowsum/colsum      — bare scan + sum(ROUND(price*100)) (the b9/b10
  *                         residual's unit of account, PERF.md r14)
  *  - rowprof/colprof/colprof2/colkern — d22's first stage: the
  *                         5-column (cid, v) distinct histogram (boxed
  *                         map / primitive map / map-work-only twins —
  *                         the floor-proof legs)
  *  - rowdig/coldig      — c70 pass 1: per-flag stats + q-digest
  *  - rowbcnt/colbcnt(2) — c70 pass 2: per-flag value-bucket histogram
  *  - rowslice/colslice  — c70 pass 3: bucket-slice extract
  *  - colflag            — flag-interning cost in isolation
  *  - c70eq              — end-to-end c70, kernel vs row path: exact
  *                         row identity required, then both timed
  *
  * Run: `sbt "Test/runMain graft.operators.ColumnarAb <dir> [leg...]"`.
  */
/** Minimal open-addressing long→long count map (power-of-2, linear
  * probing, splitmix64 finalizer). Sentinel-free: slot occupancy is a
  * bitset, so any long key is valid.
  */
final class OpenLongCountMap(initialCapacity: Int) extends Serializable {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 16))
  private var mask = cap - 1
  private var keys = new Array[Long](cap)
  private var cnts = new Array[Long](cap)
  private var usedBits = new Array[Long](cap >> 6)
  var size = 0

  @inline private def mix(k: Long): Int = {
    var z = k + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    ((z ^ (z >>> 31)) & mask).toInt
  }
  @inline private def used(i: Int): Boolean =
    (usedBits(i >> 6) & (1L << (i & 63))) != 0
  @inline private def setUsed(i: Int): Unit =
    usedBits(i >> 6) |= (1L << (i & 63))

  def inc(k: Long, by: Long): Unit = {
    var i = mix(k)
    while (used(i) && keys(i) != k) i = (i + 1) & mask
    if (!used(i)) {
      if ((size + 1) * 10 > cap * 7) { grow(); inc(k, by); return }
      setUsed(i); keys(i) = k; cnts(i) = by; size += 1
    } else cnts(i) += by
  }

  private def grow(): Unit = {
    val ok = keys; val oc = cnts; val ob = usedBits; val ocap = cap
    cap <<= 1; mask = cap - 1
    keys = new Array[Long](cap); cnts = new Array[Long](cap)
    usedBits = new Array[Long](cap >> 6)
    size = 0
    var i = 0
    while (i < ocap) {
      if ((ob(i >> 6) & (1L << (i & 63))) != 0) inc(ok(i), oc(i))
      i += 1
    }
  }

  def foreach(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < cap) { if (used(i)) f(keys(i), cnts(i)); i += 1 }
  }

  def clear(): Unit = {
    java.util.Arrays.fill(usedBits, 0L)
    size = 0
  }
}

object ColumnarAb {

  private def time(n: Int)(body: => Unit): Double = {
    body // warm
    (1 to n).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.sorted.apply(n / 2)
  }

  /** The scan's columnar output: strips ColumnarToRow/WSCG wrappers.
    * Returns the batches plus the scan's OWN output order (relation
    * schema order after pruning — NOT the select order).
    */
  private def columnarBatches(df: DataFrame) = {
    val plan = df.queryExecution.executedPlan
    val scans = plan.collect { case p if p.supportsColumnar => p }
    require(scans.nonEmpty, s"no columnar node under:\n$plan")
    (scans.head.executeColumnar(), scans.head.output.map(_.name))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale10")
    val legs = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    def want(l: String) = legs.isEmpty || legs(l)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def report(name: String, sec: Double): Unit =
      println(f"[columnar] $name%-28s $sec%7.3f s")

    val li = load(spark, dir, "lineitem")

    // ---- bare rev-sum ----
    if (want("rowsum")) {
      val q = li.agg(sum(expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")))
      println(s"[columnar] rowsum value = ${q.head().getLong(0)}")
      report("rowsum (row pipeline)", time(3)(q.collect()))
    }
    if (want("colsum")) {
      val scanDf = li.select(col("l_extendedprice"))
      val (cb1, _) = columnarBatches(scanDf)
      def run(): Long = cb1.mapPartitions { it =>
        var s = 0L
        while (it.hasNext) {
          val b: ColumnarBatch = it.next()
          val v = b.column(0)
          val n = b.numRows()
          var i = 0
          while (i < n) {
            if (!v.isNullAt(i)) s += Math.round(v.getDouble(i) * 100)
            i += 1
          }
        }
        Iterator.single(s)
      }.collect().sum
      println(s"[columnar] colsum value = ${run()}")
      report("colsum (vector kernel)", time(3)(run()))
    }

    // ---- c70 end-to-end: kernel path vs row path, exact compare ----
    if (want("c70eq")) {
      val q = graft.SparkEntry.queries("c70_quantile_sketch")
      def rows(kernel: Boolean) = {
        spark.conf.set("spark.graft.columnarKernel", kernel.toString)
        try q(spark, dir).collect().sortBy(_.getString(0)).toSeq
        finally spark.conf.unset("spark.graft.columnarKernel")
      }
      val kr = rows(kernel = true)
      val rr = rows(kernel = false)
      require(kr.map(_.toString) == rr.map(_.toString),
        s"c70 kernel/row mismatch:\nkernel: $kr\nrow:    $rr")
      require(kr.forall(_.getBoolean(4)), s"c70 kernel band false: $kr")
      println(s"[columnar] c70eq OK (${kr.length} rows identical, bands true)")
      report("c70 full (kernel)", time(3)(rows(kernel = true)))
      report("c70 full (row path)", time(3)(rows(kernel = false)))
    }

    // ---- d22 first-stage (cid, v) histogram ----
    val profSchema = StructType(Seq(
      StructField("cid", IntegerType, nullable = false),
      StructField("v", DoubleType, nullable = true),
      StructField("c", LongType, nullable = false)))
    def rowProf: DataFrame = li.selectExpr(
        """stack(5,
          | 0, CAST(l_orderkey AS DOUBLE),
          | 1, CAST(l_partkey AS DOUBLE),
          | 2, CAST(l_suppkey AS DOUBLE),
          | 3, CAST(l_linenumber AS DOUBLE),
          | 4, CAST(l_quantity AS DOUBLE)) AS (cid, v)""".stripMargin)
      .groupBy(col("cid"), col("v")).agg(count(lit(1)).as("c"))
    def colProf: DataFrame = {
      val scanDf = li.select(col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"), col("l_linenumber"), col("l_quantity"))
      val rdd = columnarBatches(scanDf)._1.mapPartitions { it =>
        // one open-addressing map per profiled column: double bits -> count
        val maps = Array.fill(5)(new java.util.HashMap[java.lang.Double, Array[Long]]())
        val nulls = new Array[Long](5)
        while (it.hasNext) {
          val b = it.next()
          val n = b.numRows()
          var c = 0
          while (c < 5) {
            val v = b.column(c)
            val m = maps(c)
            var i = 0
            while (i < n) {
              if (v.isNullAt(i)) nulls(c) += 1
              else {
                val d: Double = c match {
                  case 3 => v.getInt(i).toDouble
                  case 4 => v.getDouble(i)
                  case _ => v.getLong(i).toDouble
                }
                val slot = m.get(d)
                if (slot == null) m.put(d, Array(1L)) else slot(0) += 1
              }
              i += 1
            }
            c += 1
          }
        }
        (0 until 5).iterator.flatMap { c =>
          val base = new scala.collection.mutable.ArrayBuffer[Row]()
          maps(c).forEach((k, cnt) => base += Row(c, k.doubleValue(), cnt(0)))
          if (nulls(c) > 0) base += Row(c, null, nulls(c))
          base.iterator
        }
      }
      spark.createDataFrame(rdd, profSchema)
        .groupBy(col("cid"), col("v")).agg(sum(col("c")).as("c"))
    }
    // primitive open-addressing twin of colprof: key = normalized double
    // bits, linear probing, no boxing — the map cost IS the kernel cost
    // on this shape (colprof's java.util.HashMap boxed 30M lookups and
    // lost to the row pipeline 2.17 s vs 1.33)
    def colProf2: DataFrame = {
      val scanDf = li.select(col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"), col("l_linenumber"), col("l_quantity"))
      val rdd = columnarBatches(scanDf)._1.mapPartitions { it =>
        val maps = Array.fill(5)(new OpenLongCountMap(1 << 14))
        val nulls = new Array[Long](5)
        while (it.hasNext) {
          val b = it.next()
          val n = b.numRows()
          var c = 0
          while (c < 5) {
            val v = b.column(c)
            val m = maps(c)
            var i = 0
            while (i < n) {
              if (v.isNullAt(i)) nulls(c) += 1
              else {
                val d: Double = c match {
                  case 3 => v.getInt(i).toDouble
                  case 4 => v.getDouble(i)
                  case _ => v.getLong(i).toDouble
                }
                m.inc(java.lang.Double.doubleToLongBits(d + 0.0), 1L)
              }
              i += 1
            }
            c += 1
          }
        }
        (0 until 5).iterator.flatMap { c =>
          val out = new scala.collection.mutable.ArrayBuffer[Row](maps(c).size + 1)
          maps(c).foreach((k, cnt) =>
            out += Row(c, java.lang.Double.longBitsToDouble(k), cnt))
          if (nulls(c) > 0) out += Row(c, null, nulls(c))
          out.iterator
        }
      }
      spark.createDataFrame(rdd, profSchema)
        .groupBy(col("cid"), col("v")).agg(sum(col("c")).as("c"))
    }
    // kernel-ONLY twin of colprof2: same per-partition maps, but the
    // partition emits just its entry count — isolates the vector+map
    // cost from the partial-row emission + createDataFrame + downstream
    if (want("colkern")) {
      val scanDf = li.select(col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"), col("l_linenumber"), col("l_quantity"))
      val (cb2, _) = columnarBatches(scanDf)
      def run(): Long = cb2.mapPartitions { it =>
        val maps = Array.fill(5)(new OpenLongCountMap(1 << 14))
        while (it.hasNext) {
          val b = it.next()
          val n = b.numRows()
          var c = 0
          while (c < 5) {
            val v = b.column(c)
            val m = maps(c)
            var i = 0
            while (i < n) {
              if (!v.isNullAt(i)) {
                val d: Double = c match {
                  case 3 => v.getInt(i).toDouble
                  case 4 => v.getDouble(i)
                  case _ => v.getLong(i).toDouble
                }
                m.inc(java.lang.Double.doubleToLongBits(d + 0.0), 1L)
              }
              i += 1
            }
            c += 1
          }
        }
        Iterator.single(maps.map(_.size.toLong).sum)
      }.collect().sum
      println(s"[columnar] colkern distinct(sum of partials) = ${run()}")
      report("colkern (map only)", time(3)(run()))
    }
    if (want("colprof2")) {
      val chk = colProf2.agg(count(lit(1)), sum(col("c"))).head()
      println(s"[columnar] colprof2 distinct=${chk.getLong(0)} mass=${chk.getLong(1)}")
      report("colprof2 (primitive map)",
        time(3)(colProf2.agg(count(lit(1)), sum(col("c"))).collect()))
    }

    // ---- c70 pass-1 shape: per-flag stats + q-digest ----
    if (want("rowdig")) {
      import org.apache.spark.sql.GraftBridge
      val vals = li.select(col("l_returnflag").as("flag"),
        expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("v"))
      val digCol = GraftBridge.column(graft.functions.QDigestAgg(
        GraftBridge.expression(col("v")), 24, 2048, Seq(500, 900))
        .toAggregateExpression())
      def run() = vals.groupBy("flag").agg(
        count(lit(1)).as("n"), min(col("v")).as("lo"),
        max(col("v")).as("hi"), digCol.as("est")).collect()
      println(s"[columnar] rowdig rows = ${run().length}")
      report("rowdig (ObjectHashAgg)", time(3)(run()))
    }
    if (want("coldig")) {
      val scanDf = li.select(col("l_returnflag"), col("l_extendedprice"))
      def run() = {
        val (cb, names) = columnarBatches(scanDf)
        val fIdx = names.indexOf("l_returnflag")
        val pIdx = names.indexOf("l_extendedprice")
        val parts = cb.mapPartitionsWithIndex { (pid, it) =>
          val flags = new java.util.HashMap[String, Int]()
          var digs = new Array[graft.functions.LongLongCountMap](0)
          var ns = new Array[Long](0); var los = new Array[Long](0)
          var his = new Array[Long](0)
          def flagId(s: String): Int = {
            var id = flags.getOrDefault(s, -1)
            if (id < 0) {
              id = flags.size(); flags.put(s, id)
              digs = digs :+ new graft.functions.LongLongCountMap()
              ns = ns :+ 0L; los = los :+ Long.MaxValue; his = his :+ Long.MinValue
            }
            id
          }
          while (it.hasNext) {
            val b = it.next()
            val f = b.column(fIdx); val p = b.column(pIdx)
            val n = b.numRows()
            var i = 0
            // byte-compare cache against the last flag: no per-row
            // String allocation (flags cluster heavily in scan order)
            var lastU: org.apache.spark.unsafe.types.UTF8String = null
            var lastId = -1
            while (i < n) {
              val u = if (f.isNullAt(i)) null else f.getUTF8String(i)
              val id = if (u != null && lastU != null && u.equals(lastU)) lastId
                else if (u == null && lastU == null && lastId >= 0) lastId
                else {
                  val x = flagId(if (u == null) null else u.toString)
                  lastU = if (u == null) null else u.clone(); lastId = x; x
                }
              ns(id) += 1
              if (!p.isNullAt(i)) {
                val v = Math.round(p.getDouble(i) * 100)
                if (v < los(id)) los(id) = v
                if (v > his(id)) his(id) = v
                digs(id).addTo((1L << 24) + v, 1L)
                if (digs(id).size > 6 * 2048)
                  graft.functions.QDigestKernel.compress(digs(id), 2048)
              }
              i += 1
            }
          }
          val out = new scala.collection.mutable.ArrayBuffer[(Int, String, Long, Long, Long, Array[Byte])]()
          flags.forEach { (fs, id) =>
            out += ((pid, fs, ns(id), los(id), his(id),
              graft.functions.QDigestKernel.serialize(digs(id), 2048)))
          }
          out.iterator
        }.collect()
        // driver merge, deterministic by partition id
        val byFlag = parts.groupBy(_._2)
        byFlag.toSeq.sortBy(_._1).map { case (flag, rows) =>
          val n = rows.map(_._3).sum
          val lo = rows.map(_._4).min
          val hi = rows.map(_._5).max
          val dig = new graft.functions.LongLongCountMap()
          rows.sortBy(_._1).foreach { r =>
            graft.functions.QDigestKernel.mergeInto(dig, r._6, 2048)
          }
          val qs = graft.functions.QDigestKernel.quantiles(dig, 24, Seq(500, 900))
          (flag, n, lo, hi, qs(0), qs(1))
        }
      }
      println(s"[columnar] coldig rows = ${run().map(r => (r._1, r._2)).mkString(",")}")
      report("coldig (vector digest)", time(3)(run()))
    }

    // ---- c70 pass-2/3 shapes: bucket histogram + slice extract ----
    if (want("rowbcnt")) {
      val vals = li.select(col("l_returnflag").as("flag"),
        expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("v"))
      def run() = vals.groupBy(col("flag"), expr("shiftright(v, 12)").as("b"))
        .agg(count(lit(1)).as("c")).agg(count(lit(1)), sum(col("c"))).collect()
      println(s"[columnar] rowbcnt = ${run().mkString}")
      report("rowbcnt (row pipeline)", time(3)(run()))
    }
    if (want("colbcnt")) {
      val scanDf = li.select(col("l_returnflag"), col("l_extendedprice"))
      val (cb3, names3) = columnarBatches(scanDf)
      val fI = names3.indexOf("l_returnflag"); val pI = names3.indexOf("l_extendedprice")
      def run() = cb3.mapPartitions { it =>
        val flags = new java.util.HashMap[String, Int]()
        var maps = new Array[OpenLongCountMap](0)
        while (it.hasNext) {
          val b = it.next()
          val f = b.column(fI); val p = b.column(pI)
          val n = b.numRows()
          var i = 0
          var lastU: org.apache.spark.unsafe.types.UTF8String = null
          var lastId = -1
          while (i < n) {
            val u = if (f.isNullAt(i)) null else f.getUTF8String(i)
            val id = if (u != null && lastU != null && u.equals(lastU)) lastId
              else {
                val s = if (u == null) null else u.toString
                var x = flags.getOrDefault(s, -1)
                if (x < 0) { x = flags.size(); flags.put(s, x)
                  maps = maps :+ new OpenLongCountMap(1 << 12) }
                lastU = if (u == null) null else u.clone(); lastId = x; x
              }
            if (!p.isNullAt(i))
              maps(id).inc(Math.round(p.getDouble(i) * 100) >> 12, 1L)
            i += 1
          }
        }
        val out = new scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
        flags.forEach { (s, id) => maps(id).foreach((b, c) => out += ((s, b, c))) }
        out.iterator
      }.collect().groupBy(r => (r._1, r._2)).size
      println(s"[columnar] colbcnt buckets = ${run()}")
      report("colbcnt (vector kernel)", time(3)(run()))
    }
    // isolation: bucket map WITHOUT flags (map + getDouble cost only)
    if (want("colbcnt2")) {
      val scanDf = li.select(col("l_extendedprice"))
      val (cb5, _) = columnarBatches(scanDf)
      def run() = cb5.mapPartitions { it =>
        val m = new OpenLongCountMap(1 << 12)
        while (it.hasNext) {
          val b = it.next()
          val p = b.column(0)
          val n = b.numRows()
          var i = 0
          while (i < n) {
            if (!p.isNullAt(i)) m.inc(Math.round(p.getDouble(i) * 100) >> 12, 1L)
            i += 1
          }
        }
        Iterator.single(m.size.toLong)
      }.collect().sum
      println(s"[columnar] colbcnt2 partial buckets = ${run()}")
      report("colbcnt2 (no flags)", time(3)(run()))
    }
    // isolation: flag resolution only (no value map)
    if (want("colflag")) {
      val scanDf = li.select(col("l_returnflag"))
      val (cb6, _) = columnarBatches(scanDf)
      def run() = cb6.mapPartitions { it =>
        val flags = new java.util.HashMap[String, Int]()
        var cnts = new Array[Long](0)
        while (it.hasNext) {
          val b = it.next()
          val f = b.column(0)
          val n = b.numRows()
          var i = 0
          var lastU: org.apache.spark.unsafe.types.UTF8String = null
          var lastId = -1
          while (i < n) {
            val u = if (f.isNullAt(i)) null else f.getUTF8String(i)
            val id = if (u != null && lastU != null && u.equals(lastU)) lastId
              else {
                val s = if (u == null) null else u.toString
                var x = flags.getOrDefault(s, -1)
                if (x < 0) { x = flags.size(); flags.put(s, x)
                  cnts = cnts :+ 0L }
                lastU = if (u == null) null else u.clone(); lastId = x; x
              }
            cnts(id) += 1
            i += 1
          }
        }
        Iterator.single(cnts.sum)
      }.collect().sum
      println(s"[columnar] colflag rows = ${run()}")
      report("colflag (flags only)", time(3)(run()))
    }
    if (want("rowslice")) {
      import spark.implicits._
      val vals = li.select(col("l_returnflag").as("flag"),
        expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("v"))
      val sel = Seq(("A", 100L), ("A", 800L), ("N", 200L), ("N", 900L),
        ("R", 300L), ("R", 1000L)).toDF("flag", "b")
      def run() = vals.withColumn("b", expr("shiftright(v, 12)"))
        .join(broadcast(sel), Seq("flag", "b")).agg(count(lit(1))).collect()
      println(s"[columnar] rowslice rows = ${run().mkString}")
      report("rowslice (row pipeline)", time(3)(run()))
    }
    if (want("colslice")) {
      val scanDf = li.select(col("l_returnflag"), col("l_extendedprice"))
      val (cb4, names4) = columnarBatches(scanDf)
      val fI = names4.indexOf("l_returnflag"); val pI = names4.indexOf("l_extendedprice")
      val want4 = Map("A" -> Set(100L, 800L), "N" -> Set(200L, 900L),
        "R" -> Set(300L, 1000L))
      def run() = cb4.mapPartitions { it =>
        var cnt = 0L
        val out = new scala.collection.mutable.ArrayBuffer[(String, Long)]()
        while (it.hasNext) {
          val b = it.next()
          val f = b.column(fI); val p = b.column(pI)
          val n = b.numRows()
          var i = 0
          var lastU: org.apache.spark.unsafe.types.UTF8String = null
          var lastS: String = null
          while (i < n) {
            if (!f.isNullAt(i) && !p.isNullAt(i)) {
              val u = f.getUTF8String(i)
              if (lastU == null || !u.equals(lastU)) {
                lastU = u.clone(); lastS = lastU.toString
              }
              val set = want4.getOrElse(lastS, null)
              if (set != null) {
                val v = Math.round(p.getDouble(i) * 100)
                if (set.contains(v >> 12)) { out += ((lastS, v)); cnt += 1 }
              }
            }
            i += 1
          }
        }
        Iterator.single(cnt)
      }.collect().sum
      println(s"[columnar] colslice rows = ${run()}")
      report("colslice (vector kernel)", time(3)(run()))
    }

    if (want("rowprof")) {
      val chk = rowProf.agg(count(lit(1)), sum(col("c"))).head()
      println(s"[columnar] rowprof distinct=${chk.getLong(0)} mass=${chk.getLong(1)}")
      report("rowprof (row pipeline)",
        time(3)(rowProf.agg(count(lit(1)), sum(col("c"))).collect()))
    }
    if (want("colprof")) {
      val chk = colProf.agg(count(lit(1)), sum(col("c"))).head()
      println(s"[columnar] colprof distinct=${chk.getLong(0)} mass=${chk.getLong(1)}")
      report("colprof (vector kernel)",
        time(3)(colProf.agg(count(lit(1)), sum(col("c"))).collect()))
    }

    spark.stop()
  }
}
