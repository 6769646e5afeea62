package graft.functions

import graft.SparkSpec

import org.apache.spark.sql.{GraftBridge, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** q-digest: interval arithmetic, exactness below compression, the
  * worst-case rank-error bound under compression and adversarial merge
  * splits, bounded state, and the full DataFrame aggregation path.
  */
class QDigestAggSpec extends AnyFunSuite with SparkSpec {

  private val bits = 16

  /** straight-line model: digest-free exact rank percentile —
    * smallest v with |{x ≤ v}| ≥ ceil(q·n/1000).
    */
  private def exactPermille(vs: Seq[Long], q: Int): Long = {
    val sorted = vs.sorted
    val target = ((q.toLong * vs.size + 999L) / 1000L).toInt
    sorted(math.max(0, target - 1))
  }

  /** Tie-robust acceptance: a value `v` is within `bound` ranks of
    * `target` if its rank INTERVAL [count(<v)+1, count(≤v)], widened by
    * `bound` both ways, contains the target — with heavy ties even the
    * exact percentile's point rank count(≤v) can sit far past the
    * target, so a point-rank check would reject correct answers.
    */
  private def withinBound(vs: Seq[Long], v: Long, target: Long, bound: Long): Boolean = {
    val rLo = vs.count(_ < v).toLong + 1
    val rHi = vs.count(_ <= v).toLong
    target >= rLo - bound && target <= rHi + bound
  }

  /** Drive the aggregate buffer protocol through the REAL update/merge
    * methods: partition `vs` into `splits` chunks, update each into its
    * own buffer, then merge left-to-right — the executor/partial-
    * aggregate dance without needing Spark.
    */
  private def digestOf(vs: Seq[Long], k: Int, splits: Int): LongLongCountMap = {
    val agg = QDigestAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0, LongType, true),
      bits, k, Seq(500))
    val chunks = vs.grouped(math.max(1, (vs.size + splits - 1) / splits)).toSeq
    val bufs = chunks.map { c =>
      val b = agg.createAggregationBuffer()
      c.foreach(x => agg.update(b, org.apache.spark.sql.catalyst.InternalRow(x)))
      b
    }
    bufs.reduceLeft { (a, b) => agg.merge(a, b) }
  }

  test("LongLongCountMap rejects the sentinel key 0 instead of corrupting") {
    // deserialize() feeds addTo straight from shuffle bytes; a corrupt
    // partial buffer must fail loudly, not silently bump an "empty"
    // slot's value without counting it (found in the r8 review).
    val m = new LongLongCountMap(16)
    m.addTo(7L, 2L)
    intercept[IllegalArgumentException] { m.addTo(0L, 1L) }
    assert(m.size == 1 && m.get(7L) == 2L, "the map is untouched after the reject")
  }

  test("hi(): heap-id interval arithmetic") {
    // bits=4 universe [0,16): root 1 covers hi=15; leaf 16+v covers v.
    assert(QDigestAgg.hi(1L, 4) == 15L)
    assert(QDigestAgg.hi(16L, 4) == 0L)
    assert(QDigestAgg.hi(31L, 4) == 15L)
    assert(QDigestAgg.hi(2L, 4) == 7L)   // left half [0,7]
    assert(QDigestAgg.hi(3L, 4) == 15L)  // right half [8,15]
    assert(QDigestAgg.hi(5L, 4) == 7L)   // second quarter [4,7]
    assert(QDigestAgg.hi(6L, 4) == 11L)  // third quarter [8,11]
  }

  test("below compression the estimates are exact discrete percentiles") {
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(200)(rnd.nextInt(1 << bits).toLong)
    val buf = digestOf(vs, k = 4096, splits = 3) // t = n/k = 0: no folding
    for (q <- Seq(10, 250, 500, 900, 1000)) {
      val est = QDigestAgg.quantiles(buf, bits, Seq(q))(0)
      assert(est == exactPermille(vs, q), s"q=$q")
    }
    // slot order is the CALLER's order, whatever it is — a descending or
    // shuffled target list must not smear one node across several slots
    val multi = QDigestAgg.quantiles(buf, bits, Seq(900, 10, 500))
    assert(multi.toSeq == Seq(900, 10, 500).map(exactPermille(vs, _)))
  }

  test("rank-error bound holds under compression and adversarial splits") {
    val rnd = new scala.util.Random(42)
    // skewed: dense cluster + heavy tail, the shape that stresses folding
    val vs = Seq.fill(4000)(rnd.nextInt(64).toLong) ++
      Seq.fill(2000)(rnd.nextInt(1 << bits).toLong) ++
      Seq.fill(1000)((1 << bits) - 1 - rnd.nextInt(16).toLong)
    val n = vs.size.toLong
    val k = 64
    val bound = bits.toLong * (n / k) + 1
    for (splits <- Seq(1, 2, 7, 32)) {
      val buf = digestOf(vs, k, splits)
      assert(buf.size <= 6 * k + 1,
        s"state ${buf.size} exceeds the 6k+1 trigger bound at splits=$splits")
      for (q <- Seq(100, 500, 950)) {
        val est = QDigestAgg.quantiles(buf, bits, Seq(q))(0)
        val target = (q.toLong * n + 999L) / 1000L
        assert(withinBound(vs, est, target, bound),
          s"splits=$splits q=$q: estimate $est out of rank band $bound")
      }
    }
  }

  test("DataFrame path: grouped, repartitioned, serialized — in bound; nulls skipped; empty group null") {
    val rnd = new scala.util.Random(3)
    val rows: Seq[Row] = (1 to 3000).map { i =>
      Row(if (i % 2 == 0) "a" else "b",
        if (i % 97 == 0) null else java.lang.Long.valueOf(rnd.nextInt(1 << bits).toLong))
    } :+ Row("empty", null)
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", LongType, nullable = true)))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema).repartition(13)
    val k = 64
    val aggCol = GraftBridge.column(QDigestAgg(
      GraftBridge.expression(col("v")), bits, k, Seq(500, 900))
      .toAggregateExpression())
    val out = df.groupBy("g").agg(aggCol.as("est")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(out("empty") == null, "all-null group must eval to null")
    for (g <- Seq("a", "b")) {
      val vs = rows.collect { case r: Row if r.getString(0) == g && r.get(1) != null =>
        r.getLong(1) }
      val n = vs.size.toLong
      val bound = bits.toLong * (n / k) + 1
      val est = out(g)
      assert(est != null && est.size == 2)
      for ((q, e) <- Seq(500, 900).zip(est)) {
        val target = (q.toLong * n + 999L) / 1000L
        assert(withinBound(vs, e, target, bound), s"g=$g q=$q est=$e bound=$bound")
      }
    }
  }

  test("weighted ingest of a (value, count) table carries the multiset contract") {
    val rnd = new scala.util.Random(19)
    val vs = Seq.fill(5000)(rnd.nextInt(256).toLong * rnd.nextInt(8))
    val counts = vs.groupBy(identity).map { case (v, xs) => (v, xs.size.toLong) }.toSeq
    val schema = StructType(Seq(
      StructField("v", LongType, nullable = false),
      StructField("c", LongType, nullable = false)))
    val rows = counts.map { case (v, c) => Row(v, c) }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema).repartition(7)
    val k = 64
    val aggCol = GraftBridge.column(QDigestAgg(
      GraftBridge.expression(col("v")), bits, k, Seq(500, 900),
      GraftBridge.expression(col("c"))).toAggregateExpression())
    val est = df.agg(aggCol.as("est")).head().getSeq[Long](0)
    val n = vs.size.toLong
    val bound = bits.toLong * (n / k) + 1
    for ((q, e) <- Seq(500, 900).zip(est)) {
      val target = (q.toLong * n + 999L) / 1000L
      assert(withinBound(vs, e, target, bound),
        s"weighted q=$q est=$e outside rank band $bound")
    }
  }

  test("property: rank band holds for arbitrary multisets, splits, k and q") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // distributions that stress folding: uniform, clustered, and
    // heavy-tie multisets over a small universe
    val values: Gen[List[Long]] = for {
      n <- Gen.choose(50, 1200)
      mode <- Gen.oneOf(0, 1, 2)
      vs <- Gen.listOfN(n, mode match {
        case 0 => Gen.choose(0L, (1L << bits) - 1)           // uniform
        case 1 => Gen.choose(0L, 63L)                        // dense cluster
        case 2 => Gen.oneOf(0L, 1L, 7L, (1L << bits) - 1)    // heavy ties
      })
    } yield vs
    val prop = Prop.forAll(values, Gen.choose(1, 9), Gen.oneOf(16, 64, 256),
      Gen.choose(1, 1000)) { (vs, splits, k, q) =>
      val buf = digestOf(vs, k, splits)
      val est = QDigestAgg.quantiles(buf, bits, Seq(q))(0)
      val n = vs.size.toLong
      val target = (q.toLong * n + 999L) / 1000L
      val bound = bits.toLong * (n / k) + 1
      withinBound(vs, est, target, bound)
    }
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(150), prop).passed)
  }

  test("out-of-universe value fails loudly") {
    val agg = QDigestAgg(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0, LongType, true),
      8, 64, Seq(500))
    val buf = agg.createAggregationBuffer()
    val row = org.apache.spark.sql.catalyst.InternalRow(256L)
    assertThrows[IllegalArgumentException] { agg.update(buf, row) }
  }

  /** The documented fold, reimplemented boxed, as a differential
    * oracle: deepest level first, ids ascending within a level,
    * fold-created parents merged into their level's worklist. The r14
    * primitive in-place rewrite claims BIT-IDENTICAL results to this
    * order — randomized buffers pin that claim, so a future edit that
    * silently changes fold order (still "deterministic", still inside
    * the rank bound) fails here instead of shifting estimates.
    */
  private def referenceCompress(entries: Map[Long, Long], k: Int): Map[Long, Long] = {
    val n = entries.values.sum
    val t = n / k
    if (t <= 0) return entries
    val m = scala.collection.mutable.Map.from(entries)
    def level(id: Long) = 63 - java.lang.Long.numberOfLeadingZeros(id)
    val maxLevel = entries.keys.map(level).max
    val byLevel = Array.fill(maxLevel + 1)(
      scala.collection.mutable.ArrayBuffer.empty[Long])
    entries.keys.foreach(id => byLevel(level(id)) += id)
    var lvl = maxLevel
    while (lvl >= 1) {
      for (id <- byLevel(lvl).toArray.sorted if m.contains(id)) {
        val sib = id ^ 1L
        val par = id >>> 1
        val c = m(id)
        val sc = m.getOrElse(sib, 0L)
        val pc = m.getOrElse(par, 0L)
        if (c + sc + pc <= t) {
          m.remove(id)
          m.remove(sib)
          if (pc == 0L) byLevel(lvl - 1) += par
          m.update(par, c + sc + pc)
        }
      }
      lvl -= 1
    }
    m.toMap
  }

  test("property: primitive compress is bit-identical to the boxed reference fold") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      b <- Gen.choose(4, 12)
      k <- Gen.choose(8, 64)
      nVals <- Gen.choose(1, 800)
      vs <- Gen.listOfN(nVals, Gen.choose(0L, (1L << b) - 1))
    } yield (b, k, vs)
    val prop = Prop.forAll(gen) { case (b, k, vs) =>
      val leafBase = 1L << b
      val buf = new LongLongCountMap()
      vs.foreach(v => buf.addTo(leafBase + v, 1L))
      val expect = referenceCompress(
        vs.groupBy(identity).map { case (v, g) => (leafBase + v, g.size.toLong) }, k)
      QDigestAgg.compress(buf, k)
      var got = Map.empty[Long, Long]
      buf.foreachEntry((id, c) => got += (id -> c))
      got == expect
    }
    assert(SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop).passed)
  }
}
