package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The columnar kernels' contract: every kernel must reproduce its
  * row-path twin EXACTLY (same rows, same nulls) — the kernel is a
  * faster execution of the same aggregate, never a different aggregate.
  * The digest path is the one deliberate exception: estimates depend on
  * merge order, so the contract there is the QDigestAgg rank-error band
  * plus exact n/lo/hi.
  */
class ColumnarKernelSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def li: DataFrame = spark.read.parquet(s"$dir/lineitem.parquet")

  // a small parquet fixture with null flags AND null values, written once
  private lazy val nullDir: String = {
    val d = java.nio.file.Files.createTempDirectory("colkernel_nulls").toString
    val schema = StructType(Seq(
      StructField("flag", StringType, nullable = true),
      StructField("price", DoubleType, nullable = true)))
    val rows = (0 until 5000).map { i =>
      val flag = i % 7 match {
        case 0 => null
        case 1 | 2 => "A"
        case 3 | 4 | 5 => "B"
        case _ => "C"
      }
      val price = if (i % 11 == 0) null
        else java.lang.Double.valueOf((i % 997) + (i % 100) / 100.0)
      Row(flag, price)
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 3), schema)
      .write.mode("overwrite").parquet(s"$d/t.parquet")
    s"$d/t.parquet"
  }

  private def nullTable: DataFrame = spark.read.parquet(nullDir)

  test("scanBatches: Some for a pure scan projection, None otherwise") {
    assert(ColumnarKernel.scanBatches(
      li.select(col("l_returnflag"), col("l_extendedprice"))).isDefined)
    // the index map follows the SCAN's output, not the select order
    val (_, idx) = ColumnarKernel.scanBatches(
      li.select(col("l_returnflag"), col("l_extendedprice"))).get
    assert(idx.keySet == Set("l_returnflag", "l_extendedprice"))
    // a filter is NOT a benign wrapper (pushdown is advisory — a
    // post-scan Filter remains and the kernel would skip it)
    assert(ColumnarKernel.scanBatches(
      li.select(col("l_returnflag")).filter(col("l_returnflag") === "A")).isEmpty)
    // computed projections are not benign either
    assert(ColumnarKernel.scanBatches(
      li.select((col("l_extendedprice") * 2).as("p"))).isEmpty)
    // aggregates/exchanges are not scans
    assert(ColumnarKernel.scanBatches(
      li.groupBy("l_returnflag").count()).isEmpty)
  }

  test("K1 partials: merged n/lo/hi identical to the row aggregate; digest in band") {
    val partials = ColumnarKernel.flagStatsDigestPartials(
      spark, li, "l_returnflag", "l_extendedprice", 24, 2048).get
    val merged = partials.groupBy("flag").agg(
        sum(col("n")).as("n"), min(col("lo")).as("lo"), max(col("hi")).as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val row = li.select(col("l_returnflag").as("flag"),
        expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("v"))
      .groupBy("flag").agg(count(lit(1)).as("n"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(merged == row)

    // digest estimates: rank(est) within bits·⌊n/k⌋+1 of the target rank
    val mergeCol = org.apache.spark.sql.GraftBridge.column(
      graft.functions.QDigestMergeAgg(
        org.apache.spark.sql.GraftBridge.expression(col("dig")),
        24, 2048, Seq(500, 900)).toAggregateExpression())
    val est = partials.groupBy("flag").agg(mergeCol.as("est"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toMap
    val vals = li.select(col("l_returnflag").as("flag"),
        expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((flag, sorted) <- vals; (permille, slot) <- Seq((500, 0), (900, 1))) {
      val n = sorted.length.toLong
      val target = (permille.toLong * n + 999L) / 1000L
      val e = est(flag)(slot)
      val rankLe = sorted.count(_ <= e).toLong
      val rankLt = sorted.count(_ < e).toLong
      val bound = 24L * (n / 2048L) + 1L
      assert(target >= rankLt + 1 - bound && target <= rankLe + bound,
        s"flag=$flag p$permille est=$e rank∈[${rankLt + 1},$rankLe] target=$target bound=$bound")
    }
  }

  test("K2 bucket counts: identical rows to the row-path groupBy") {
    for (shift <- Seq(8, 12)) {
      val kernel = ColumnarKernel.flagBucketCounts(
          spark, li, "l_returnflag", "l_extendedprice", shift).get
        .collect().map(r => (r.getString(0), r.get(1), r.getLong(2))).toSet
      val row = li.select(col("l_returnflag").as("flag"),
          expr(s"shiftright(CAST(ROUND(l_extendedprice * 100) AS BIGINT), $shift)").as("b"))
        .groupBy("flag", "b").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.get(1), r.getLong(2))).toSet
      assert(kernel == row, s"shift=$shift")
    }
  }

  test("K3 slice: identical row multiset to the broadcast-join extract") {
    val shift = 12
    // pick real buckets so the slice is non-empty
    val someBuckets = li.select(col("l_returnflag").as("flag"),
        expr(s"shiftright(CAST(ROUND(l_extendedprice * 100) AS BIGINT), $shift)").as("b"))
      .groupBy("flag", "b").count().orderBy(col("flag"), col("b"))
      .limit(6).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val kernel = ColumnarKernel.flagBucketSlice(
        spark, li, "l_returnflag", "l_extendedprice", shift, someBuckets).get
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    import spark.implicits._
    val selDf = someBuckets.toSeq.toDF("flag", "b")
    val row = li.select(col("l_returnflag").as("flag"),
        expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").as("v"))
      .withColumn("b", expr(s"shiftright(v, $shift)"))
      .join(broadcast(selDf), Seq("flag", "b"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(kernel == row)
    assert(kernel.nonEmpty)
  }

  test("null flags and null values: K1/K2 match their row twins exactly") {
    val partials = ColumnarKernel.flagStatsDigestPartials(
      spark, nullTable, "flag", "price", 24, 2048).get
    val merged = partials.groupBy("flag").agg(
        sum(col("n")).as("n"), min(col("lo")).as("lo"), max(col("hi")).as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.get(2), r.get(3)))
      .sortBy(t => Option(t._1).getOrElse("")).toSeq
    val row = nullTable.select(col("flag"),
        expr("CAST(ROUND(price * 100) AS BIGINT)").as("v"))
      .groupBy("flag").agg(count(lit(1)).as("n"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.get(2), r.get(3)))
      .sortBy(t => Option(t._1).getOrElse("")).toSeq
    assert(merged == row)
    assert(row.exists(_._1 == null), "fixture must exercise the null flag group")

    val kernel2 = ColumnarKernel.flagBucketCounts(
        spark, nullTable, "flag", "price", 10).get
      .collect().map(r => (r.getString(0), r.get(1), r.getLong(2))).toSet
    val row2 = nullTable.select(col("flag"),
        expr("shiftright(CAST(ROUND(price * 100) AS BIGINT), 10)").as("b"))
      .groupBy("flag", "b").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.get(1), r.getLong(2))).toSet
    assert(kernel2 == row2)
    assert(row2.exists(_._2 == null), "fixture must exercise the null-value bucket")
  }

  test("type gate: a DECIMAL value column falls back to the row path (None)") {
    // r14 ADVICE (medium): scanBatches gates on plan shape only; a
    // DECIMAL(12,2) price column would engage getDouble on a decimal
    // vector and read garbage. The kernels must refuse the schema.
    val d = java.nio.file.Files.createTempDirectory("colkernel_dec").toString
    li.select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(12,2)").as("l_extendedprice"))
      .write.mode("overwrite").parquet(s"$d/t.parquet")
    val dec = spark.read.parquet(s"$d/t.parquet")
    assert(ColumnarKernel.flagStatsDigestPartials(
      spark, dec, "l_returnflag", "l_extendedprice", 24, 2048).isEmpty)
    assert(ColumnarKernel.flagBucketCounts(
      spark, dec, "l_returnflag", "l_extendedprice", 12).isEmpty)
    assert(ColumnarKernel.flagBucketSlice(
      spark, dec, "l_returnflag", "l_extendedprice", 12, Set(("A", 1L))).isEmpty)
    // an int flag column is refused too
    val d2 = java.nio.file.Files.createTempDirectory("colkernel_intflag").toString
    li.select(col("l_linenumber").as("flag"), col("l_extendedprice"))
      .write.mode("overwrite").parquet(s"$d2/t.parquet")
    assert(ColumnarKernel.flagBucketCounts(
      spark, spark.read.parquet(s"$d2/t.parquet"), "flag", "l_extendedprice", 12).isEmpty)
  }

  test("enabled(): strict boolean parse, loud failure on anything else") {
    def withConf[T](v: Option[String])(f: => T): T = {
      v.foreach(spark.conf.set("spark.graft.columnarKernel", _))
      try f finally spark.conf.unset("spark.graft.columnarKernel")
    }
    assert(withConf(Some("true"))(ColumnarKernel.enabled(spark, false)))
    assert(!withConf(Some("false"))(ColumnarKernel.enabled(spark, true)))
    assert(withConf(Some(" TRUE "))(ColumnarKernel.enabled(spark, false)))
    intercept[IllegalArgumentException] {
      withConf(Some("1"))(ColumnarKernel.enabled(spark, true))
    }
    intercept[IllegalArgumentException] {
      withConf(Some("yes"))(ColumnarKernel.enabled(spark, true))
    }
    assert(withConf(None)(ColumnarKernel.enabled(spark, true)))
    assert(!withConf(None)(ColumnarKernel.enabled(spark, false)))
  }

  test("roundCents: bit-identical to SQL CAST(ROUND(x*100) AS BIGINT)") {
    import spark.implicits._
    // adversarial values: shortest-decimal .5 boundaries that sit a
    // half-ulp below/above .5 after ·100, plain 2-decimal prices, and
    // values whose double·100 drifts (e.g. 0.615*100 = 61.49999...)
    val vals = Seq(
      0.005, 0.015, 0.025, 0.615, 0.125, 0.135, 1.005, 2.675,
      12345.675, 999.995, 0.0, 17.5, 17.505, 8.885, 123.456,
      0.004999999999, 0.0050000001) ++
      (0 until 2000).map(i => (i % 997) + (i % 100) / 100.0)
    val sql = vals.toDF("x")
      .select(expr("CAST(ROUND(x * 100) AS BIGINT)").as("v"))
      .collect().map(_.getLong(0)).toSeq
    val kernel = vals.map(ColumnarKernel.roundCents)
    assert(kernel == sql,
      vals.zip(kernel).zip(sql).filter { case ((_, k), s) => k != s }
        .take(5).map { case ((x, k), s) => s"x=$x kernel=$k sql=$s" }
        .mkString("; "))
  }

  test("c70 end-to-end: kernel and row paths produce identical rows") {
    val q = graft.SparkEntry.queries("c70_quantile_sketch")
    def run(kernel: Boolean) = {
      spark.conf.set("spark.graft.columnarKernel", kernel.toString)
      try q(spark, dir).collect().map(_.toString).sorted.toSeq
      finally spark.conf.unset("spark.graft.columnarKernel")
    }
    val k = run(kernel = true)
    val r = run(kernel = false)
    assert(k == r)
    assert(k.nonEmpty)
  }
}
