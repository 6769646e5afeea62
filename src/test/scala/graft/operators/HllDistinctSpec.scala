package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HllDistinctSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("estimate lands within the published accuracy band") {
    val out = HllDistinct.estimate(docs, col("lang"), col("text")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      // sigma = 1.04/sqrt(32) = 18.4%; 2.5 sigma keeps the test stable
      // while still catching a broken register/rank/alpha pipeline.
      assert(math.abs(est - exact) <= math.max(3L, (exact * 0.46).toLong),
        s"lang=${r.getString(0)}: est $est vs exact $exact out of band")
    }
  }

  test("sketch is partitioning-invariant (max/sum are order-free)") {
    val a = HllDistinct.estimate(docs, col("lang"), col("text")).collect().toSeq
    val b = HllDistinct.estimate(docs.repartition(13), col("lang"), col("text"))
      .collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }

  test("duplicates never move the estimate (rank max is idempotent)") {
    val doubled = docs.union(docs)
    val a = HllDistinct.estimate(docs, col("lang"), col("text"))
      .select("g", "n_est").collect().map(_.toString).toSeq
    val b = HllDistinct.estimate(doubled, col("lang"), col("text"))
      .select("g", "n_est").collect().map(_.toString).toSeq
    assert(a == b, "exact-duplicate rows must not change any register")
  }

  test("NULL groups are excluded deliberately, not dropped by the join") {
    import spark.implicits._
    val df = Seq((Some("en"), "a"), (Some("en"), "b"), (None, "c"))
      .toDF("lang", "text")
    val out = HllDistinct.estimate(df, col("lang"), col("text")).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("en"),
      "exactly the non-null groups appear — nothing half-counted")
    assert(out.head.getLong(1) == 2L)
  }

  test("register union (element-wise max) estimates the set union — c71's merge") {
    // The mergeability claim behind c71's inclusion-exclusion: taking
    // the element-wise max of two groups' register rows must equal the
    // registers of the CONCATENATED key set (the defining HLL property),
    // so the pairwise union estimate is the single-set estimator applied
    // to merged registers — same accuracy band, no new error source.
    val twoSrc = docs.withColumn("grp",
      when(col("doc_id") % 2 === 0, "a").otherwise("b"))
    val regs = HllDistinct.registers(twoSrc, col("grp"), col("text"))
    val merged = regs.groupBy(col("bucket")).agg(max(col("mj")).as("mj"))
      .withColumn("g", lit("ab"))
    val direct = HllDistinct.registers(
      twoSrc.withColumn("grp", lit("ab")), col("grp"), col("text"))
    val m = merged.select("bucket", "mj").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val d = direct.select("bucket", "mj").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m == d, "max-merged registers must equal registers of the union set")
    // and the readout of the merged registers lands in the band vs the
    // exact distinct count of the union
    val s = merged.agg(sum(
      expr("shiftleft(CAST(1 AS BIGINT), CAST(33 - mj AS INT))")).as("s"))
      .select(HllDistinct.estFromS("s").as("est")).collect().head.getLong(0)
    val exact = docs.select(md5(col("text").cast("binary"))).distinct().count()
    assert(math.abs(s - exact) <= math.max(3L, (exact * 0.46).toLong),
      s"union estimate $s vs exact $exact out of band")
  }

  test("numerator constant stays in long range with max-rank headroom") {
    // 33 = 32 hash bits + 1 is the largest rank; Num * 1 register of
    // rank 33 scales the harmonic term to exactly Num >> 0 — the
    // construction only works because Num < 2^63.
    assert(HllDistinct.Num > 0L, "silent long overflow in Num")
    assert(HllDistinct.Num == 697000L * 32L * 32L * 8589934592L)
  }
}
