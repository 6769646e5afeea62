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

  test("numerator constant stays in long range with max-rank headroom") {
    // 33 = 32 hash bits + 1 is the largest rank; Num * 1 register of
    // rank 33 scales the harmonic term to exactly Num >> 0 — the
    // construction only works because Num < 2^63.
    assert(HllDistinct.Num > 0L, "silent long overflow in Num")
    assert(HllDistinct.Num == 697000L * 32L * 32L * 8589934592L)
  }
}
