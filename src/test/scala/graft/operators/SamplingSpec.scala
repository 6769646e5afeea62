package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("hash gate is deterministic and uniform-ish over a byte") {
    val g = docs.select(Sampling.hashGate(col("doc_id")).as("g"))
    val vals = g.collect().map(_.getInt(0))
    assert(vals.forall(v => v >= 0 && v < 256))
    val again = g.collect().map(_.getInt(0))
    assert(vals.toSeq == again.toSeq, "same rows → same gates, every run")
    // 500 draws over 256 buckets: the mean must sit near 127.5
    val mean = vals.map(_.toDouble).sum / vals.length
    assert(math.abs(mean - 127.5) < 20, s"suspiciously skewed gate mean $mean")
  }

  test("stratified sample applies per-stratum thresholds exactly") {
    val sampled = Sampling.stratifiedSample(
      docs, col("doc_id"), col("lang"), Map("en" -> 32, "de" -> 64), 128)
    val withGate = sampled.select(col("lang"), Sampling.hashGate(col("doc_id")).as("g")).collect()
    assert(withGate.forall { r =>
      val thr = r.getString(0) match { case "en" => 32; case "de" => 64; case _ => 128 }
      r.getInt(1) < thr
    }, "every kept row satisfies its stratum's gate")
    // and nothing below the gate was dropped: counts match a direct filter
    val direct = docs
      .filter(Sampling.hashGate(col("doc_id")) <
        when(col("lang") === "en", 32).when(col("lang") === "de", 64).otherwise(128))
      .count()
    assert(sampled.count() == direct)
  }

  test("weighted sample keeps exactly the rows whose gate clears their weight") {
    val d = docs.withColumn("n_tokens",
        size(expr("filter(split(text, ' '), x -> x <> '')")).cast("long"))
      .withColumn("w256", least(lit(240L), lit(16L) + col("n_tokens") * 2))
    val kept = Sampling.weightedSample(d, col("doc_id"), col("w256"))
    // the filter form ≡ the conditional form c37's single-pass audit uses
    val direct = d.filter(Sampling.hashGate(col("doc_id")) < col("w256"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      direct.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    assert(kept.count() > 0 && kept.count() < docs.count(),
      "weights must neither keep everything nor nothing on the synthetic corpus")
    // per-row: every kept row's gate is below its own weight
    val viol = kept.filter(Sampling.hashGate(col("doc_id")) >= col("w256")).count()
    assert(viol == 0)
  }

  test("rerunning the sample selects the identical row set") {
    def ids = Sampling.stratifiedSample(
      docs, col("doc_id"), col("lang"), Map("en" -> 32), 128)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == ids)
    assert(ids.nonEmpty)
  }
}
