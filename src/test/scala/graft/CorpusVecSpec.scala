package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the c65 vector-curation operator beyond the
  * oracle hash: the whole centroid→distance→flag cascade is replayed by
  * an independent in-memory BigInt model (shares only the ×10⁴ scaling
  * expression with the query — the joins and aggregates under test are
  * plain Scala collections here).
  */
class CorpusVecSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("c65: query matches an independent in-memory distance model bit-for-bit") {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label",
        "transform(embedding, x -> CAST(CAST(x AS DECIMAL(12,4)) * 10000 AS BIGINT)) AS sv")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
    assert(rows.nonEmpty)
    val expect = rows.groupBy(_._2).toSeq.map { case (label, vs) =>
      val n = vs.length
      val dims = vs.head._3.length
      val cs = Array.tabulate(dims)(i => vs.map(v => BigInt(v._3(i))).sum)
      val d = vs.map { case (_, _, v) =>
        (0 until dims).map(i => (BigInt(v(i)) * n - cs(i)).abs).sum
      }
      val sumD = d.sum
      val nOut = d.count(x => x * n * 16 > 17 * sumD).toLong
      (label, n.toLong, (sumD / (BigInt(n) * BigInt(n))).toLong, nOut)
    }.sortBy(_._1)
    val got = SparkEntry.queries("c65_label_outliers")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect,
      s"label-outlier cascade diverged from the model:\n got=$got\n exp=$expect")
  }

  test("c65: the 17/16 flag reads the tail, never the bulk") {
    val out = SparkEntry.queries("c65_label_outliers")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(out.nonEmpty)
    for ((nVecs, nOutliers) <- out)
      // above-mean mass is < half by Markov; a 1.0625× threshold must
      // flag strictly less than that (equality would mean the threshold
      // sits below the mean — a broken cross-multiply).
      assert(nOutliers < nVecs / 2 + 1,
        s"outlier flag caught $nOutliers of $nVecs — threshold is reading the bulk")
  }
}
