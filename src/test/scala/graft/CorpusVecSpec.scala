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

  test("c66: a planted mislabel in a separable fixture is flagged as suspect") {
    import spark.implicits._
    // Two orthogonal clusters of 8 vectors each (64-dim; dim 0 vs dim 1
    // dominant, per-vector jitter on a unique higher dim keeps vectors
    // distinct). vec 0 seeds cell A, vec 1 seeds cell B (the Lloyd seed
    // rule is vec_id < nCells), and membership is chosen so the % 2
    // TRAINING SAMPLE ({0,2,4,...}) covers both clusters — it contains
    // members of A and of B. Labels follow the cluster — except vec 15, planted in
    // cluster B with cluster A's label: its 5 nearest neighbors all
    // vote label 1, so it must be the one suspect.
    def vec(dom: Int, j: Int): Array[Float] = {
      val a = Array.fill(64)(0.0f)
      a(dom) = 1.0f
      a(2 + j % 14) = 0.05f + 0.01f * j
      a
    }
    val aIds = Set(0, 2, 4, 6, 9, 11, 13, 14)
    val rows = (0 until 16).map { i =>
      val inA = aIds(i)
      val label = if (i == 15) 0 else if (inA) 0 else 1
      (i.toLong, vec(if (inA) 0 else 1, i), label)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity
      .knnLabelAgreement(emb, k = 5, nCells = 2, lloydIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byLabel = out.map(r => r._1 -> r).toMap
    // label 0: 8 clean cluster-A vectors (full agreement among
    // themselves) + the planted mislabel (zero agreement).
    assert(byLabel(0L)._4 == 1L,
      s"exactly the planted mislabel must be suspect, got $out")
    assert(byLabel(1L)._4 == 0L, s"cluster B is clean, got $out")
    // not unanimous: the mislabel sits IN cluster B's cell, so the one
    // clean vector nearest to it counts a disagreeing neighbor — pooled
    // agreement stays far above the 400-permille suspect line.
    assert(byLabel(1L)._3 > 900L,
      s"clean cluster B must agree near-unanimously, got $out")
  }
}
