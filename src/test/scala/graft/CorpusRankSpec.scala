package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the c62–c64 corpus operators, beyond the
  * oracle hash: c62 is replayed bit-for-bit by an independent in-memory
  * PageRank model (Maps + BigInt — no Spark, no SQL), c63's purge
  * invariants and c64's share/boost algebra are asserted directly.
  */
class CorpusRankSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("c62: query matches an independent in-memory PageRank model bit-for-bit") {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0)).filter(_ != null)
    // Bigram counts (skip-empty adjacency, self-loops dropped) …
    val pairs = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for (t <- texts) {
      val tk = t.split(" ").filter(_.nonEmpty)
      for (i <- 0 until tk.length - 1 if tk(i) != tk(i + 1))
        pairs((tk(i), tk(i + 1))) += 1
    }
    // … symmetrized, with out-weight and degree per node …
    val e = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    pairs.foreach { case ((u, v), c) => e((u, v)) += c; e((v, u)) += c }
    val wt = e.toSeq.groupBy(_._1._1).map { case (u, m) => u -> m.map(_._2).sum }
    val degree = e.toSeq.groupBy(_._1._1).map { case (u, m) => u -> m.size.toLong }
    // … 4 rounds of the damped update in BigInt (positive operands, so
    // BigInt / == the floor division both engines pin).
    var r = wt.keys.map(_ -> BigInt(1000000)).toMap
    for (_ <- 1 to 4) {
      val contrib = mutable.Map.empty[String, BigInt].withDefaultValue(BigInt(0))
      e.foreach { case ((u, v), w) => contrib(v) += r(u) * w / wt(u) }
      r = wt.keys.map(v => v -> (BigInt(850) * contrib(v) / 1000 + 150000)).toMap
    }
    val expect = r.toSeq.map { case (tok, rk) => (tok, degree(tok), wt(tok), rk.toLong) }
      .sortBy { case (tok, _, _, rk) => (-rk, tok) }.take(30)
    val got = SparkEntry.queries("c62_textrank_keywords")(spark, dir)
      .collect().map(row => (row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3)))
      .toSeq
    assert(got == expect, s"TextRank diverged from the model:\n got=$got\n exp=$expect")
  }

  test("c62: every rank is at least the teleport floor") {
    val ranks = SparkEntry.queries("c62_textrank_keywords")(spark, dir)
      .collect().map(_.getLong(3))
    assert(ranks.length == 30)
    assert(ranks.forall(_ >= 150000L),
      "damped update bottoms out at (1-d)·1e6 = 150000 for any node with in-edges")
  }

  test("c67: triangle census matches a brute-force in-memory triple scan") {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0)).filter(_ != null)
    val pairs = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for (t <- texts) {
      val tk = t.split(" ").filter(_.nonEmpty)
      for (i <- 0 until tk.length - 1 if tk(i) != tk(i + 1))
        pairs((tk(i), tk(i + 1))) += 1
    }
    val und = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    pairs.foreach { case ((u, v), c) =>
      und(if (u < v) (u, v) else (v, u)) += c
    }
    val edges = und.filter(_._2 >= 5).keySet
    val nodes = edges.flatMap { case (u, v) => Seq(u, v) }.toSeq.sorted
    // brute force: every ordered triple, no orientation cleverness — the
    // query's degree-ordered join must find exactly these triangles.
    val cnt = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      if edges((nodes(i), nodes(j)))
      k <- (j + 1) until nodes.length
      if edges((nodes(j), nodes(k))) && edges((nodes(i), nodes(k)))
    } { cnt(nodes(i)) += 1; cnt(nodes(j)) += 1; cnt(nodes(k)) += 1 }
    val expect = cnt.toSeq.sortBy { case (tok, n) => (-n, tok) }.take(10)
    val got = SparkEntry.queries("c67_triangle_tokens")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect,
      s"triangle census diverged from brute force:\n got=$got\n exp=$expect")
    assert(expect.exists(_._2 > 0), "fixture graph must contain triangles")
  }

  test("c63: purge closure dominates direct requests; kept + purged = total") {
    val rows = SparkEntry.queries("c63_tombstone_purge")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    for ((src, nDocs, nReq, nPurged, nKept) <- rows) {
      assert(nPurged >= nReq,
        s"$src: a requested doc is in its own content closure ($nPurged < $nReq)")
      assert(nKept + nPurged == nDocs, s"$src: kept + purged != total")
    }
    assert(rows.map(_._3).sum > 0, "the doc_id % 97 request set must be non-empty")
  }

  test("c64: shares sum to ~1e6; low-resource boost is monotone in corpus size") {
    val rows = SparkEntry.queries("c64_temperature_mix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(rows.length >= 2, "need at least two languages for the mix to mean anything")
    val pSum = rows.map(_._3).sum
    // each of the L languages truncates at most 1 millionth
    assert(pSum <= 1000000L && pSum >= 1000000L - rows.length,
      s"temperature shares must sum to 1e6 up to truncation, got $pSum")
    val byTokens = rows.sortBy(_._2)
    // α = 1/2 damps the head: the smallest language is boosted at least
    // as much as the largest (strict ordering can tie only under the
    // ×1000 truncation, hence the non-strict assert at the extremes).
    assert(byTokens.head._4 >= byTokens.last._4,
      "smallest language must be boosted at least as much as the largest")
    assert(byTokens.head._4 >= 1000L, "an up-sampled language has boost ≥ 1×")
    assert(byTokens.last._4 <= 1000L, "the head language is damped to ≤ 1×")
  }
}
