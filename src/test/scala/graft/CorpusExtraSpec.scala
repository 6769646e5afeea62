package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the round-4 corpus operators — beyond the
  * oracle hash (QueriesSpec/selfcheck), these assert the MEANING the
  * scaladocs claim: the MinHash estimate actually tracks exact Jaccard,
  * prefix overlap dominates exact overlap, BPE pairs are well-formed.
  */
class CorpusExtraSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("c60: jaccard proxy is monotone in the minhash match count") {
    // E[n_match/8] = J, so bucket means must order with n_match — if
    // they don't, the sketch can't be used to prune verification work.
    val rows = SparkEntry.queries("c60_minhash_calibration")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(4))) // (n_match, proxy_x1000)
    val proxies = rows.sortBy(_._1).map(_._2).toSeq
    assert(proxies.zip(proxies.tail).forall { case (a, b) => a <= b },
      s"calibration not monotone: ${rows.mkString(", ")}")
    // and the top bucket (all 8 hashes agree) must be near-duplicate
    // territory — a sketch whose best bucket averages < 0.5 Jaccard is
    // mis-implemented.
    val top = rows.maxBy(_._1)
    assert(top._2 >= 500, s"8/8-match bucket proxy too low: ${top._2}")
  }

  test("c58: exact overlap never exceeds prefix overlap") {
    val rows = SparkEntry.queries("c58_cross_source_overlap")(spark, dir)
      .collect().map(r => (r.getLong(2), r.getLong(3))) // (prefix, exact)
    assert(rows.nonEmpty)
    assert(rows.forall { case (p, e) => e <= p },
      "exact-hash matches are a subset of prefix-hash matches")
  }

  test("c59: every BPE pair is 2 chars; occurrences dominate types") {
    val rows = SparkEntry.queries("c59_bpe_pairs")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._1.length == 2), "adjacent pairs are exactly 2 chars")
    assert(rows.forall { case (_, occ, types) => occ >= types },
      "each contributing token type occurs at least once")
  }
}
