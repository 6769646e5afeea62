package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** TimeSeries similarity search: the banded signature blocking must be
  * a pure speed-up — full recall at 96-bit signature Hamming ≤ 7
  * (pigeonhole over the 8 × 12-bit bands), and the distributed pipeline
  * must equal a straight-line Scala model of quarter-profile →
  * signature → candidates → hourly L1.
  */
class TimeSeriesSpec extends AnyFunSuite with SparkSpec {

  private lazy val events: DataFrame =
    graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "events")

  /** Collected quarter profiles: user → (qh → cents). */
  private lazy val qprofiles: Map[Long, Map[Long, Long]] =
    TimeSeries.quarterProfile(events).collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        u -> rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
      }

  /** Hourly verify profiles derived the same way topKSimilarPairs does:
    * hour = qh div 4.
    */
  private lazy val profiles: Map[Long, Map[Long, Long]] =
    qprofiles.map { case (u, qp) =>
      u -> qp.groupBy(_._1 / 4).map { case (h, qs) => h -> qs.values.sum }
    }

  /** (lo, hi) 48-bit signature halves per user. */
  private lazy val sigs: Map[Long, (Long, Long)] =
    TimeSeries.signature96(TimeSeries.quarterProfile(events)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def bands(sig: (Long, Long)): Seq[(Int, Long)] = {
    val (lo, hi) = sig
    Seq(0 -> (lo & 4095L), 1 -> ((lo >> 12) & 4095L),
      2 -> ((lo >> 24) & 4095L), 3 -> ((lo >> 36) & 4095L),
      4 -> (hi & 4095L), 5 -> ((hi >> 12) & 4095L),
      6 -> ((hi >> 24) & 4095L), 7 -> ((hi >> 36) & 4095L))
  }

  private def shareBand(a: (Long, Long), b: (Long, Long)): Boolean =
    bands(a).zip(bands(b)).exists { case (x, y) => x == y }

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  private def l1(a: Map[Long, Long], b: Map[Long, Long]): Long =
    (a.keySet ++ b.keySet).toSeq
      .map(h => math.abs(a.getOrElse(h, 0L) - b.getOrElse(h, 0L))).sum

  test("signature96 replays the above-average sign bits of the quarter profile") {
    for ((u, qp) <- qprofiles.take(50)) {
      val tot = qp.values.sum
      val expLo = qp.collect {
        case (q, v) if q < 48 && v * 96 > tot => 1L << q.toInt
      }.sum
      val expHi = qp.collect {
        case (q, v) if q >= 48 && v * 96 > tot => 1L << (q.toInt - 48)
      }.sum
      assert(sigs(u) == ((expLo, expHi)), s"signature mismatch for user $u")
    }
  }

  test("hourly profile equals the qh div 4 roll-up of the quarter profile") {
    val direct = TimeSeries.hourlyProfile(events).collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        u -> rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
      }
    assert(direct == profiles)
  }

  test("banded candidates have full recall at signature Hamming <= 7") {
    val users = sigs.keys.toSeq.sorted
    for {
      i <- users.indices; j <- (i + 1) until users.size
      (a, b) = (users(i), users(j))
      if hamming(sigs(a), sigs(b)) <= 7
    } assert(shareBand(sigs(a), sigs(b)),
      s"pair ($a,$b) at Hamming ${hamming(sigs(a), sigs(b))} " +
        "must share a band (pigeonhole over 8 bands)")
  }

  test("band key space is 8 x 4096 (the SimHash-order blocking constant)") {
    // Not a data assertion — a design pin: every band value must fit in
    // 12 bits so the (band_id, bv) key space is 32,768, restoring the
    // 1/|keyspace| candidate constant the 100 TB argument needs.
    for ((_, sig) <- sigs; (bid, bv) <- bands(sig)) {
      assert(bid >= 0 && bid < 8 && bv >= 0 && bv < 4096)
    }
  }

  /** All-pairs (candFilter = keep-all) or banded model of the pipeline. */
  private def model(k: Int, candFilter: (Long, Long) => Boolean): Seq[(Long, Long, Long)] = {
    val users = sigs.keys.toSeq.sorted
    (for {
      i <- users.indices; j <- (i + 1) until users.size
      (a, b) = (users(i), users(j))
      if candFilter(a, b)
    } yield (a, b, l1(profiles(a), profiles(b))))
      .sortBy { case (a, b, d) => (d, a, b) }
      .take(k)
  }

  test("topKSimilarPairs takes the exact all-pairs branch below the user cap") {
    // sf0.001 has ~15 users, far under BruteForceUserCap: the declared
    // query must return the EXACT top-k (the banded 32,768-key blocking
    // would legitimately find zero collisions at this population).
    assert(sigs.size <= TimeSeries.BruteForceUserCap)
    val got = TimeSeries.topKSimilarPairs(events, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == model(20, (_, _) => true))
    assert(got.nonEmpty)
  }

  test("banded path (cap forced to 0) equals the straight-line banded model") {
    val got = TimeSeries.topKSimilarPairs(events, 20, bruteCap = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == model(20, (a, b) => shareBand(sigs(a), sigs(b))))
  }

  test("equal-profile rescue: identical-profile users past the bucket cap " +
      "keep their distance-0 pairs") {
    // The r9-advice recall hole: users with IDENTICAL profiles share
    // every band bucket, so once that population passes BandBucketCap
    // the cap dropped ALL their pairs — the most-similar pairs in the
    // corpus vanished from the top-k. Build a population of cap+44
    // byte-identical users (every bucket overfull, bruteCap forced off)
    // and assert the rescue still surfaces their L1=0 pairs, paired
    // consecutively by user_id.
    import spark.implicits._
    val n = (TimeSeries.BandBucketCap + 44).toInt
    val ev = (0 until n).map(u =>
        (u.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val got = TimeSeries.topKSimilarPairs(ev, 20, bruteCap = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.size == 20, "the capped buckets must not empty the top-k")
    assert(got.forall(_._3 == 0L), "rescued pairs are exact duplicates")
    assert(got == (0L until 20L).map(u => (u, u + 1, 0L)),
      "consecutive-rank pairing by user_id, smallest pairs first")
  }

  test("the bucket/brute cap literals in the DuckDB oracle and the SQL " +
      "text match the operator's constants (three-spelling desync guard)") {
    // The constants live in TimeSeries; the oracle (ExtOps) and the
    // spark.sql text (SqlEntry) necessarily hard-code the same numbers
    // inside SQL strings. A future cap change that misses a spelling
    // would silently diverge the engines — this pins all three.
    val oracle = graft.SparkEntry.oracleSql("c51_ts_similar_users")
    val text = graft.SqlEntry.sparkSql("c51_ts_similar_users")
    val cap = s"count(*) <= ${TimeSeries.BandBucketCap}"
    for ((s, where) <- Seq(oracle -> "oracle", text -> "sparkSql")) {
      assert(s.contains(cap),
        s"$where must apply the BandBucketCap=${TimeSeries.BandBucketCap} filter")
      assert(s.contains(s"<= ${TimeSeries.BruteForceUserCap}") &&
        s.contains(s"> ${TimeSeries.BruteForceUserCap}"),
        s"$where must branch on BruteForceUserCap=${TimeSeries.BruteForceUserCap}")
    }
  }
}
