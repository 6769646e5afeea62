package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** TimeSeries similarity search: the banded signature blocking must be
  * a pure speed-up — full recall at signature Hamming ≤ 3 (pigeonhole
  * over the 4 × 6-bit bands), and the distributed pipeline must equal a
  * straight-line Scala model of profile → signature → candidates → L1.
  */
class TimeSeriesSpec extends AnyFunSuite with SparkSpec {

  private lazy val events: DataFrame =
    graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "events")

  /** Collected profiles: user → (hour → cents). */
  private lazy val profiles: Map[Long, Map[Long, Long]] =
    TimeSeries.hourlyProfile(events).collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        u -> rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
      }

  private lazy val sigs: Map[Long, Long] =
    TimeSeries.signature(TimeSeries.hourlyProfile(events)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def bands(sig: Long): Seq[Long] =
    Seq(sig & 63L, (sig >> 6) & 63L, (sig >> 12) & 63L, (sig >> 18) & 63L)

  private def shareBand(a: Long, b: Long): Boolean =
    bands(a).zip(bands(b)).exists { case (x, y) => x == y }

  private def l1(a: Map[Long, Long], b: Map[Long, Long]): Long =
    (a.keySet ++ b.keySet).toSeq
      .map(h => math.abs(a.getOrElse(h, 0L) - b.getOrElse(h, 0L))).sum

  test("signature replays the above-average sign bits of the profile") {
    for ((u, prof) <- profiles.take(50)) {
      val tot = prof.values.sum
      val expected = prof.collect {
        case (h, v) if v * 24 > tot => 1L << h.toInt
      }.sum
      assert(sigs(u) == expected, s"signature mismatch for user $u")
    }
  }

  test("banded candidates have full recall at signature Hamming <= 3") {
    val users = sigs.keys.toSeq.sorted
    for {
      i <- users.indices; j <- (i + 1) until users.size
      (a, b) = (users(i), users(j))
      if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= 3
    } assert(shareBand(sigs(a), sigs(b)),
      s"pair ($a,$b) at Hamming ${java.lang.Long.bitCount(sigs(a) ^ sigs(b))} " +
        "must share a band (pigeonhole over 4 bands)")
  }

  test("topKSimilarPairs equals the straight-line model on sf0.001") {
    val k = 20
    val users = sigs.keys.toSeq.sorted
    val expected = (for {
      i <- users.indices; j <- (i + 1) until users.size
      (a, b) = (users(i), users(j))
      if shareBand(sigs(a), sigs(b))
    } yield (a, b, l1(profiles(a), profiles(b))))
      .sortBy { case (a, b, d) => (d, a, b) }
      .take(k)
    val got = TimeSeries.topKSimilarPairs(events, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }
}
