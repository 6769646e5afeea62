package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d30's historization invariants, checked against the raw event table
  * rather than the query's own window chain.
  */
class Scd2Spec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("d30: exactly one open version per user; versions compress the event stream") {
    val out = SparkEntry.queries("d30_scd2")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val nUsers = ev.select(col("user_id")).distinct().count()
    val nEvents = ev.count()
    assert(out.map(_._3).sum == nUsers,
      "each user's LAST version stays open — opens must sum to distinct users")
    val nVersions = out.map(_._2).sum
    assert(nVersions <= nEvents, "a version only opens on a type change")
    assert(nVersions >= nUsers, "every user has at least one version")
    assert(out.forall { case (_, nv, nOpen, _) => nOpen <= nv },
      "open versions are a subset of versions")
    assert(out.forall(_._4 >= 0L), "closed durations are non-negative")
  }
}
