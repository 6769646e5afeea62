package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-level (hierarchical) coarse assignment: the Spark projection
  * must equal a straight-line Scala model of stage-1 super argmax →
  * stage-2 member argmax, the flat path must stay in charge at and
  * below the threshold, and the approximation must stay useful —
  * assignment agreement with flat argmax and IVF recall floors on the
  * sf0.001 embeddings.
  */
class HierAssignSpec extends AnyFunSuite with SparkSpec {

  private lazy val emb: DataFrame =
    graft.queries.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  private lazy val base: DataFrame =
    emb.select(col("vec_id"), expr(Similarity.scaled("embedding")).as("ie"))
      .withColumn("nv", Similarity.norm("ie"))

  private def dotL(a: Seq[Long], b: Seq[Long]): Double =
    a.lazyZip(b).map(_ * _).sum / 1e8

  /** Codebook = the 20 lowest-id vectors (the seeding rule), size > the
    * 16-cell threshold so withCell dispatches hierarchical.
    */
  private lazy val cents: Seq[Similarity.Cent] =
    base.filter(col("vec_id") < 20).collect()
      .map(r => Similarity.Cent(r.getLong(0), r.getSeq[Long](1), r.getDouble(2)))
      .toSeq.sortBy(_.cid)

  private lazy val vecs: Seq[(Long, Seq[Long], Double)] =
    base.collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq, r.getDouble(2))).toSeq

  test("withCellHier equals the straight-line two-level model") {
    val nSupers = math.max(2, math.round(math.sqrt(cents.size.toDouble)).toInt)
    val groups = Similarity.groupCents(cents, nSupers)
    val expected = vecs.map { case (id, ie, nv) =>
      val si = groups.zipWithIndex.map { case ((sc, _), i) =>
        (dotL(ie, sc.ce) / (nv * sc.cn), -i)
      }.max._2 * -1
      val cell = groups(si)._2.map { c =>
        (dotL(ie, c.ce) / (nv * c.cn), -c.cid)
      }.max._2 * -1
      id -> cell
    }.toMap
    val got = Similarity.withCellHier(base, cents).select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("withCell dispatches flat at <= 16 cells (oracle sizes untouched)") {
    // at 8 cells the dispatcher must produce the flat argmax the DuckDB
    // oracle replays — modeled straight-line here
    val got = Similarity.withCell(base, cents.take(8))
      .select(col("vec_id"), col("cell")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val model = vecs.map { case (id, ie, nv) =>
      id -> cents.take(8).map(c => (dotL(ie, c.ce) / (nv * c.cn), -c.cid)).max._2 * -1
    }.toMap
    assert(got == model)
  }

  test("hierarchical assignment agrees with flat argmax on most vectors") {
    // flat argmax over ALL 20 cells, modeled in Scala (the projection
    // path would dispatch hierarchical at this size)
    val flat = vecs.map { case (id, ie, nv) =>
      id -> cents.map(c => (dotL(ie, c.ce) / (nv * c.cn), -c.cid)).max._2 * -1
    }.toMap
    val hier = Similarity.withCellHier(base, cents).select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = vecs.count { case (id, _, _) => flat(id) == hier(id) }
    val frac = agree.toDouble / vecs.size
    info(f"hier/flat agreement: $frac%.3f")
    assert(frac >= 0.5, f"two-level agreement $frac%.3f below floor")
  }

  test("ivfTopK above the threshold still recalls against brute force") {
    val k = 3
    val exact = Similarity.bruteForceTopK(emb, 50, k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hier = Similarity.ivfTopK(emb, 50, k, nCells = 20, lloydIters = 2,
        nProbe = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & hier).size.toDouble / exact.size
    info(f"recall@$k nCells=20 nProbe=12 (hier path): $recall%.3f")
    // measured 0.933 on the near-uniform synthetic embeddings
    assert(recall >= 0.8, f"recall $recall%.3f below floor")
  }
}
