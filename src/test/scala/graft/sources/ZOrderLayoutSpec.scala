package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.ZOrder

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderLayoutSpec extends AnyFunSuite with SparkSpec {

  private def perFileBounds(path: String, dim: String): Array[(Long, Long)] =
    new java.io.File(path).listFiles
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(dim)), max(col(dim))).head()
        (r.getLong(0), r.getLong(1))
      }

  test("z-order layout bounds BOTH dims per file; x-sort bounds only x") {
    import spark.implicits._
    // 16k points over a 256×256 grid, decorrelated dims
    val pts = (0 until 16384).map { i =>
      ((i * 2654435761L % 65536) % 256, (i * 40503L % 65536) % 256)
    }.toDF("x", "y")
    val zDir = Files.createTempDirectory("zorder").toFile.getAbsolutePath
    val xDir = Files.createTempDirectory("xsort").toFile.getAbsolutePath

    ZOrderLayout.write(pts, col("x"), col("y"), nFiles = 16, zDir)
    pts.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xDir)

    // data survives exactly
    val before = pts.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val after = spark.read.parquet(zDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(after.toSeq == before.toSeq)

    // a narrow y-window (1/8 of the range) should prune most z-ordered
    // files via footer min/max, but NO x-sorted file (each spans all y)
    val (yLo, yHi) = (64L, 95L)
    def hits(dir: String): Int = perFileBounds(dir, "y")
      .count { case (lo, hi) => hi >= yLo && lo <= yHi }
    val zHits = hits(zDir)
    val xHits = hits(xDir)
    assert(xHits >= 15, s"x-sorted layout should be unprunable on y, hit $xHits/16")
    assert(zHits * 2 <= xHits,
      s"z-order must prune at least half the files on a y predicate ($zHits vs $xHits)")

    // and x stays prunable too: no file spans the whole x range
    val xSpans = perFileBounds(zDir, "x").map { case (lo, hi) => hi - lo }
    assert(xSpans.count(_ >= 255) <= 4,
      "most z-ordered files must box x as well, not span the full range")
  }

  test("zvalue16 interleave: known bit patterns") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .select(ZOrder.zvalue16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x fills even bits, y odd bits
    assert(rows == Seq(0L, 1L, 2L, 3L, 0x55555555L, 0xAAAAAAAAL))
  }
}
