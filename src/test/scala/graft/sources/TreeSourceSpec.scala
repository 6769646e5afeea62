package graft.sources

import java.nio.file.Files

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TreeSourceSpec extends AnyFunSuite with SparkSpec {

  private def mkTree(): java.io.File = {
    val root = Files.createTempDirectory("v2tree").toFile
    val sub = new java.io.File(root, "sub"); sub.mkdirs()
    val deep = new java.io.File(sub, "deep"); deep.mkdirs()
    val other = new java.io.File(root, "other"); other.mkdirs()
    Files.write(new java.io.File(root, "top.txt").toPath, "12345".getBytes)
    Files.write(new java.io.File(sub, "a.txt").toPath, "abc".getBytes)
    Files.write(new java.io.File(deep, "b.txt").toPath, "zz".getBytes)
    root
  }

  test("graft-tree lists the full tree with the '.'-for-root rule") {
    val root = mkTree()
    val df = spark.read.format("graft-tree").load(root.getAbsolutePath)
    val rows = df.collect().map(r =>
      (r.getAs[String]("relative"), r.getAs[Long]("length"), r.getAs[Boolean]("is_dir")))
      .toSet
    assert(rows == Set(
      (".", 0L, true),
      ("sub", 0L, true),
      ("sub/deep", 0L, true),
      ("other", 0L, true),
      ("top.txt", 5L, false),
      ("sub/a.txt", 3L, false),
      ("sub/deep/b.txt", 2L, false)))
  }

  test("listing parallelizes: one partition per top-level subtree plus the root") {
    val root = mkTree()
    val df = spark.read.format("graft-tree").load(root.getAbsolutePath)
    assert(df.rdd.getNumPartitions == 3) // sub, other, root-files
  }

  test("filters push into the walk and pruned columns never materialize") {
    val root = mkTree()
    val df = spark.read.format("graft-tree").load(root.getAbsolutePath)
      .filter(col("is_dir") === false && col("relative").startsWith("sub"))
      .select(col("relative"), col("length"))
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rows == Set(("sub/a.txt", 3L), ("sub/deep/b.txt", 2L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-tree"), plan)
    assert(plan.contains("StringStartsWith(relative,sub)") &&
      plan.contains("Not(EqualTo(is_dir,true))"),
      s"both filters must report as pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<relative:string,length:bigint>"),
      s"scan must read only the projected columns:\n$plan")
  }

  test("residual filters still apply post-scan (length predicate not pushed)") {
    val root = mkTree()
    val df = spark.read.format("graft-tree").load(root.getAbsolutePath)
      .filter(col("length") > 2L)
    assert(df.collect().map(_.getAs[String]("relative")).toSet ==
      Set("top.txt", "sub/a.txt"))
  }

  test("a single-file root lists exactly itself") {
    val root = mkTree()
    val one = spark.read.format("graft-tree")
      .load(new java.io.File(root, "top.txt").getAbsolutePath)
    val rows = one.collect().map(r =>
      (r.getAs[String]("relative"), r.getAs[Boolean]("is_dir"))).toSeq
    assert(rows == Seq((".", false)))
  }
}
