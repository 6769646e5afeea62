package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Multimodal

import org.scalatest.funsuite.AnyFunSuite

class BinaryTreeSpec extends AnyFunSuite with SparkSpec {

  private def mkTree(): java.io.File = {
    val root = Files.createTempDirectory("bintree").toFile
    val sub = new java.io.File(root, "sub"); sub.mkdirs()
    Files.write(new java.io.File(root, "a.jpg").toPath, "payload-a".getBytes)
    Files.write(new java.io.File(sub, "b.png").toPath, "payload-b".getBytes)
    Files.write(new java.io.File(sub, "dup.jpg").toPath, "payload-a".getBytes)
    root
  }

  test("recursive binaryFile read surfaces every file with content") {
    val root = mkTree()
    val df = BinaryTree.read(spark, root.getAbsolutePath)
    assert(df.count() == 3)
    assert(df.columns.toSet == Set("path", "modificationTime", "length", "content"))
  }

  test("asMedia feeds the multimodal pipeline end to end") {
    val root = mkTree()
    val media = BinaryTree.asMedia(spark, root.getAbsolutePath)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 3)
    assert(feats.forall(_.n_bytes == 9L)) // "payload-x".length
    assert(feats.map(_.kind).sorted.toSeq == Seq("jpg", "jpg", "png"))
  }

  test("content-hash dedup finds cross-path duplicates") {
    val root = mkTree()
    val dups = BinaryTree.dupContent(spark, root.getAbsolutePath).collect()
    assert(dups.length == 1)
    val paths = dups.head.getSeq[String](2)
    assert(paths.exists(_.endsWith("a.jpg")) && paths.exists(_.endsWith("dup.jpg")))
  }
}
