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

  test("real PNG/JPEG payloads decode real dimensions via javax.imageio") {
    // Real fixtures, no checked-in binaries: rasterize a BufferedImage
    // with the same JDK that will decode it.
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xFF8800)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    val root = Files.createTempDirectory("imgtree").toFile
    Files.write(new java.io.File(root, "wide.png").toPath, imageBytes(31, 17, "png"))
    Files.write(new java.io.File(root, "tall.jpg").toPath, imageBytes(8, 25, "jpg"))
    Files.write(new java.io.File(root, "not_an_image.png").toPath,
      "plain text wearing a .png extension".getBytes)

    val feats = Multimodal.extractFeatures(
        BinaryTree.asMedia(spark, root.getAbsolutePath))
      .collect()

    val png = feats.find(f => f.kind == "png" && f.width == 31).get
    assert(png.height == 17 && png.n_frames == 1 && png.sampled_frames == 1)
    assert(feats.exists(f => f.kind == "jpg" && f.width == 8 && f.height == 25))
    // the mislabeled text file must fall back to the stub, not crash
    val fake = feats.find(_.n_bytes == 35L).get
    assert(fake.width == 35 % 640 && fake.height == (35 * 7) % 480)
  }

  test("content-hash dedup finds cross-path duplicates") {
    val root = mkTree()
    val dups = BinaryTree.dupContent(spark, root.getAbsolutePath).collect()
    assert(dups.length == 1)
    val paths = dups.head.getSeq[String](2)
    assert(paths.exists(_.endsWith("a.jpg")) && paths.exists(_.endsWith("dup.jpg")))
  }
}
