package graft.functions

import graft.SparkSpec

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TokenNgramsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val fixture = docs(
    1L -> "a b c d e",
    2L -> "one",
    3L -> "x  y z", // doubled space: raw adjacency breaks, skip-empty bridges
    4L -> " lead trail ",
    5L -> "",
    6L -> "naïve café ünïcode token mix",
    7L -> ("w " * 5000).trim) // past the 4094-start bigram cap

  private def native(n: Int, maxStarts: Int, skipEmpty: Boolean): Set[(Long, String)] =
    fixture.select(col("doc_id"),
        explode(GraftBridge.column(TokenNgrams(
          GraftBridge.expression(col("text")), n, maxStarts, skipEmpty))).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("raw-adjacency bigrams match the HOF filter-transform model (the c23 shape)") {
    val model = fixture
      .withColumn("a", split(col("text"), " "))
      .filter(size(col("a")) >= 2)
      .select(col("doc_id"),
        explode(expr(
          """filter(
            |  transform(sequence(0, least(size(a) - 2, 4093)),
            |            i -> named_struct('x', a[i], 'y', a[i + 1])),
            |  p -> p.x <> '' AND p.y <> '')""".stripMargin)).as("p"))
      .select(col("doc_id"), concat(col("p.x"), lit(" "), col("p.y")).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(native(2, 4094, skipEmpty = false) == model)
  }

  test("skip-empty 4-gram shingles match the HOF slice model (the c10 shape)") {
    val model = fixture
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .filter(size(col("toks")) >= 4)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(1, size(toks) - 3), i -> array_join(slice(toks, i, 4), ' '))"))
          .as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(native(4, Int.MaxValue, skipEmpty = true) == model)
  }

  test("mode semantics: doubled spaces break raw adjacency but not skip-empty") {
    val raw = native(2, 4094, skipEmpty = false)
    val skip = native(2, Int.MaxValue, skipEmpty = true)
    assert(!raw.contains((3L, "x y")) && !raw.contains((3L, "x  y")))
    assert(raw.contains((3L, "y z")))
    assert(skip.contains((3L, "x y")) && skip.contains((3L, "y z")))
  }

  test("all graft kernels are callable from SQL text after registration") {
    org.apache.spark.sql.GraftBridge.registerFunctions(spark)
    fixture.createOrReplaceTempView("ngram_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, explode(token_ngrams(text, 2, 4094, false)) AS g
        |FROM ngram_docs""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(viaSql == native(2, 4094, skipEmpty = false))
    // simhash64 + minhash_bands ride the same registration path
    val hashed = spark.sql(
      "SELECT simhash64(text) AS fp, minhash_bands(text) AS mb FROM ngram_docs WHERE doc_id = 1")
      .collect().head
    assert(hashed.getLong(0) != 0L && hashed.getSeq[String](1).length == 2)
  }

  test("property: kernel matches a naive string model on random space-laden input") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // naive model: raw split on single spaces, same two modes
    def model(text: String, n: Int, maxStarts: Int, skipEmpty: Boolean): Seq[String] = {
      val slots = text.split(" ", -1).toSeq
      val toks = if (skipEmpty) slots.filter(_.nonEmpty) else slots
      (0 until math.min(math.max(toks.length - n + 1, 0), maxStarts)).flatMap { i =>
        val grams = toks.slice(i, i + n)
        if (!skipEmpty && grams.exists(_.isEmpty)) None
        else Some(grams.mkString(" "))
      }
    }
    def kernel(text: String, n: Int, maxStarts: Int, skipEmpty: Boolean): Seq[String] = {
      val arr = NgramOps.ngrams(
        org.apache.spark.unsafe.types.UTF8String.fromString(text).getBytes,
        n, maxStarts, skipEmpty)
      (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    }
    val textGen = Gen.listOf(Gen.oneOf(Gen.oneOf('a', 'b', 'c'), Gen.const(' ')))
      .map(_.mkString)
    val p = Prop.forAll(textGen, Gen.choose(1, 4), Gen.choose(1, 6),
        Gen.oneOf(true, false)) { (text, n, maxStarts, skipEmpty) =>
      kernel(text, n, maxStarts, skipEmpty) == model(text, n, maxStarts, skipEmpty)
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p).passed)
  }

  test("the bigram start cap bounds output for pathological docs") {
    val raw = native(2, 4094, skipEmpty = false)
    assert(raw.count(_._1 == 7L) == 1, "4999 identical bigrams dedup to one value")
    val counts = fixture.filter(col("doc_id") === 7L)
      .select(explode(GraftBridge.column(TokenNgrams(
        GraftBridge.expression(col("text")), 2, 4094, skipEmpty = false))).as("g"))
      .count()
    assert(counts == 4094L, s"start cap must bound the explode, got $counts")
  }
}
