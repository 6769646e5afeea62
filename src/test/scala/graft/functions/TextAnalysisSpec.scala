package graft.functions

import graft.SparkSpec

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String, Long)*): DataFrame =
    rows.toDF("doc_id", "text", "lang", "n_chars")

  test("langId votes by stopword markers with fixed precedence") {
    val d = docs(
      (0L, "the cat of the house is big", "en", 27L),
      (1L, "der hund und die katze ist hier", "de", 31L),
      (2L, "xyzzy plugh quux", "zz", 16L))
    val out = TextAnalysis.langId(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("en", "en")) == 1L)
    assert(out(("de", "de")) == 1L)
    assert(out(("zz", "und")) == 1L)
  }

  test("qualityByLang aggregates integers and derives ratios once") {
    val d = docs(
      (0L, "one two three", "en", 300L),
      (1L, "four five", "en", 100L))
    val r = TextAnalysis.qualityByLang(d).collect().head
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("total_tokens") == 5L)
    assert(r.getAs[Double]("avg_tokens") == 2.5)
    assert(r.getAs[Double]("share_long") == 0.5)
  }

  test("tokenCounts: whitespace words and ceil(len/4) subwords") {
    val d = docs((0L, "a bcde fghijklm", "en", 15L))
    val r = TextAnalysis.tokenCounts(d).collect().head
    assert(r.getAs[Long]("n_words") == 3L)
    // ceil(1/4)=1, ceil(4/4)=1, ceil(8/4)=2
    assert(r.getAs[Long]("n_subwords") == 4L)
    assert(r.getAs[Long]("n_word_chars") == 13L)
  }

  test("fingerprintGroups: identical docs share a fingerprint, shorts skipped") {
    val d = docs(
      (0L, "w1 w2 w3 w4 w5", "en", 14L),
      (1L, "w1 w2 w3 w4 w5", "en", 14L),
      (2L, "only three toks", "en", 15L)) // < 4 tokens: excluded
    val out = TextAnalysis.fingerprintGroups(d).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("doc_ids") == "0,1")
  }
}
