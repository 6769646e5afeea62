package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** NULL-text semantics of the exact-dedup census: the driver testdata
  * has no NULL text, so the oracle gate can never exercise the rule.
  * This spec pins it: b1's DataFrame twin and its SqlEntry text must
  * agree on a corpus WITH NULL text, and the NULL row must count as one
  * distinct value (the c24 coalesce-to-'' rule) — not silently vanish
  * from count(DISTINCT).
  */
class NullTextSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("nulltext").toFile
    // reuse the real tables for everything registerViews loads...
    for (t <- SqlEntry.tableNames if t != "documents") {
      Files.createSymbolicLink(
        new java.io.File(d, s"$t.parquet").toPath,
        Paths.get(s"/root/testdata/sf0.001/$t.parquet"))
    }
    // ...but swap documents for a corpus with NULL text: srcA has two
    // identical docs + one NULL; srcB has one doc + two NULLs.
    Seq(
      (1L, "same text", "en", "srcA", 9L),
      (2L, "same text", "en", "srcA", 9L),
      (3L, null.asInstanceOf[String], "en", "srcA", 0L),
      (4L, "only doc", "en", "srcB", 8L),
      (5L, null.asInstanceOf[String], "en", "srcB", 0L),
      (6L, null.asInstanceOf[String], "en", "srcB", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(d, "documents.parquet").toString)
    d.getAbsolutePath
  }

  test("b1 twin counts a NULL-text row as one distinct hash") {
    val rows = graft.queries.GroupB.queries("b1_exact_dedup")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // srcA: 3 docs, 2 distinct ({'same text', NULL}), 1 dupe
    // srcB: 3 docs, 2 distinct ({'only doc', NULL}), 1 dupe (2nd NULL)
    assert(rows.toSeq == Seq(("srcA", 3L, 2L, 1L), ("srcB", 3L, 2L, 1L)))
  }

  test("b1 SQL text matches the twin on NULL text row-for-row") {
    val twin = graft.queries.GroupB.queries("b1_exact_dedup")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val text = SqlEntry.sql(spark, dir, "b1_exact_dedup")
      .collect().map(_.toSeq).toSeq
    assert(text == twin)
  }

  // The r8 review found this exact divergence class twice: a null-key
  // filter applied to a DataFrame path but not its SQL twin (or vice
  // versa) passes every oracle run — the testdata has no NULLs — and
  // detonates on the first hostile corpus. Pin the round's new queries
  // against it mechanically: DataFrame twin ≡ SQL text on a corpus
  // WITH NULL text, and the output shape stays sane.
  for (q <- Seq("c45_hll_distinct", "c71_overlap_hll", "c72_membership_gate")) {
    test(s"$q SQL text matches the twin on NULL text row-for-row") {
      val twin = SparkEntry.queries(q)(spark, dir).collect().map(_.toSeq).toSeq
      val text = SqlEntry.sql(spark, dir, q).collect().map(_.toSeq).toSeq
      assert(text == twin, s"$q diverges on a NULL-text corpus")
    }
  }

  // c73's hostile corpus (found in the r8 review): a NULL lang (Spark
  // sorts NULLS FIRST, DuckDB NULLS LAST — an unguarded GROUP BY lang
  // diverges cross-engine) and a lang whose docs are ALL empty (every
  // v=0 ⇒ w=0 ⇒ tw=0 — an unguarded digest eval returns NULL and the
  // band boolean goes NULL against the oracle's literal TRUE). The
  // fixed c73 filters both in all three spellings.
  private lazy val dirLang: String = {
    val d = Files.createTempDirectory("nulllang").toFile
    for (t <- SqlEntry.tableNames if t != "documents") {
      Files.createSymbolicLink(
        new java.io.File(d, s"$t.parquet").toPath,
        Paths.get(s"/root/testdata/sf0.001/$t.parquet"))
    }
    Seq(
      (1L, "alpha beta gamma", "en", "srcA", 16L),
      (2L, "delta epsilon", "en", "srcA", 13L),
      (3L, "uno dos tres cuatro", "es", "srcA", 19L),
      (4L, "orphan words here", null.asInstanceOf[String], "srcA", 17L),
      (5L, "", "zz", "srcB", 0L),        // lang with ONLY empty docs
      (6L, "   ", "zz", "srcB", 3L))     // whitespace-only ⇒ v = 0 too
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(new java.io.File(d, "documents.parquet").toString)
    d.getAbsolutePath
  }

  test("c73 on NULL/empty langs: three spellings agree; no NULL rows escape") {
    val twin = SparkEntry.queries("c73_weighted_quantiles")(spark, dirLang)
      .collect()
    val text = SqlEntry.sql(spark, dirLang, "c73_weighted_quantiles")
      .collect()
    assert(twin.map(_.toSeq).toSeq == text.map(_.toSeq).toSeq,
      "c73 DataFrame twin and SQL text diverge on a NULL-lang corpus")
    val langs = twin.map(_.getString(0)).toSeq
    assert(langs == Seq("en", "es"),
      s"NULL lang and the zero-weight lang must be excluded, got $langs")
    assert(twin.forall(r => !r.isNullAt(r.fieldIndex("sketch_within_band")) &&
      r.getBoolean(r.fieldIndex("sketch_within_band"))),
      "the band boolean must be a literal TRUE, never NULL — the oracle " +
        "pins it as TRUE")
  }

  test("c71 on NULL text: null keys leave registers, not fabricated estimates") {
    val rows = SparkEntry.queries("c71_overlap_hll")(spark, dir).collect()
    // both sources still have non-null docs, so exactly the one pair
    // appears; a source whose keys were ALL null would drop instead of
    // getting an empty-register estimate
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "srcA" && r.getString(1) == "srcB")
    assert(r.getLong(6) == 0L, "srcA and srcB share no non-null doc")
  }
}
