package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("minhash LSH finds exact duplicates with jaccard 1.0") {
    val d = docs(
      0L -> "alpha beta gamma delta",
      5L -> "alpha beta gamma delta", // exact dup of 0 (both % 5 == 0)
      10L -> "completely different words here",
      3L -> "ignored by sampling mod")
    val out = Dedup.minhashLsh(d, 5).collect()
    val pair = out.find(r => r.getLong(0) == 0L && r.getLong(1) == 5L)
    assert(pair.isDefined, "exact dup pair (0,5) must be an LSH candidate")
    assert(pair.get.getAs[Double]("jaccard") == 1.0)
    assert(pair.get.getAs[Long]("shared_bands") == 2L)
    // dissimilar docs share no band
    assert(!out.exists(r => r.getLong(0) == 0L && r.getLong(1) == 10L))
  }

  test("native minhash_bands is bit-identical to the declarative postings model") {
    import org.apache.spark.sql.functions._
    // The pre-r3 declarative formulation (postings DISTINCT → 8 string-
    // min aggregates → stacked band concats) as the independent model —
    // also what the DuckDB oracle replays.
    def model(d: DataFrame, sampleMod: Int): Set[(Long, Int, String)] = {
      val postings = Dedup.tokenPostings(d, sampleMod)
      val aggs = (0 until Dedup.NumHashes).map { j =>
        min(md5(concat(lit(s"$j|"), col("tok")).cast("binary"))).as(s"m$j")
      }
      postings.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
        .selectExpr("doc_id",
          "stack(2, 0, concat(m0, m1, m2, m3), 1, concat(m4, m5, m6, m7)) AS (band_id, bv)")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    }
    val d = docs(
      0L -> "alpha beta gamma delta",
      5L -> "  doubled  spaces   and repeats repeats ",
      10L -> "naïve café ünïcode",
      15L -> "single",
      20L -> "", // no tokens: no band rows either side
      25L -> "left out by sampling", // 25 % 5 == 0, kept
      3L -> "dropped by sampling mod")
    val native = Dedup.minhashBanded(d, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(native == model(d, 5))
    assert(!native.exists(_._1 == 20L))
  }

  test("candidate-restricted verify is bit-identical to the full-postings model") {
    // r3: minhashVerified joins each candidate pair to the two docs'
    // distinct-token ARRAYS and intersects with a compiled builtin; this
    // model is the pre-r3 postings formulation it must reproduce exactly.
    val d = docs(
      0L -> "alpha beta gamma delta epsilon",
      5L -> "alpha beta gamma delta epsilon", // exact dup of 0
      10L -> "alpha beta gamma delta zeta", // near dup of 0/5
      15L -> "totally different content here", // no shared band
      20L -> "", // no tokens
      25L -> "  spaced   out  alpha beta gamma delta epsilon ")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val model = Dedup.verifyJaccard(
      Dedup.lshCandidates(Dedup.minhashBanded(d, 5)), Dedup.tokenPostings(d, 5))
      .collect().map(key).toSet
    val opt = Dedup.minhashVerified(d, 5).collect().map(key).toSet
    assert(opt == model)
    assert(opt.nonEmpty)
  }

  test("simhash: identical docs collide; 64-bit fingerprint uses all digit bits") {
    val d = docs(1L -> "spark shuffles data fast", 2L -> "spark shuffles data fast",
      3L -> "unrelated content entirely")
    val fps = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L)) // 64 bits: unrelated docs do not collide
    val buckets = Dedup.simhashBuckets(d).collect()
    assert(buckets.exists(_.getAs[String]("doc_ids") == "1,2"))
  }

  test("native simhash64 is bit-identical to the declarative 64-sum model") {
    import org.apache.spark.sql.functions._
    // The pre-r3 declarative formulation (explode → hex digits → 64
    // conditional sums), kept here as the independent model the native
    // expression must reproduce bit-for-bit — it is also what the DuckDB
    // oracle replays.
    def model(d: DataFrame): Map[Long, Long] = {
      val toks = d
        .select(col("doc_id"), explode(expr("filter(split(text, ' '), t -> t <> '')")).as("tok"))
        .withColumn("h", md5(col("tok").cast("binary")))
      val digits = (1 to 16).map { p =>
        expr(s"instr('0123456789abcdef', substring(h, $p, 1)) - 1").as(s"d$p")
      }
      val sums = (1 to 64).map { j =>
        val p = (j - 1) / 4 + 1
        val mask = 8 >> ((j - 1) % 4)
        sum(when(expr(s"((d$p div $mask) % 2) = 1"), 1).otherwise(-1)).as(s"s$j")
      }
      val fp = (1 to 64)
        .map(j => when(col(s"s$j") > 0, lit(1L << (j - 1))).otherwise(lit(0L)))
        .reduce(_ + _)
      toks.select(col("doc_id") +: digits: _*)
        .groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
        .select(col("doc_id"), fp.as("simhash"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val d = docs(
      1L -> "spark shuffles data fast",
      2L -> "  leading  doubled   spaces ",
      3L -> "single",
      4L -> "naïve café — multibyte ünïcode tokens",
      5L -> "a b c d e f g h i j k l m n o p q r s t u v w x y z",
      6L -> "repeated repeated repeated token token bias")
    assert(Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == model(d))
    // no-token docs are dropped, matching the model's explode row set
    val empty = docs(7L -> "", 8L -> "   ", 9L -> "kept")
    assert(Dedup.simhash(empty).collect().map(_.getLong(0)).toSet == Set(9L))
    // bands are bit slices of the fingerprint
    val bands = Dedup.simhashBands(d).collect()
      .map(r => r.getLong(0) -> (0 until 4).map(k => r.getLong(k + 1))).toMap
    val fps = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, fp) <- fps; k <- 0 until 4)
      assert(bands(id)(k) == ((fp >>> (16 * k)) & 0xFFFFL))
  }

  test("simhash near-dup: banded candidates find hamming<=3 pairs, full recall") {
    val d = docs(1L -> "spark shuffles data fast", 2L -> "spark shuffles data fast",
      3L -> "unrelated content entirely", 4L -> "spark shuffles data fast quickly")
    val out = Dedup.simhashNearDup(d, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // identical docs at hamming 0; doc 3 must not pair with anything
    assert(out.contains((1L, 2L, 0L)))
    assert(!out.exists(t => t._1 == 3L || t._2 == 3L))
    // brute-force check: every hamming<=3 pair is found (pigeonhole recall)
    val fps = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = fps.keys.toSeq.sorted.combinations(2).collect {
      case Seq(a, b) if java.lang.Long.bitCount(fps(a) ^ fps(b)) <= 3 =>
        (a, b, java.lang.Long.bitCount(fps(a) ^ fps(b)).toLong)
    }.toSet
    assert(out.toSet == expected)
  }

  test("incremental near-dup equals the full pairs restricted to batch x corpus") {
    val d = docs(1L -> "spark shuffles data fast", 2L -> "spark shuffles data fast",
      3L -> "unrelated content entirely", 4L -> "spark shuffles data fast quickly",
      5L -> "spark shuffles data fast", 6L -> "other text altogether here")
    val corpus = d.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val batch = d.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1)
    val inc = Dedup.incrementalNearDup(corpus, batch, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // model: all-pairs near-dup over the union, keep (odd, even) pairs
    val all = Dedup.simhashNearDup(d, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = all.flatMap { case (a, b, h) =>
      if (a % 2 == 1 && b % 2 == 0) Some((a, b, h))
      else if (b % 2 == 1 && a % 2 == 0) Some((b, a, h))
      else None
    }.toSet
    assert(inc == expected && inc.nonEmpty)
    // batch-batch and corpus-corpus pairs must NOT appear
    assert(inc.forall { case (a, b, _) => a % 2 == 1 && b % 2 == 0 })
  }

  test("dedupGroups: transitively connected near-dups form one component labeled by min id") {
    // 0-5-10 form a chain of identical docs (transitivity must merge
    // them); 15+20 identical pair; 25 unrelated singleton (excluded).
    val d = docs(
      0L -> "spark shuffles data fast tonight",
      5L -> "spark shuffles data fast tonight",
      10L -> "spark shuffles data fast tonight",
      15L -> "completely different words here",
      20L -> "completely different words here",
      25L -> "unrelated lone document text")
    val groups = Dedup.dedupGroups(d, 5, 0.98).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(groups.toSeq == Seq((0L, 3L, "0,10,5"), (15L, 2L, "15,20")))
  }

  test("dedupGroups merges a diameter-2 chain through the loop (A~B~C, A!~C)") {
    // A and C are NOT direct near-dups (J = 98/102 ≈ 0.961 < 0.98) but
    // both neighbor B (J = 99/101 ≈ 0.980) — the component only merges
    // if label propagation actually iterates past the fused round-1
    // initialization (A learns of C through B on round 2).
    val base = (1 to 100).map(i => s"w$i")
    val a = base.mkString(" ")
    val b = (base.dropRight(1) :+ "u1").mkString(" ")
    val c = (base.dropRight(2) ++ Seq("u1", "v1")).mkString(" ")
    val d = docs(0L -> a, 5L -> b, 10L -> c)
    val groups = Dedup.dedupGroups(d, 5, 0.98).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(groups.toSeq == Seq((0L, 3L, "0,10,5")))
  }

  test("shingle jaccard: identical docs score 1.0, order deterministic") {
    val d = docs(0L -> "abcdefghij", 25L -> "abcdefghij", 50L -> "zzzzzzzzzz")
    val out = Dedup.shingleJaccard(d, 25).collect()
    assert(out.head.getLong(0) == 0L && out.head.getLong(1) == 25L)
    assert(out.head.getAs[Double]("jaccard") == 1.0)
  }

  test("verifyJaccard handles disjoint candidate pair (coalesce path)") {
    val postings = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("doc_id", "tok")
    val pairs = Seq((1L, 2L, 1L)).toDF("da", "db", "shared_bands")
    val out = Dedup.verifyJaccard(pairs, postings).collect()
    assert(out.length == 1 && out.head.getAs[Double]("jaccard") == 0.0)
  }

  test("winnowing is bit-identical to an in-memory model; short docs keep one fp") {
    // Independent model: md5 every k-gram, take each w-window's min,
    // distinct — plain Scala, no Spark.
    def model(text: String, k: Int, w: Int): Set[String] = {
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.length < k) return Set.empty
      val hs = toks.sliding(k).map { g =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(g.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }.toVector
      val starts = 0 to math.max(0, hs.length - w)
      starts.map(s => hs.slice(s, s + w).min).toSet
    }
    val rows = Seq(
      0L -> "a b c d e f g h i j k l m n o p",
      1L -> "x y z w", // exactly one gram: one fingerprint
      2L -> "a b c d e f g h", // ng=5 < w: single truncated window
      3L -> "one two", // under k tokens: no grams, no fingerprints
      4L -> "a b c d e f g h i j k l m n o p") // dup of 0
    val d = docs(rows: _*)
    val got = Dedup.winnowFingerprints(d).collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    for ((id, text) <- rows) {
      val want = model(text, 4, 8)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id fingerprint set")
    }
    assert(got(1L).size == 1 && got(2L).size == 1 && !got.contains(3L))
    assert(got(0L) == got(4L), "identical docs share the whole fingerprint set")
  }

  test("winnowing guarantee: a shared run of >= w+k-1 tokens yields a shared fp") {
    // Two docs that differ everywhere except an 11-token (= 8+4-1)
    // common run embedded at different offsets — the SIGMOD'03 detection
    // guarantee says at least one fingerprint must collide.
    val run = "q r s t u v w x y z zz"
    val d = docs(
      0L -> s"aa bb cc dd $run ee ff",
      1L -> s"mm nn $run oo pp qq rr ss tt")
    val fps = Dedup.winnowFingerprints(d).collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(0L) & fps(1L)).nonEmpty,
      "an 11-token shared run must collide on at least one fingerprint")
  }
}
