package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication operators for LLM-data pipelines: MinHash+LSH
  * and SimHash near-dup detection (the exact-hash pass lives in
  * GroupB.b1). All hashing is md5-based so the DuckDB oracle can replay
  * every step bit-for-bit; at 100 TB the shapes are what matter:
  *
  *  - MinHash/LSH shuffles on (band_id, band_value) — candidate
  *    generation never materializes the O(n²) pair space;
  *  - exact Jaccard verification runs only on LSH candidates;
  *  - SimHash reduces each doc to a 16-bit fingerprint, so the
  *    bucket-groupBy shuffles 2 bytes per doc.
  */
object Dedup {

  val NumHashes = 8
  val NumBands = 2 // 4 minhashes per band

  /** Distinct (doc_id, tok) postings for sampled docs. */
  def tokenPostings(docs: DataFrame, sampleMod: Int): DataFrame =
    docs.filter(col("doc_id") % sampleMod === 0)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()

  /** MinHash signature per doc: minhash_j = min(md5("<j>|" ++ tok)).
    * String-min over lowercase hex is engine-portable (binary collation
    * both sides).
    */
  def minhashSignatures(postings: DataFrame): DataFrame = {
    val aggs = (0 until NumHashes).map { j =>
      min(md5(concat(lit(s"$j|"), col("tok")).cast("binary"))).as(s"m$j")
    }
    postings.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: docs sharing at least one band (band = concat of
    * 4 consecutive minhashes), with the number of shared bands.
    */
  def lshCandidates(signatures: DataFrame): DataFrame = {
    val banded = signatures.selectExpr("doc_id",
      "stack(2, 0, concat(m0, m1, m2, m3), 1, concat(m4, m5, m6, m7)) AS (band_id, bv)")
    val a = banded.select(col("band_id"), col("bv"), col("doc_id").as("da"))
    val b = banded.select(col("band_id"), col("bv"), col("doc_id").as("db"))
    a.join(b, Seq("band_id", "bv")).filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("shared_bands"))
  }

  /** Exact token-set Jaccard on given pairs (columns da, db) — the
    * verification pass, O(candidates), not O(n²).
    */
  def verifyJaccard(pairs: DataFrame, postings: DataFrame): DataFrame = {
    val sizes = postings.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(postings.select(col("doc_id").as("da"), col("tok")), "da")
      .join(postings.select(col("doc_id").as("db"), col("tok").as("tok2")), "db")
      .filter(col("tok") === col("tok2"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    pairs.join(inter, Seq("da", "db"), "left")
      .join(sizes.select(col("doc_id").as("da"), col("sz").as("sa")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("sz").as("sb")), "db")
      .select(col("da"), col("db"), col("shared_bands"),
        (coalesce(col("inter"), lit(0L)).cast("double") /
          (col("sa") + col("sb") - coalesce(col("inter"), lit(0L)))).as("jaccard"))
  }

  /** Full MinHash→LSH→verify pipeline over `documents`. The postings
    * relation feeds three consumers (signatures, sizes, intersection);
    * recomputing it is cheaper than caching at these sizes (measured), and
    * at 100 TB the materialize-the-inverted-index decision belongs to the
    * caller (write postings to parquet once, feed many dedup runs).
    */
  def minhashLsh(docs: DataFrame, sampleMod: Int): DataFrame = {
    val postings = tokenPostings(docs, sampleMod)
    val cands = lshCandidates(minhashSignatures(postings))
    verifyJaccard(cands, postings)
      .orderBy(col("jaccard").desc, col("da"), col("db"))
      .limit(50)
  }

  /** 16-bit SimHash per doc: bit j is the sign of the sum over token
    * instances of ±1 by the j-th hex digit's high bit of md5(tok).
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(expr("filter(split(text, ' '), t -> t <> '')")).as("tok"))
      .withColumn("h", md5(col("tok").cast("binary")))
    val sums = (1 to 16).map { j =>
      sum(when(expr(s"substring(h, $j, 1)") >= lit("8"), 1).otherwise(-1)).as(s"s$j")
    }
    val agg = toks.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
    val fp: Column = (1 to 16)
      .map(j => when(col(s"s$j") > 0, lit(1L << (j - 1))).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash collision buckets (Hamming distance 0): near-dup groups. */
  def simhashBuckets(docs: DataFrame): DataFrame =
    simhash(docs)
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("n_docs"),
        concat_ws(",", sort_array(collect_list(col("doc_id").cast("string")))).as("doc_ids"))
      .filter(col("n_docs") > 1)
      .orderBy(col("simhash"))

  /** Character-shingle (3-gram) Jaccard over sampled docs — the n-gram
    * flavor of near-dup detection; pair space bounded by the sample.
    */
  def shingleJaccard(docs: DataFrame, sampleMod: Int, k: Int = 20): DataFrame = {
    // Positions capped at 2047 (matches the oracle's constant range — a
    // prefix-window bound, like fingerprinting the first ~2 KB); texts
    // under 3 chars have no shingles (sequence() would DESCEND for a
    // negative span — the length filter is load-bearing).
    val shingles = docs.filter(col("doc_id") % sampleMod === 0)
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"),
        explode(expr("sequence(1, least(length(text) - 2, 2047))")).as("i"), col("text"))
      .select(col("doc_id"), expr("substring(text, i, 3)").as("sh"))
      .distinct()
    val sizes = shingles.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = shingles.select(col("doc_id").as("da"), col("sh"))
    val b = shingles.select(col("doc_id").as("db"), col("sh"))
    a.join(b, "sh").filter(col("da") < col("db"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("da"), col("sz").as("sa")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("sz").as("sb")), "db")
      .select(col("da"), col("db"),
        (col("inter").cast("double") / (col("sa") + col("sb") - col("inter"))).as("jaccard"))
      .orderBy(col("jaccard").desc, col("da"), col("db"))
      .limit(k)
  }
}
