package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float], Int)*): DataFrame =
    rows.toDF("vec_id", "embedding", "label")

  test("brute-force top-k ranks an identical vector first") {
    val d = emb(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (1L, Seq(1f, 0f, 0f, 0f), 0), // identical to query 0
      (2L, Seq(0.9f, 0.1f, 0f, 0f), 0), // close
      (3L, Seq(0f, 1f, 0f, 0f), 0)) // orthogonal
    val out = Similarity.bruteForceTopK(d, 100, 3).collect() // query = vec 0
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(math.abs(out.head.getAs[Double]("cos") - 1.0) < 1e-9)
    val orth = out.find(_.getLong(1) == 3L).get.getAs[Double]("cos")
    assert(math.abs(orth) < 1e-9)
  }

  test("sign-LSH buckets by leading-dimension signs and restricts search") {
    val d = emb(
      (0L, Seq(1f, 1f, -1f, 1f, 5f), 0),
      (20L, Seq(2f, 1f, -2f, 1f, 4f), 0), // same bucket as 0: ++-+
      (2L, Seq(-1f, 1f, 1f, 1f, 3f), 0)) // different bucket
    val buckets = Similarity.signBucket(d, 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[String]("bucket")).toMap
    assert(buckets(0L) == "1101" && buckets(20L) == "1101" && buckets(2L) == "0111")
    val out = Similarity.lshTopK(d, 20, 3, 4).collect()
    // queries 0 and 20 only see each other (vec 2 is in another bucket)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 20L), (20L, 0L)))
  }

  test("IVF k-means + multi-probe recall@k vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.bruteForceTopK(emb, 50, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(lloydIters: Int, nProbe: Int): Double = {
      val ivf = Similarity.ivfTopK(emb, 50, 3, 8, lloydIters, nProbe).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute & ivf).size.toDouble / brute.size
    }
    val kmeans = recall(2, 1)
    val multi = recall(2, 6)
    info(f"recall@3: k-means single-probe $kmeans%.3f, 6-probe $multi%.3f")
    // Probe monotonicity is a THEOREM for a fixed codebook: probe sets
    // nest (ranks 1..1 ⊆ 1..6), candidate sets nest, and a true top-3
    // neighbor in the candidates can only be displaced by a closer
    // vector — itself a true top-3. (A cross-codebook comparison like
    // trained-vs-untrained at single probe is NOT asserted: on 30
    // queries of near-uniform vectors it is a coin flip, and sampled
    // training makes the flip visible.)
    assert(multi >= kmeans)
    // the shipped c12 config (8 cells, 2 Lloyd iters on the % 2
    // training subsample, 6 probes — swept in IvfSweep): production-
    // grade recall, same floor c28 holds itself to. The synthetic
    // embeddings are near-uniform, so recall tracks the scanned
    // fraction; clustered real corpora reach the floor at much smaller
    // probe fractions.
    assert(multi >= 0.9)
  }

  test("int8-quantized ANN recalls nearly all exact top-k neighbors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.bruteForceTopK(emb, 50, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.quantizedTopK(emb, 50, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & quant).size.toDouble / brute.size
    info(f"int8 recall@3 vs exact: $recall%.3f")
    // int8 keeps ~7 significant bits per element — ranking flips only
    // happen between near-equal cosines
    assert(recall >= 0.9)
  }

  test("PQ ANN: ADC shortlist + exact rerank recalls the exact top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val brute = Similarity.bruteForceTopK(emb, 50, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(emb, 50, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    info(f"PQ recall@3 vs exact: $recall%.3f")
    // near-uniform synthetic data is PQ's worst case (no cluster
    // structure for the codebooks to exploit): recall tracks the
    // shortlist fraction (~16% here). The two-stage shape still has
    // to hold a floor; clustered real corpora reach it with far
    // smaller shortlists
    assert(recall >= 0.7, f"PQ recall $recall%.3f below floor")
    // determinism: two runs identical (codebooks are collected state,
    // but training is deterministic end to end)
    val pq2 = Similarity.pqTopK(emb, 50, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq == pq2)
  }

  test("near-dup pairs: only same-label pairs above threshold") {
    val d = emb(
      (0L, Seq(1f, 2f, 3f, 4f), 7),
      (1L, Seq(1f, 2f, 3f, 4f), 7), // dup, same label
      (2L, Seq(1f, 2f, 3f, 4f), 8), // dup content, OTHER label: blocked out
      (3L, Seq(-4f, 3f, -2f, 1f), 7)) // dissimilar
    val out = Similarity.nearDupPairs(d, 0.99).collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((0L, 1L)))
  }

  test("semDedup drops the higher-id member of a within-cell near-dup pair") {
    // Non-seed ids are multiples of TrainSampleMod so the Lloyd rounds
    // (which train on the % 2 subsample {0,2,4,...}) see a member of
    // each cell.
    val d = emb(
      (0L, Seq(1f, 0f, 0f, 0f), 0), // seed of cell 0 (and in the sample)
      (1L, Seq(0f, 1f, 0f, 0f), 0), // seed of cell 1
      (4L, Seq(1f, 0.01f, 0f, 0f), 0), // near-dup of 0 → same cell, dropped
      (8L, Seq(-1f, 0.2f, 0f, 0f), 0)) // lands in cell 1, below τ vs vec 1
    val out = Similarity.semDedup(d, nCells = 2, lloydIters = 1, tau = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) == (2L, 1L)) // {0, 5}: 5 dropped (cos ≈ 1 > τ)
    assert(out(1L) == (2L, 0L)) // {1, 7}: cos ≈ 0.2 < τ, both kept
  }
}
