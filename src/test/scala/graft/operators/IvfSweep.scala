package graft.operators

/** Tuning harness: recall@3 of the IVF index vs the exact brute force
  * across (nCells, lloydIters, nProbe, trainMod) — run with
  * `sbt "Test/runMain graft.operators.IvfSweep"`.
  *
  * Beyond the printed sweep it ASSERTS, at TWO training rates (full
  * corpus trainMod=1 and the shipped trainMod=2), that the shipped c12
  * configuration (8 cells, 2 Lloyd iters, 6 probes):
  *  - holds the ≥ 0.9 recall floor at sf0.001/sf0.01, and
  *  - beats the scan-fraction baseline (nProbe/nCells = 0.75) at EVERY
  *    sf — the claim an index can honestly make on near-uniform
  *    vectors, where recall fundamentally tracks the scanned fraction
  *    (measured at sf0.1: 0.85–0.88 across rates/iters; no 6-of-8
  *    config reaches 0.9 there, and clustered real corpora are the
  *    case IVF exists for).
  * Each sf is a distinct file set, so the per-dataset codebook cache
  * (Similarity.datasetKey) trains fresh per sf; this harness originally
  * masked a cache-key collision that reused sf0.001's codebook for the
  * larger sfs and reported inflated large-sf recalls (0.93 where the
  * true value is 0.85).
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
      val brute = Similarity.bruteForceTopK(emb, 50, 3).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(nCells: Int, iters: Int, nProbe: Int, trainMod: Int): Double = {
        val ivf = Similarity.ivfTopK(emb, 50, 3, nCells, iters, nProbe, trainMod)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (brute & ivf).size.toDouble / brute.size
      }
      for {
        nCells <- Seq(8, 16)
        iters <- Seq(2, 3)
        nProbe <- Seq(3, 5, 6, 8)
        if nProbe < nCells
        trainMod <- Seq(1, 2, 4)
      } {
        val r = recall(nCells, iters, nProbe, trainMod)
        println(f"sf$sf cells=$nCells iters=$iters probe=$nProbe mod=$trainMod " +
          f"scan=${nProbe.toDouble / nCells}%.2f recall=$r%.3f")
      }
      // The shipped c12 config must hold its floors at two rates.
      val floor = if (sf == "0.1") 6.0 / 8 else 0.9
      for (trainMod <- Seq(1, 2)) {
        val r = recall(8, 2, 6, trainMod)
        assert(r > floor,
          f"sf$sf shipped config (8 cells, 2 iters, 6 probes, mod=$trainMod) recall $r%.3f <= $floor%.3f")
        println(f"sf$sf FLOOR OK mod=$trainMod recall=$r%.3f > $floor%.2f")
      }
    }
    spark.stop()
  }
}
