package graft.operators

/** One-off tuning harness: recall@3 of the IVF index vs the exact brute
  * force across (nCells, lloydIters, nProbe) — run with
  * `sbt "Test/runMain graft.operators.IvfSweep"`.
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
      for {
        nCells <- Seq(8, 16)
        iters <- Seq(2, 3)
        nProbe <- Seq(3, 5, 6, 8)
        if nProbe < nCells
      } {
        val ivf = Similarity.ivfTopK(emb, 50, 3, nCells, iters, nProbe).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = (brute & ivf).size.toDouble / brute.size
        println(f"sf$sf cells=$nCells iters=$iters probe=$nProbe " +
          f"scan=${nProbe.toDouble / nCells}%.2f recall=$recall%.3f")
      }
    }
    spark.stop()
  }
}
