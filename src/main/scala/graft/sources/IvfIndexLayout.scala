package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Persisted IVF index — ANN with STORAGE-level pruning.
  *
  * `c12`'s [[Similarity.ivfTopK]] trains and probes in one job; at
  * 100 TB you train ONCE, persist the vectors hive-partitioned by their
  * assigned cell, and every later query batch reads ONLY its probed
  * cells' files: the probed-cell set becomes a partition filter, so
  * non-probed `cell=<id>/` directories are never even listed into the
  * scan — the IVF recall/cost dial (`nProbe/nCells`) becomes an I/O
  * dial, which is the entire point of an inverted-file index at scale.
  * The [[ZOrderLayout]]/[[Compact]] discipline applied to vector
  * search: pay the clustering shuffle at write time, prune at read
  * time.
  *
  * Layout: `<path>/vectors/cell=<id>/…` holding (vec_id, ie, nv) —
  * the pre-scaled long embedding and its norm, so probes replay the
  * exact scaled-long arithmetic of c12 without touching float —
  * plus the tiny trained centroid table at `<path>/centroids`.
  * IvfIndexSpec asserts probe ≡ the in-memory ivfTopK result for the
  * same parameters, and that the probe's scan mass is the probed
  * cells' files only.
  */
object IvfIndexLayout {

  /** Train (the deterministic c12 Lloyd loop) and write the index. */
  def write(emb: DataFrame, path: String, nCells: Int = 8,
      lloydIters: Int = 2): Unit = {
    val (base, cents) = Similarity.trainedLit(emb, nCells, lloydIters)
    Similarity.withCell(base, cents)
      .select(col("vec_id"), col("ie"), col("nv"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
    val spark = emb.sparkSession
    import spark.implicits._
    cents.map(c => (c.cid, c.ce, c.cn)).toDF("cid", "ce", "cn")
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Incremental ingest: assign a NEW vector batch to the EXISTING
    * codebook (no retraining — the production pattern: the codebook is
    * versioned separately and refreshed on its own cadence) and append
    * under the same cell directories. The batch-sized job touches no
    * existing file; probes see old + new vectors the moment the append
    * commits, with identical arithmetic because assignment replays
    * [[Similarity.withCell]] against the stored centroids.
    */
  def append(spark: SparkSession, path: String, emb: DataFrame): Unit = {
    val cents = spark.read.parquet(s"$path/centroids")
      .select(col("cid"), col("ce"), col("cn"))
    val centSeq = cents.collect().toSeq
      .map(r => Similarity.Cent(r.getLong(0), r.getSeq[Long](1), r.getDouble(2)))
      .sortBy(_.cid)
    val base = emb.select(col("vec_id"),
        expr(Similarity.scaled("embedding")).as("ie"))
      .withColumn("nv", Similarity.norm("ie"))
    Similarity.withCell(base, centSeq)
      .select(col("vec_id"), col("ie"), col("nv"), col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/vectors")
  }

  /** Rank the stored centroids per query (exact scaled-long cosine,
    * ties → lowest cid — the c12 ranking), keeping each query's top
    * `nProbe` cells. Queries are (vec_id, embedding) rows.
    */
  private def rankQueryCells(spark: SparkSession, path: String,
      queries: DataFrame, nProbe: Int): DataFrame = {
    val cent = spark.read.parquet(s"$path/centroids")
    val qbase = queries
      .select(col("vec_id").as("qid"), expr(Similarity.scaled("embedding")).as("qe"))
      .withColumn("qn", Similarity.norm("qe"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("qcos").desc, col("cid"))
    qbase.crossJoin(broadcast(cent))
      .select(col("qid"), col("qe"), col("qn"), col("cid"),
        (Similarity.dot("qe", "ce") / (col("qn") * col("cn"))).as("qcos"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("qe"), col("qn"), col("cid").as("cell"))
  }

  /** The distinct cells a query batch will touch — a BOUNDED driver-side
    * collect (≤ nCells rows, the index's own parameter) that becomes
    * the partition-pruning literal of [[probe]]'s vector scan.
    */
  def probedCells(spark: SparkSession, path: String, queries: DataFrame,
      nProbe: Int): Seq[Any] =
    rankQueryCells(spark, path, queries, nProbe)
      .select(col("cell")).distinct().collect().map(_.get(0)).toSeq

  /** Top-k cosine neighbors of each query among the probed cells'
    * stored vectors. Result ≡ [[Similarity.ivfTopK]] for the same
    * (nCells, lloydIters, nProbe) and query set — same arithmetic,
    * same tie orders — but the scan reads only `cells.size / nCells`
    * of the index.
    */
  def probe(spark: SparkSession, path: String, queries: DataFrame, k: Int,
      nProbe: Int): DataFrame = {
    val qcells = rankQueryCells(spark, path, queries, nProbe)
    val cells = probedCells(spark, path, queries, nProbe)
    val vecs = spark.read.parquet(s"$path/vectors")
      .where(col("cell").isin(cells: _*))
    val cos = vecs.join(broadcast(qcells), "cell")
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        (Similarity.dot("ie", "qe") / (col("qn") * col("nv"))).as("cos"))
    Similarity.topK(cos, k)
  }
}
