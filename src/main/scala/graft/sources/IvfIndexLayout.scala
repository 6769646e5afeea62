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

  /** Train (the deterministic c12 Lloyd loop) and write the index.
    * With `pqSub > 0` the layout is IVF-PQ: per-subspace codebooks are
    * trained too and every vector row ALSO stores its `pqSub` PQ codes,
    * so ADC probes ([[probeAdc]]) can scan codes without touching the
    * full vectors — column pruning makes the compressed read real at
    * the storage layer, not just in memory.
    */
  def write(emb: DataFrame, path: String, nCells: Int = 8,
      lloydIters: Int = 2, pqSub: Int = 0, pqCent: Int = 16): Unit = {
    val (base, cents) = Similarity.trainedLit(emb, nCells, lloydIters)
    val spark = emb.sparkSession
    import spark.implicits._
    val assigned = Similarity.withCell(base, cents)
    if (pqSub > 0) {
      val model = Similarity.trainPq(base, pqSub, pqCent, lloydIters)
      assigned.select((Seq(col("vec_id"), col("ie"), col("nv")) ++
          model.codeCols :+ col("cell")): _*)
        .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
      model.codebooks.zipWithIndex
        .flatMap { case (cb, s) => cb.zipWithIndex.map { case (ce, c) =>
          (s.toLong, c.toLong, ce) } }
        .toDF("sub", "cid", "ce")
        .write.mode("overwrite").parquet(s"$path/pq_codebooks")
    } else {
      assigned.select(col("vec_id"), col("ie"), col("nv"), col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
    }
    cents.map(c => (c.cid, c.ce, c.cn)).toDF("cid", "ce", "cn")
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Incremental ingest: assign a NEW vector batch to the EXISTING
    * codebook (no retraining — the production pattern: the codebook is
    * versioned separately and refreshed on its own cadence) and append
    * under the same cell directories. Plain layouts only: appending to
    * an IVF-PQ layout would need the batch re-encoded against the
    * stored PQ codebooks (rows without codes read back as nulls and
    * silently fall out of ADC ranking) — use [[write]] with `pqSub`
    * for PQ refreshes. The batch-sized job touches no
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

  /** IVF-PQ probe: within the probed cells, rank by ADC distance over
    * the STORED PQ codes (the first scan reads vec_id + codes + cell
    * only — column pruning keeps the full `ie` arrays on disk), then
    * exact-cosine rerank of the per-query shortlist against the full
    * vectors. The FAISS-style two-stage architecture with both dials
    * exposed: nProbe (I/O via partition pruning) and the shortlist
    * (exact-compute volume).
    */
  def probeAdc(spark: SparkSession, path: String, queries: DataFrame, k: Int,
      nProbe: Int, shortlist: Int = 100): DataFrame = {
    val qcells = rankQueryCells(spark, path, queries, nProbe)
      .select(col("qid"), col("cell"))
    val cells = probedCells(spark, path, queries, nProbe)
    // bounded collect: nSub·nCent codebook rows
    val cb = spark.read.parquet(s"$path/pq_codebooks").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getSeq[Long](2).toSeq))
    val nSub = cb.map(_._1).max + 1
    val model = Similarity.PqModel(nSub,
      (0 until nSub).map(s => cb.filter(_._1 == s).sortBy(_._2).map(_._3).toSeq))
    val qdist = queries
      .select(col("vec_id").as("qid"), expr(Similarity.scaled("embedding")).as("ie"))
      .select((col("qid") +: model.queryDistCols): _*)
    val qmeta = qcells.join(qdist, "qid")
    val codes = spark.read.parquet(s"$path/vectors")
      .where(col("cell").isin(cells: _*))
      .select((col("vec_id") +: col("cell") +:
        (0 until nSub).map(s => col(s"code$s"))): _*)
    val scored = codes.join(broadcast(qmeta), "cell")
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), model.adcExpr.as("adist"))
    val wA = Window.partitionBy(col("qid")).orderBy(col("adist"), col("vec_id"))
    val short = scored.withColumn("srn", row_number().over(wA))
      .filter(col("srn") <= shortlist)
      .select(col("qid"), col("vec_id"))
    val full = spark.read.parquet(s"$path/vectors")
      .where(col("cell").isin(cells: _*))
      .select(col("vec_id"), col("ie"), col("nv"))
    val qvec = queries
      .select(col("vec_id").as("qid"), expr(Similarity.scaled("embedding")).as("qe"))
      .withColumn("qn", Similarity.norm("qe"))
    val cos = short.join(full, "vec_id").join(broadcast(qvec), "qid")
      .select(col("qid"), col("vec_id"),
        (Similarity.dot("ie", "qe") / (col("qn") * col("nv"))).as("cos"))
    Similarity.topK(cos, k)
  }

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
