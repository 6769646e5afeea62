package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfIndexSpec extends AnyFunSuite with SparkSpec {

  private val emb = "/root/testdata/sf0.001/embeddings.parquet"

  test("probe from the persisted layout equals the in-memory ivfTopK") {
    val e = spark.read.parquet(emb)
    val dir = Files.createTempDirectory("ivfidx").toFile.getAbsolutePath
    IvfIndexLayout.write(e, dir, nCells = 8, lloydIters = 2)

    val queries = e.filter(col("vec_id") % 50 === 0)
    val fromIndex = IvfIndexLayout.probe(spark, dir, queries, k = 3, nProbe = 5)
      .collect().map(_.toString).toSeq
    val inMemory = Similarity
      .ivfTopK(e, queryMod = 50, k = 3, nCells = 8, lloydIters = 2, nProbe = 5)
      .collect().map(_.toString).toSeq
    assert(fromIndex == inMemory,
      "persisted-index probe must replay the exact in-memory IVF result")
  }

  test("append assigns new vectors to the existing codebook; probe sees both") {
    val e = spark.read.parquet(emb)
    val old = e.filter(col("vec_id") % 2 === 0)
    val fresh = e.filter(col("vec_id") % 2 === 1)
    val dir = Files.createTempDirectory("ivfapp").toFile.getAbsolutePath
    IvfIndexLayout.write(old, dir, nCells = 8, lloydIters = 2)
    IvfIndexLayout.append(spark, dir, fresh)

    // model equivalence: each appended vector's stored cell must be the
    // argmax cosine against the STORED centroids, spelled here with an
    // independent HOF formulation (aggregate/zip_with) + window rank
    import org.apache.spark.sql.expressions.Window
    val cents = spark.read.parquet(s"$dir/centroids")
    def hofDot(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)")
        .cast("double") / 1.0e8
    val base = fresh.selectExpr("vec_id",
        "transform(embedding, x -> CAST(CAST(x AS DECIMAL(12,4)) * 10000 AS BIGINT)) AS ie")
      .withColumn("nv", sqrt(hofDot("ie", "ie")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    val expected = base.crossJoin(cents)
      .withColumn("ccos", hofDot("ie", "ce") / (col("nv") * col("cn")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("cid").cast("long").as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val stored = spark.read.parquet(s"$dir/vectors")
      .filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stored == expected,
      "appended vectors must land in their argmax cell of the stored codebook")

    // and appended vectors are reachable through probes
    val queries = e.filter(col("vec_id") % 100 === 0)
    val odds = IvfIndexLayout.probe(spark, dir, queries, k = 3, nProbe = 8)
      .filter(col("vec_id") % 2 === 1).count()
    assert(odds > 0, "appended vectors must be reachable by probes")
  }

  test("IVF-PQ: ADC probe over stored codes + rerank; codes scan skips vectors") {
    val e = spark.read.parquet(emb)
    val dir = Files.createTempDirectory("ivfpq").toFile.getAbsolutePath
    IvfIndexLayout.write(e, dir, nCells = 8, lloydIters = 2, pqSub = 8)
    val queries = e.filter(col("vec_id") % 50 === 0)
    val exact = IvfIndexLayout.probe(spark, dir, queries, k = 3, nProbe = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adcDf = IvfIndexLayout.probeAdc(spark, dir, queries, k = 3, nProbe = 5)
    val adc = adcDf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & adc).size.toDouble / exact.size
    info(f"IVF-PQ recall@3 vs exact-within-probed-cells: $recall%.3f")
    assert(recall >= 0.85, f"ADC recall $recall%.3f below floor (measured 0.933 " +
      "on the synthetic data; a drop past 0.85 means the codes or the ADC " +
      "tables regressed)")
    // the ADC stage's scan must read codes, not the full vectors —
    // column pruning makes the compressed read real at the storage layer
    val plan = adcDf.queryExecution.executedPlan.toString
    val scans = "ReadSchema: struct<[^>]*>".r.findAllIn(plan).toList
    assert(scans.exists(s => s.contains("code0") && !s.contains("ie:")),
      s"expected a codes-only scan; schemas: ${scans.mkString("\n")}")
  }

  test("probe scan mass is the probed cells only (partition pruning)") {
    val e = spark.read.parquet(emb)
    val dir = Files.createTempDirectory("ivfidx2").toFile.getAbsolutePath
    IvfIndexLayout.write(e, dir, nCells = 8, lloydIters = 2)

    // one query, 2 probes → at most 2 of the 8 cell directories
    val one = e.filter(col("vec_id") === 0)
    val cells = IvfIndexLayout.probedCells(spark, dir, one, nProbe = 2)
    assert(cells.size <= 2, s"one query with nProbe=2 probes ${cells.size} cells")

    def filesUnder(d: java.io.File): Seq[java.io.File] =
      if (d.isDirectory) d.listFiles.toSeq.flatMap(filesUnder)
      else if (d.getName.endsWith(".parquet")) Seq(d) else Nil
    val vecDir = new java.io.File(s"$dir/vectors")
    val total = filesUnder(vecDir).size
    val probed = vecDir.listFiles
      .filter(f => cells.map(c => s"cell=$c").contains(f.getName))
      .toSeq.flatMap(filesUnder).size
    assert(probed < total,
      s"probed cells must cover strictly fewer files ($probed vs $total)")

    // and the scan plan carries the cell partition filter, so Spark
    // never lists the non-probed directories into the scan
    val plan = IvfIndexLayout.probe(spark, dir, one, k = 3, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"vector scan must prune on the cell partition column:\n$plan")
  }
}
