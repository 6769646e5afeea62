package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over an embedding column (`array<float>`).
  *
  * Determinism: elements are quantized to decimal(12,4) and dot products /
  * norms accumulate in exact decimal — order-independent sums whose scaled
  * integer value stays < 2^53, so BOTH engines' decimal→double conversion
  * is exact and results are bit-identical to the DuckDB oracle. (Scale 4
  * shifts cosine by ~1e-4 vs float-exact — an explicit, documented
  * quantization, applied identically in engine and oracle.) The final
  * division/sqrt run in double, IEEE-identical on identical inputs.
  *
  * Scale shapes: the position-exploded layout shuffles on the dimension
  * index, so a query batch against N vectors is a hash join + partial
  * aggregation — no driver-side loops, no cross product wider than
  * |queries| × N. The LSH variant prunes that to same-bucket candidates.
  */
object Similarity {

  private def vdec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 4))

  /** (vec_id, label, i (1-based), v decimal) exploded layout. */
  def elements(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("p", "vf")))
      .select(col("vec_id"), col("label"), (col("p") + 1).as("i"), vdec(col("vf")).as("v"))

  /** L2 norm per vector (double, from an exact decimal sum of squares). */
  def norms(elems: DataFrame): DataFrame =
    elems.groupBy(col("vec_id"))
      .agg(sqrt(sum(col("v") * col("v")).cast("double")).as("norm"))

  /** Brute-force cosine top-k: every `queryMod`-th vector against ALL
    * vectors. The exact baseline an ANN index is judged against.
    */
  def bruteForceTopK(emb: DataFrame, queryMod: Int, k: Int): DataFrame = {
    val elems = elements(emb)
    val nrm = norms(elems)
    val qe = elems.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("i"), col("v").as("qv"))
    val dots = qe.join(elems.select(col("vec_id"), col("i"), col("v")), "i")
      .filter(col("qid") =!= col("vec_id"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("qv") * col("v")).cast("double").as("dot"))
    val cos = dots
      .join(nrm.select(col("vec_id").as("qid"), col("norm").as("qn")), "qid")
      .join(nrm, "vec_id")
      .select(col("qid"), col("vec_id"), (col("dot") / (col("qn") * col("norm"))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    cos.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .orderBy(col("qid"), col("rn"))
  }

  /** Sign-LSH bucket: concatenated sign bits of the first `nBits`
    * dimensions (axis-aligned random-projection hashing). 2^nBits buckets.
    */
  def signBucket(emb: DataFrame, nBits: Int): DataFrame = {
    val bits = (1 to nBits).map { d =>
      when(expr(s"element_at(embedding, $d)") >= 0, lit("1")).otherwise(lit("0"))
    }
    emb.withColumn("bucket", concat(bits: _*))
  }

  /** LSH-bucketed ANN: neighbors searched only within the query's sign
    * bucket — the 100 TB path (bucket is the shuffle/partition key; each
    * bucket's candidate set is ~N/2^bits).
    */
  def lshTopK(emb: DataFrame, queryMod: Int, k: Int, nBits: Int = 4): DataFrame = {
    val bucketed = signBucket(emb, nBits).select(col("vec_id"), col("bucket"))
    val elems = elements(emb).join(bucketed, "vec_id")
    val nrm = norms(elems)
    val qe = elems.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("qid"), col("bucket"), col("i"), col("v").as("qv"))
    val dots = qe.join(elems.select(col("vec_id"), col("bucket"), col("i"), col("v")),
        Seq("bucket", "i"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("qv") * col("v")).cast("double").as("dot"))
    val cos = dots
      .join(nrm.select(col("vec_id").as("qid"), col("norm").as("qn")), "qid")
      .join(nrm, "vec_id")
      .select(col("qid"), col("vec_id"), (col("dot") / (col("qn") * col("norm"))).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    cos.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .orderBy(col("qid"), col("rn"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, blocked by
    * label (the blocking key bounds the pair space like `lang` does for
    * text).
    */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val elems = elements(emb)
    val nrm = norms(elems)
    val a = elems.select(col("label"), col("vec_id").as("va"), col("i"), col("v").as("xa"))
    val b = elems.select(col("label"), col("vec_id").as("vb"), col("i"), col("v").as("xb"))
    val dots = a.join(b, Seq("label", "i")).filter(col("va") < col("vb"))
      .groupBy(col("label"), col("va"), col("vb"))
      .agg(sum(col("xa") * col("xb")).cast("double").as("dot"))
    dots
      .join(nrm.select(col("vec_id").as("va"), col("norm").as("na")), "va")
      .join(nrm.select(col("vec_id").as("vb"), col("norm").as("nb")), "vb")
      .select(col("label"), col("va"), col("vb"),
        (col("dot") / (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") > threshold)
      .orderBy(col("cos").desc, col("va"), col("vb"))
  }
}
