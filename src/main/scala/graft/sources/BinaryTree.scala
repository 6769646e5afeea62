package graft.sources

import graft.operators.MediaRow

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** File-tree ingestion as a DataFrame source: the reference's data model
  * (a directory tree of opaque files — SURVEY §1.1) read through Spark's
  * `binaryFile` source instead of a driver-side walk. Columns: path,
  * modificationTime, length, content.
  *
  * Use this for CONTENT-in-engine pipelines (multimodal feature
  * extraction, content hashing); the exec operator deliberately does NOT
  * use it — it streams bytes by path inside the task, avoiding the
  * source's in-memory `content` column (2 GB cap) for arbitrarily large
  * files.
  */
object BinaryTree {

  def read(spark: SparkSession, root: String, glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(root)
  }

  /** File tree → typed media rows (multimodal ingestion): file name hash
    * as the id, extension as the kind tag, bytes as the opaque payload.
    */
  def asMedia(spark: SparkSession, root: String): Dataset[MediaRow] = {
    import spark.implicits._
    read(spark, root)
      .select(
        xxhash64(col("path")).as("media_id"),
        lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1)).as("kind"),
        col("content").as("payload"))
      .as[MediaRow]
  }

  /** Content-hash dedup over a file tree: the B1 operator applied to raw
    * files (duplicate payloads across paths).
    */
  def dupContent(spark: SparkSession, root: String): DataFrame =
    read(spark, root)
      .select(col("path"), md5(col("content")).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n"), sort_array(collect_list(col("path"))).as("paths"))
      .filter(col("n") > 1)
      .orderBy(col("h"))
}
