package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CorpusExtra, CorpusRank, CorpusVec, ExtOps, GroupA, GroupB, Relational, TpchRest}

/** Driver contract — see /root/repo/SURVEY.md §2.3 for the declared query
  * inventory. Group A re-expresses the reference's computations
  * (dup-detection, metrics, bin packing, path rules — reference
  * DistExec.java) as relational queries; Group B + ExtOps are the
  * extension surface (TPC-H-shaped analytics, dedup, similarity search,
  * text analysis, multimodal plumbing).
  */
object SparkEntry {

  /** Flagship query on sf=0.001 (driver smoke-checks rows > 0): the
    * join-heavy top-revenue query (B5).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("b5_top_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GroupA.queries ++ GroupB.queries ++ TpchRest.queries ++
      ExtOps.queries ++ Relational.queries ++ CorpusExtra.queries ++
      CorpusRank.queries ++ CorpusVec.queries

  /** DuckDB-runnable twin of each query (same column names — the driver
    * sorts columns by name before hashing). Omitted keys get a weaker
    * rows-only check.
    */
  def oracleSql: Map[String, String] =
    GroupA.oracle ++ GroupB.oracle ++ TpchRest.oracle ++
      ExtOps.oracle ++ Relational.oracle ++ CorpusExtra.oracle ++
      CorpusRank.oracle ++ CorpusVec.oracle
}
