package graft.operators

import org.apache.spark.sql.functions._

/** A/B harness for the d22 profile spelling: one multi-distinct
  * aggregate (Expand) vs the stack unpivot + groupBy. Run with
  * `sbt "Test/runMain graft.operators.D22Ab"`.
  */
object D22Ab {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity")
    def load() = graft.queries.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
      .select(cols.map(c => col(c).cast("double").as(c)): _*)

    def expand() = {
      val li = load()
      val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(count(col(c)).as(s"n_$i"), countDistinct(col(c)).as(s"d_$i"),
          min(col(c)).as(s"mn_$i"), max(col(c)).as(s"mx_$i"))
      }
      val stackArgs = cols.zipWithIndex.map { case (c, i) =>
        s"'$c', n_$i, d_$i, mn_$i, mx_$i"
      }.mkString(", ")
      li.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(5, $stackArgs) AS (col_name, n, n_distinct, vmin, vmax)")
        .orderBy(col("col_name"))
    }
    def stacked() = {
      val stackArgs = cols.map(c => s"'$c', $c").mkString(", ")
      load().selectExpr(s"stack(5, $stackArgs) AS (col_name, v)")
        .groupBy(col("col_name"))
        .agg(count(col("v")).as("n"), countDistinct(col("v")).as("n_distinct"),
          min(col("v")).as("vmin"), max(col("v")).as("vmax"))
        .orderBy(col("col_name"))
    }
    def time(f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime(); f().collect(); (System.nanoTime() - t0) / 1e9
    }
    for (r <- 1 to 4)
      println(f"round $r: expand ${time(expand)}%.2f s, stack ${time(stacked)}%.2f s")
    spark.stop()
  }
}
