package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.TopK

/** KMV (k-minimum-values) sketch: the k rows per group whose md5(id) is
  * smallest. A deterministic, MERGEABLE uniform sample — min-k of a
  * union is the min-k of the parts' min-k's, so partial heaps combine
  * map-side exactly like a count; and because the "randomness" is the
  * content hash, every engine (and every retry) draws the same sample.
  * This is the order-statistics counterpart of the replayable CMS (c42)
  * and HLL (c45): quantile estimation from the sample is plain integer
  * arithmetic the oracle replays row for row.
  *
  * Execution shape: rides [[graft.plans.TopKPerKey]] — bounded
  * per-partition heaps, ONE ClusteredDistribution exchange carrying at
  * most k rows per (partition, group), never a per-group full sort. At
  * 100 TB the exchange moves |groups|·k rows regardless of corpus size.
  */
object KmvSketch {

  /** The k sample rows per `group` value, selected by ascending
    * md5(id) (id as its decimal-string bytes; doc_id tiebreak keeps the
    * heap deterministic even under hash collision). Output schema =
    * input schema + `kmv_h`. NULL ids are excluded: md5(NULL) is NULL,
    * which the ascending heap would sort FIRST (catalyst nulls-first),
    * letting keyless rows crowd out the entire sample — and diverging
    * from engines whose default is nulls-last.
    */
  def sample(df: DataFrame, group: String, id: Column, k: Int): DataFrame = {
    val withH = df.filter(id.isNotNull)
      .withColumn("kmv_h", md5(id.cast("string").cast("binary")))
      .withColumn("kmv_id", id)
    TopK.perKey(withH, Seq(group), Seq(("kmv_h", true), ("kmv_id", true)), k)
      .drop("kmv_id")
  }
}
