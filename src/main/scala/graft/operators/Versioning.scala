package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset snapshot diff — the versioning primitive of a curated
  * training corpus: given two snapshots of the same logical dataset,
  * classify every id as added / removed / changed / unchanged. This is
  * the audit step between ingest rounds ("what did this refresh
  * actually do?") and the input to incremental downstream rebuilds
  * (only `added ∪ changed` re-enter dedup/filtering; `removed` feeds
  * deletion propagation). Complements d21's row-level CDC apply: CDC
  * replays a known change stream, diff RECOVERS the change set when all
  * you have is two snapshots.
  *
  * Scale shape: each side reduces to (id, 16-byte content hash) at the
  * scan — the full-outer join shuffles ~24 bytes/row regardless of
  * document size, exactly like exact dedup (b1). No text ever moves.
  */
object Versioning {

  /** Row-level diff: (id, status) for every id in either snapshot,
    * status ∈ added | removed | changed | unchanged (relative to v1 →
    * v2: "added" = only in v2).
    */
  def diff(v1: DataFrame, v2: DataFrame, id: Column, content: Column): DataFrame = {
    // presence is a flag of its own — md5(NULL) is NULL, so testing the
    // hash would misread a NULL-content row as an absent row
    val a = v1.select(id.as("id"), md5(content.cast("binary")).as("h1"),
      lit(true).as("in1"))
    val b = v2.select(id.as("id"), md5(content.cast("binary")).as("h2"),
      lit(true).as("in2"))
    a.join(b, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("in1").isNull, lit("added"))
          .when(col("in2").isNull, lit("removed"))
          .when(!(col("h1") <=> col("h2")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
