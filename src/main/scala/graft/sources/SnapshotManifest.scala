package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Attested dataset snapshots: sharded parquet plus a `_manifest`
  * recording per-shard row counts and an ORDER-INDEPENDENT content sum,
  * so a consumer can cheaply answer "is this snapshot complete and
  * untampered, and which shards changed?" before training on it —
  * the integrity/resume handshake between a curation pipeline and its
  * trainers ([[CorpusSink]]/[[JsonlSink]] write data; this writes data
  * PLUS the evidence).
  *
  * The content sum is Σ over rows of the first 60 bits of
  * md5(row-as-canonical-json), wrapping in a signed long. Addition
  * commutes, so the sum is independent of row order, partitioning and
  * reader parallelism — each shard's attestation can be recomputed by
  * ANY engine that can hash rows, one scan, no sort. Shard assignment
  * is [[JsonlSink.shardOf]]'s content-hash rule (same row → same shard
  * on every run), so unchanged rows can never flip a shard's sum.
  */
object SnapshotManifest {

  /** 60-bit row hash over the canonical (name-sorted-column) json of a
    * row — canonicalization makes the attestation survive column
    * reordering between writer and validator.
    */
  private def rowHash(cols: Seq[String]): Column =
    conv(substring(md5(to_json(struct(cols.sorted.map(col): _*)).cast("binary")),
      1, 15), 16, 10).cast("long")

  /** Per-shard (n_rows, content_sum) of a sharded frame. The sum runs
    * in decimal(38,0) (a long sum of 2^60-sized terms overflows — ANSI
    * mode would throw) and reduces mod 2^61 for the stored long.
    */
  private def attest(data: DataFrame): DataFrame = {
    val dataCols = data.columns.filterNot(_ == "__shard").toSeq
    data.groupBy(col("__shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(rowHash(dataCols).cast("decimal(38,0)")).as("raw_sum"))
      .select(col("shard"), col("n_rows"),
        expr("CAST(raw_sum % 2305843009213693952 AS BIGINT)").as("content_sum"))
  }

  /** Write `df` as parquet under `path/data/__shard=K/` + `path/_manifest`
    * (json). The manifest is computed from what was WRITTEN (a
    * read-back), not from the input plan — the attestation covers the
    * bytes on disk.
    */
  def write(df: DataFrame, key: Column, nShards: Int, path: String): Unit = {
    // __shard is reserved: withColumn would silently REPLACE a caller's
    // column of that name, and the attestation (which excludes the shard
    // column from the row hash) would never notice the loss — e.g. when
    // re-snapshotting a previous snapshot's data dir without dropping it.
    require(!df.columns.contains("__shard"),
      "input must not carry a __shard column (drop it before write)")
    df.withColumn("__shard", JsonlSink.shardOf(key, nShards))
      .repartition(col("__shard"))
      .write.partitionBy("__shard").mode("overwrite").parquet(s"$path/data")
    attest(df.sparkSession.read.parquet(s"$path/data"))
      .coalesce(1).write.mode("overwrite").json(s"$path/_manifest")
  }

  /** Diff two snapshots by their MANIFESTS alone — O(shards), no data
    * scan: because shard assignment is a pure content-hash function of
    * the key, an unchanged row sits in the same shard of both
    * snapshots, so a shard whose (n_rows, content_sum) pair matches
    * needs no further look. An incremental consumer (or
    * [[graft.operators.Versioning]]'s row-level diff) then touches ONLY
    * the shards reported `changed`/`added`/`removed` — at 100 TB that
    * is the difference between reading two manifests and rescanning
    * two corpora.
    */
  def changedShards(spark: SparkSession, oldPath: String, newPath: String): DataFrame = {
    val o = spark.read.json(s"$oldPath/_manifest")
      .select(col("shard"), col("n_rows").as("old_rows"), col("content_sum").as("old_sum"))
    val n = spark.read.json(s"$newPath/_manifest")
      .select(col("shard"), col("n_rows").as("new_rows"), col("content_sum").as("new_sum"))
    o.join(n, Seq("shard"), "full_outer")
      .select(col("shard"), col("old_rows"), col("new_rows"),
        when(col("old_rows").isNull, "added")
          .when(col("new_rows").isNull, "removed")
          .when(col("old_rows") === col("new_rows") &&
            col("old_sum") === col("new_sum"), "same")
          .otherwise("changed").as("status"))
      .orderBy(col("shard"))
  }

  /** Delete shard directories the manifest does not reference — the
    * retention/cleanup half of the attestation handshake ([[validate]]
    * reports them as `unexpected`; this removes them). Unexpected
    * shards appear when a writer with a different shard count reuses a
    * data dir, or when an interrupted overwrite leaves partials behind;
    * either way they are bytes a consumer could accidentally read but
    * the attestation never vouched for. Only whole `__shard=K` dirs
    * whose K is absent from the manifest are touched — attested data is
    * never deleted, so vacuum is always safe to run. Returns the
    * removed shard ids.
    */
  def vacuum(spark: SparkSession, path: String): Seq[Long] = {
    val keep = spark.read.json(s"$path/_manifest")
      .select(col("shard").cast("long")).collect().map(_.getLong(0)).toSet
    // write() always attests >= 1 shard; an empty keep-set means the
    // manifest itself is unreadable/truncated, and deleting every shard
    // on that evidence would violate "attested data is never deleted".
    require(keep.nonEmpty,
      s"empty or unreadable manifest at $path/_manifest — refusing to vacuum")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDir = new org.apache.hadoop.fs.Path(s"$path/data")
    if (!fs.exists(dataDir)) return Seq.empty
    val removed = fs.listStatus(dataDir).toSeq
      .filter(_.getPath.getName.startsWith("__shard="))
      .flatMap { st =>
        scala.util.Try(st.getPath.getName.stripPrefix("__shard=").toLong)
          .toOption.filterNot(keep).map(id => (id, st.getPath))
      }
    removed.foreach { case (_, p) => fs.delete(p, true) }
    removed.map(_._1).sorted
  }

  /** Re-attest the data and diff against the manifest: one row per
    * shard with `ok`, the expected and observed counts/sums, and a
    * status (`ok` / `changed` / `missing` / `unexpected`). A resumable
    * loader re-pulls exactly the non-ok shards.
    *
    * Unreadable bytes are a FINDING, not a crash: the re-attestation
    * reads with `ignoreCorruptFiles`, and the observed shard set is the
    * union of what attested and what exists on disk (`__shard=K` dirs),
    * so a shard holding only a corrupt partial — the exact state an
    * interrupted overwrite leaves behind, which [[vacuum]] exists to
    * reap — surfaces as `unexpected` (not in the manifest) or `changed`
    * (attested rows lost) instead of aborting the validation run.
    */
  def validate(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val expected = spark.read.json(s"$path/_manifest")
      .select(col("shard"), col("n_rows").as("exp_rows"),
        col("content_sum").as("exp_sum"))
    // Only the EXPECTED degenerate states map to "no attested rows":
    // a data dir with no readable parquet footer (schema inference
    // fails) or a path that vanished between listing and read. Any
    // other exception — permissions, transient I/O, OOM — propagates:
    // swallowing it would report every attested shard as obs_rows=0
    // "changed", indistinguishable from real data loss, and a resumable
    // loader would launch a spurious full re-pull on a glitch.
    val attested = (try {
      attest(spark.read.option("ignoreCorruptFiles", "true")
          .parquet(s"$path/data"))
        .collect().toSeq
    } catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition != null &&
            (e.getCondition.startsWith("UNABLE_TO_INFER_SCHEMA") ||
              e.getCondition.startsWith("PATH_NOT_FOUND")) =>
        Seq.empty
    }).map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDir = new org.apache.hadoop.fs.Path(s"$path/data")
    val onDisk =
      if (!fs.exists(dataDir)) Seq.empty[Long]
      else fs.listStatus(dataDir).toSeq
        .filter(_.getPath.getName.startsWith("__shard="))
        .flatMap(st => scala.util.Try(
          st.getPath.getName.stripPrefix("__shard=").toLong).toOption)
    // A dir present on disk but absent from the attestation reads as 0
    // observed rows: its only files were unreadable, or it is empty.
    val attestedIds = attested.map(_._1).toSet
    val observed =
      (attested ++ onDisk.filterNot(attestedIds).map(id => (id, 0L, 0L)))
        .toDF("shard", "obs_rows", "obs_sum")
    expected.join(observed, Seq("shard"), "full_outer")
      .select(col("shard"), col("exp_rows"), col("obs_rows"),
        col("exp_sum"), col("obs_sum"),
        when(col("exp_rows").isNull, "unexpected")
          .when(col("obs_rows").isNull, "missing")
          .when(col("exp_rows") === col("obs_rows") &&
            col("exp_sum") === col("obs_sum"), "ok")
          .otherwise("changed").as("status"))
      // ONE source of truth: ok is DERIVED from status, not a second
      // spelling of the same predicate that could drift from it.
      .withColumn("ok", col("status") === "ok")
      .select(col("shard"), col("exp_rows"), col("obs_rows"),
        col("exp_sum"), col("obs_sum"), col("ok"), col("status"))
      .orderBy(col("shard"))
  }
}
