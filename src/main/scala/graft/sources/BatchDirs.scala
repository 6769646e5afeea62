package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The append-only batch-dir persistence shared by [[SketchStore]] and
  * [[BloomStore]]: each ingested batch writes its own `batch-<id>/`
  * parquet dir and existing data is never rewritten or deleted, so no
  * crash window can lose the only copy of the state. Reads merge all
  * dirs under the store's (idempotent, commutative) merge aggregate;
  * compaction commits the merged dir BEFORE removing inputs, so an
  * interruption leaves duplicate state the next read merges away —
  * a no-op, not corruption. Factored here so a fix to the ordering or
  * the delete walk cannot drift between the stores.
  */
private[sources] object BatchDirs {

  /** Existing COMMITTED batch dirs (empty for a missing path — listFiles
    * is null there, which must not NPE a first-append or an early
    * compact). Only `batch-*` names qualify: an append in flight lives
    * under `.inprogress-*` until its parquet commit finishes and is
    * atomically renamed (see [[append]]), so a concurrent list/compact
    * can never observe — and therefore never merge-as-empty-and-delete
    * — a half-written batch.
    */
  def list(path: String): Seq[java.io.File] =
    Option(new java.io.File(path).listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch-"))

  /** Append one batch as a new dir — atomically PUBLISHED: the parquet
    * writer creates its dir immediately (holding only `_temporary`
    * task files until job commit), so writing straight to `batch-<id>`
    * opens a window where a concurrent [[compact]] enumerates the dir,
    * merges it as empty/partial, and then deletes it — silently losing
    * a batch whose writer goes on to report success. Instead the write
    * lands under a `.inprogress-<id>` name (the leading dot keeps it
    * out of [[list]] AND out of Spark's file index, which skips hidden
    * dirs) and a filesystem-atomic rename to `batch-<id>` publishes it
    * only after the parquet job commit. A crash before the rename
    * leaves an orphaned hidden dir — invisible to reads and compaction,
    * garbage but never corruption.
    */
  def append(batch: DataFrame, path: String): Unit = {
    val id = java.util.UUID.randomUUID().toString.take(12)
    val tmp = java.nio.file.Paths.get(path, s".inprogress-$id")
    batch.write.mode("errorifexists").parquet(tmp.toString)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path, s"batch-$id"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Fold the current dirs into one: the batch dirs are enumerated
    * ONCE, the merged view is built from EXACTLY that list (explicit
    * paths, not a directory re-listing), fully committed as a new dir,
    * and only then are exactly those input dirs removed. The one
    * enumeration is what makes compaction safe under a CONCURRENT
    * append, not just under crashes: a batch dir committed while the
    * merge runs is neither read nor deleted — it simply survives into
    * the next read's merge (the r8 spelling re-listed before deleting,
    * so a dir landing between the caller's merge snapshot and the
    * delete walk was dropped unmerged — silent state loss). The view
    * is tiny by construction, so it materializes through
    * localCheckpoint before the write (a parquet write cannot read its
    * own input mid-overwrite; here it also pins the snapshot before
    * any delete).
    */
  def compact(spark: SparkSession, path: String,
      merge: DataFrame => DataFrame): Unit = {
    val before = list(path)
    if (before.isEmpty) return
    val merged = merge(
      spark.read.parquet(before.map(_.getAbsolutePath): _*))
    append(merged.localCheckpoint(true), path)
    before.foreach { d =>
      val stream = java.nio.file.Files.walk(d.toPath)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } finally stream.close()
    }
  }
}
