package graft.sources.v2

import java.util


import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, Not, StringStartsWith}
import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the recursive file-tree manifest —
  * the reference's `setup()` listing (DistExec.java:471-644) as a
  * first-class Spark TABLE: `spark.read.format("graft-tree").load(dir)`
  * (any Hadoop filesystem), with
  *
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): a
  *    `select(relative, length)` never materializes the other columns;
  *  - **filter pushdown** (`SupportsPushDownFilters`): `is_dir = X` and
  *    `relative LIKE 'prefix%'` evaluate INSIDE the listing walk — a
  *    pruned subtree is never even recursed into for prefix filters
  *    that can't match below it;
  *  - **parallel listing**: one `InputPartition` per top-level child of
  *    the root, so a wide tree lists across the cluster (the DSv2
  *    formulation of `Manifest.listDistributed`'s wave BFS).
  *
  * Rows: (path, relative, length, mtime, is_dir) with the reference's
  * `"."`-for-root rule on `relative`.
  */
class TreeSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-tree"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TreeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val root = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-tree needs a path: .load(dir)"))
    new TreeTable(root)
  }
}

object TreeSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("relative", StringType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("mtime", LongType, nullable = false),
    StructField("is_dir", BooleanType, nullable = false)))
}

final class TreeTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"graft-tree `$root`"
  override def schema(): StructType = TreeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TreeScanBuilder(root)
}

final class TreeScanBuilder(root: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = TreeSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source column order regardless of the projection order
    required = StructType(TreeSource.schema.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  /** Accept `is_dir = <bool>` and `StringStartsWith(relative, p)`; leave
    * everything else to Spark's post-scan filter (returned as residual).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("is_dir", _: java.lang.Boolean) => true
      // `is_dir = false` reaches the source as the simplified NOT form
      case Not(EqualTo("is_dir", _: java.lang.Boolean)) => true
      case StringStartsWith("relative", _) => true
      case _ => false
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new TreeScan(root, required, pushed)
}

final class TreeScan(root: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"graft-tree root=$root, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def toBatch: Batch = this

  /** One partition per top-level child (plus one for the root's own
    * direct files) — the parallel-listing axis.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(new Configuration())
    val st = fs.getFileStatus(rootPath)
    if (!st.isDirectory) Array(TreePartition(root, root, selfOnly = true))
    else {
      val children = fs.listStatus(rootPath)
      val subtrees = children.collect {
        case c if c.isDirectory => TreePartition(root, c.getPath.toString, selfOnly = false)
      }
      // the root itself + its direct files in one partition
      subtrees :+ TreePartition(root, root, selfOnly = true)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TreeReaderFactory(required.fieldNames, pushed.map {
      case EqualTo("is_dir", b: java.lang.Boolean) => ("is_dir", b.toString)
      case Not(EqualTo("is_dir", b: java.lang.Boolean)) => ("is_dir", (!b).toString)
      case StringStartsWith("relative", p) => ("prefix", p)
    })
}

/** A subtree to list: `start` = the subtree root; `selfOnly` lists only
  * `start` and its direct non-directory children (used for the root
  * partition so files directly under the root are covered exactly once).
  */
final case class TreePartition(root: String, start: String, selfOnly: Boolean)
    extends InputPartition

final case class TreeReaderFactory(columns: Array[String],
    simpleFilters: Array[(String, String)]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TreeReader(partition.asInstanceOf[TreePartition], columns, simpleFilters)
}

final class TreeReader(part: TreePartition, columns: Array[String],
    simpleFilters: Array[(String, String)]) extends PartitionReader[InternalRow] {

  private val fs = new Path(part.root).getFileSystem(new Configuration())
  private val rootUri = fs.makeQualified(new Path(part.root)).toUri
  private val isDirFilter: Option[Boolean] =
    simpleFilters.collectFirst { case ("is_dir", v) => v.toBoolean }
  private val prefixFilter: Option[String] =
    simpleFilters.collectFirst { case ("prefix", p) => p }

  private def relative(p: Path): String = {
    val rel = rootUri.relativize(fs.makeQualified(p).toUri).getPath
    val trimmed = if (rel.endsWith("/")) rel.dropRight(1) else rel
    if (trimmed.isEmpty) "." else trimmed
  }

  /** A directory subtree can be skipped when a pushed prefix can't match
    * anything under it: the prefix neither extends the dir's relative
    * path nor is extended by it.
    */
  private def subtreeCanMatch(dirRel: String, prefix: String): Boolean =
    dirRel == "." || dirRel.startsWith(prefix) ||
      prefix.startsWith(dirRel + "/") || prefix == dirRel

  private val stack = new scala.collection.mutable.Stack[Path]
  private val out = new scala.collection.mutable.Queue[InternalRow]()
  stack.push(new Path(part.start))
  private var first = true
  private var current: InternalRow = _

  private def emit(p: Path, len: Long, mtime: Long, isDir: Boolean): Unit = {
    val rel = relative(p)
    if (isDirFilter.forall(_ == isDir) && prefixFilter.forall(rel.startsWith)) {
      val values: Array[Any] = columns.map {
        case "path" => UTF8String.fromString(p.toString)
        case "relative" => UTF8String.fromString(rel)
        case "length" => len
        case "mtime" => mtime
        case "is_dir" => isDir
      }
      out.enqueue(new GenericInternalRow(values))
    }
  }

  override def next(): Boolean = {
    while (out.isEmpty && stack.nonEmpty) {
      val p = stack.pop()
      val st = fs.getFileStatus(p)
      val selfRoot = first; first = false
      if (st.isDirectory) {
        // the root partition emits the root dir row; subtree partitions
        // emit their own start dir (the root partition doesn't list it)
        if (!(part.selfOnly && !selfRoot)) {
          emit(st.getPath, 0L, st.getModificationTime, isDir = true)
        }
        val children = fs.listStatus(p)
        children.foreach { c =>
          if (c.isDirectory) {
            if (!part.selfOnly &&
                prefixFilter.forall(subtreeCanMatch(relative(c.getPath), _))) {
              stack.push(c.getPath)
            }
          } else if (!part.selfOnly || selfRoot) {
            emit(c.getPath, c.getLen, c.getModificationTime, isDir = false)
          }
        }
      } else {
        emit(st.getPath, st.getLen, st.getModificationTime, isDir = false)
      }
    }
    if (out.isEmpty) false
    else { current = out.dequeue(); true }
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
