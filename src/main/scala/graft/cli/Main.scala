package graft.cli

import graft.fs.DuplicationException
import graft.operators.{DistExecJob, DistExecOptions}
import org.apache.spark.sql.SparkSession

/** CLI entry — the reference's positional grammar (usage string,
  * reference DistExec.java:68-73; parser DistExec.java:256-296):
  *
  * {{{
  * distexec [OPTIONS] <srcurl>* <desturl> <exec cmd>
  * OPTIONS: -m <num_maps>  -redirectErrorToOut  -singleOut
  * }}}
  *
  * Exit codes mirror the reference (DistExec.java:350-374,691):
  * 0 ok, -1 invalid args, -2 duplicate destinations, -3 missing source,
  * -999 other.
  */
object Main {
  private val Usage =
    """distexec [OPTIONS] <srcurl>* <desturl> <exec cmd>
      |
      |OPTIONS:
      |-m <num_maps>        Maximum number of simultaneous executions
      |-redirectErrorToOut  Redirect command stderr into stdout
      |-singleOut           Combine all output to a single file""".stripMargin

  final case class Arguments(
      srcs: Seq[String],
      dst: String,
      command: String,
      maxMaps: Option[Int],
      redirectErrorToOut: Boolean,
      singleOut: Boolean)

  /** Positional grammar: last arg = command, second-to-last = dst, rest =
    * srcs; flags may appear anywhere before them.
    */
  def parse(args: Seq[String]): Arguments = {
    var maxMaps: Option[Int] = None
    var redirect = false
    var single = false
    val positional = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-m" =>
          require(i + 1 < args.length, "-m requires a value")
          maxMaps = Some(args(i + 1).toInt); i += 1
        case "-redirectErrorToOut" => redirect = true
        case "-singleOut"          => single = true
        case p                     => positional += p
      }
      i += 1
    }
    require(positional.size >= 3, s"need <srcurl>* <desturl> <exec cmd>\n$Usage")
    Arguments(
      srcs = positional.dropRight(2).toSeq,
      dst = positional(positional.size - 2),
      command = positional.last,
      maxMaps = maxMaps,
      redirectErrorToOut = redirect,
      singleOut = single)
  }

  def main(args: Array[String]): Unit = {
    val parsed =
      try parse(args.toSeq)
      catch {
        case e: IllegalArgumentException =>
          System.err.println(e.getMessage); sys.exit(-1)
      }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("distexec")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val status = DistExecJob.run(
        spark, parsed.srcs, parsed.dst, parsed.command,
        DistExecOptions(
          maxMaps = parsed.maxMaps,
          redirectErrorToOut = parsed.redirectErrorToOut))
      if (parsed.singleOut)
        DistExecJob.singleOutMerge(spark, parsed.dst, status)
      val c = DistExecJob.counters(status)
      // Reference logs human-readable totals (DistExec.java:637-639).
      println(s"EXECUTED=${c.executed} FAIL=${c.failed} " +
        s"BYTESEXECUTED=${c.bytesExecuted} BYTESWRITTEN=${c.bytesWritten}")
      status.filter(!_.ok).collect().foreach(s => System.err.println(s.error))
      spark.stop()
      if (c.failed > 0) sys.exit(1)
    } catch {
      case e: DuplicationException =>
        System.err.println(e.getMessage); spark.stop(); sys.exit(-2)
      case e: java.io.FileNotFoundException =>
        System.err.println(e.getMessage); spark.stop(); sys.exit(-3)
      // Reference catch-all: any other failure → -999 (DistExec.java:350-374).
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"distexec failed: ${e.getMessage}")
        spark.stop(); sys.exit(-999)
    }
  }
}
