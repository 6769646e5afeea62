package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming twin of the batch B6 query (hourly event rollup,
  * GroupB.b6_hourly_events): identical window expression, plus a
  * watermark for state eviction — the batch/stream expressions stay in
  * lock-step so backfill (batch) and live (stream) paths agree, the
  * Kappa-architecture property the reference's batch-only design lacks.
  *
  * At scale: tumbling-window aggregation with a watermark keeps state
  * bounded to (active windows × event types); shuffle is on the window
  * key, partial aggregation runs map-side, and late events beyond the
  * watermark are dropped deterministically.
  */
object EventStream {

  /** The events schema as streamed (file sources need it declared). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Shared transform: tumbling 1-hour windows per event type. EXACTLY the
    * batch B6 expression, applied to either a batch or streaming frame.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming source over a directory of JSON event files. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", 16)
      .json(dir)

  /** Streaming source over the events PARQUET data (the driver's real
    * testdata). `ts` has shipped as parquet TIMESTAMP(NANOS) (Spark
    * rejects natively — legacy nanosAsLong read + truncate to micros)
    * and as TIMESTAMP(MICROS) without UTC adjustment (TIMESTAMP_NTZ).
    * ONE footer read (the first data file under the path) decides which
    * fixture generation this path is, then the stream declares the
    * matching schema and normalizes to session-zoned (UTC)
    * TimestampType — identical values to `Tables.load`'s batch frame
    * either way. A fixture generation is a property of the whole path
    * (the writer is one job), so sniffing one footer is sound — and at
    * 100 TB the difference between one footer and a full-path schema
    * inference is the difference between O(1) and O(files) driver I/O
    * before the stream even starts.
    */
  def readEventParquetStream(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val firstFile: org.apache.hadoop.fs.Path =
      if (fs.getFileStatus(root).isFile) root
      else {
        val it = fs.listFiles(root, true) // lazy remote iterator
        // Spark's own listing skips '_'/'.'-prefixed DIRECTORIES too
        // (_temporary/, .spark-staging/); a name-only filter would sniff
        // an in-progress part file's partial footer. Check every path
        // component between the root and the file.
        val rootUri = root.toUri.getPath.stripSuffix("/")
        def hiddenComponent(p: org.apache.hadoop.fs.Path): Boolean = {
          val rel = p.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
          rel.split("/").exists(seg =>
            seg.startsWith("_") || seg.startsWith("."))
        }
        var found: org.apache.hadoop.fs.Path = null
        while (found == null && it.hasNext) {
          val f = it.next()
          if (f.isFile && f.getLen > 0 && !hiddenComponent(f.getPath))
            found = f.getPath
        }
        require(found != null, s"no data file under $path to sniff a schema from")
        found
      }
    val footerTs = spark.read.parquet(firstFile.toString).schema("ts").dataType
    if (footerTs == LongType) {
      val nanosSchema = StructType(eventSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = LongType) else f))
      spark.readStream
        .schema(nanosSchema)
        .option("maxFilesPerTrigger", 16)
        .parquet(path)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      val ntzSchema = StructType(eventSchema.map(f =>
        if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f))
      spark.readStream
        .schema(ntzSchema)
        .option("maxFilesPerTrigger", 16)
        .parquet(path)
        .withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** The streaming query: watermarked tumbling windows, update mode. */
  def hourlyStream(events: DataFrame): DataFrame =
    hourlyRollup(events.withWatermark("ts", "2 hours"))

  /** Wire a streaming rollup to a sink (memory sink in tests; in
    * production a kafka/parquet sink with checkpointing).
    */
  def start(events: DataFrame, checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    hourlyStream(events).writeStream
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
}
