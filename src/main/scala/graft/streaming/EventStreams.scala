package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference has no streaming
  * (SURVEY.md §2.10); this is the natural extension demanded of an
  * events pipeline: one transform, two run modes. [[hourlyAgg]] is the
  * same logical plan whether its input is a batch or a streaming
  * DataFrame — Spark's batch≡streaming contract, proven by
  * StreamingSpec comparing the two outputs.
  */
object EventStreams {

  /** On-disk events schema for the streaming file source (the batch
    * path gets this from graft.sources.Tables; ts arrives as raw
    * nanos, converted below).
    */
  private val eventsOnDisk = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Nanos→µs timestamp normalization (shared batch/stream). */
  def normalize(raw: DataFrame): DataFrame =
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** The shared transform: 1-hour tumbling event-time windows with a
    * 2-hour watermark. In append/update output modes the watermark is
    * what keeps per-window state finite — without it a 100 TB/day
    * stream accretes state forever. (The memory-sink demo below runs
    * in complete mode for result comparison, which by definition
    * retains all windows; a production sink would use update mode.)
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming run over the events parquet (file source), memory sink.
    * `maxFilesPerTrigger=1` makes the file feed arrive as discrete
    * micro-batches. Returns the started query; callers drive it with
    * processAllAvailable().
    */
  def startHourlyStream(spark: SparkSession, sfDir: String,
      queryName: String): StreamingQuery = {
    // the file source wants a directory; glob-filter to the one table
    val raw = spark.readStream
      .schema(eventsOnDisk)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    hourlyAgg(normalize(raw))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
