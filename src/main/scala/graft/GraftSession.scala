package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: a SparkSession builder pre-configured for
  * the engine — extensions registered (hll_distinct + the
  * COUNT(DISTINCT) rewrite rule), oracle-grade session defaults (UTC,
  * nanos-as-long parquet reads), and shuffle parallelism sized to the
  * local machine instead of the 200-partition default.
  */
object GraftSession {

  def builder(cores: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")

  /** Local session sized to this machine. */
  def local(appName: String = "graft"): SparkSession = {
    val cores = Runtime.getRuntime.availableProcessors()
    builder(cores)
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
