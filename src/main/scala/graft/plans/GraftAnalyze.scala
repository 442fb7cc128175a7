package graft.plans

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.HllFunctions.hll_distinct

/** Sketch-driven ANALYZE — the planner half of the cardinality
  * estimator (BASELINE.json north star: "custom cardinality estimator
  * plugin"; reference anchor trainer.py:91-118 where offline
  * vocab_size numbers size downstream decisions, trainer.py:264).
  *
  * One scan computes count(*), per-column HLL NDV, null counts and
  * string lengths, and installs them as [[CatalogStatistics]] — the
  * same shape `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`
  * produces, but from mergeable sketches: at 100 TB this is a single
  * map-side-combined pass with a 16 KiB buffer per column, where exact
  * NDV would shuffle every distinct value.
  *
  * With `spark.sql.cbo.enabled=true` Spark's FilterEstimation /
  * JoinEstimation read these numbers: a filtered dimension whose
  * estimated output shrinks below autoBroadcastJoinThreshold flips a
  * sort-merge join into a broadcast join (asserted in PlanSpec). The
  * estimator literally steers the physical plan.
  */
object GraftAnalyze {

  /** Analyze `cols` of catalog table `table` in one scan and install
    * the resulting statistics. Returns what was installed.
    */
  def analyze(spark: SparkSession, table: String,
      cols: Seq[String]): CatalogStatistics = {
    val df = spark.table(table)
    val schema = df.schema
    val aggs: Seq[org.apache.spark.sql.Column] =
      Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
        val base = Seq(
          hll_distinct(col(c)).as(s"__ndv_$c"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"))
        schema(c).dataType match {
          case _: NumericType => base ++ Seq(
            min(col(c)).cast("string").as(s"__min_$c"),
            max(col(c)).cast("string").as(s"__max_$c"))
          case StringType => base ++ Seq(
            ceil(avg(length(col(c)))).cast("long").as(s"__avglen_$c"),
            max(length(col(c))).cast("long").as(s"__maxlen_$c"))
          case _ => base
        }
      }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def l(name: String): Long = row.getLong(row.fieldIndex(name))
    def s(name: String): Option[String] = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.getString(i))
    }
    val n = l("__n")

    val colStats = cols.map { c =>
      val (minS, maxS) = schema(c).dataType match {
        case _: NumericType => (s(s"__min_$c"), s(s"__max_$c"))
        case _ => (None, None)
      }
      val (avgLen, maxLen) = schema(c).dataType match {
        case StringType =>
          (Some(l(s"__avglen_$c")), Some(l(s"__maxlen_$c")))
        case dt => (Some(dt.defaultSize.toLong), Some(dt.defaultSize.toLong))
      }
      c -> CatalogColumnStat(
        distinctCount = Some(BigInt(l(s"__ndv_$c"))),
        min = minS,
        max = maxS,
        nullCount = Some(BigInt(l(s"__nulls_$c"))),
        avgLen = avgLen,
        maxLen = maxLen)
    }.toMap

    val stats = CatalogStatistics(
      sizeInBytes = BigInt(tableBytes(spark, df).max(1L)),
      rowCount = Some(BigInt(n)),
      colStats = colStats)
    GraftColumnBridge.setTableStats(spark, table, stats)
    stats
  }

  /** On-disk size of the table's input files (what ANALYZE records). */
  private def tableBytes(spark: SparkSession, df: DataFrame): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
  }
}
