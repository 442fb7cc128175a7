package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.ApproxCountDistinctForIntervals
import org.apache.spark.sql.catalyst.plans.logical.{Histogram, HistogramBin}
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
    *
    * `histogramCols` (⊆ cols, numeric) additionally get an equi-height
    * histogram: bin endpoints from the mergeable `percentile_approx`
    * sketch in the SAME first scan, per-bin NDVs from one second
    * aggregate ([[ApproxCountDistinctForIntervals]], the sketch
    * `ANALYZE ... FOR COLUMNS` itself uses with
    * `spark.sql.statistics.histogram.enabled`). Histograms are what
    * turn FilterEstimation's range selectivity from min-max linear
    * interpolation (wrong on any skewed column) into
    * distribution-aware estimates — two sketch passes, no sort.
    */
  def analyze(spark: SparkSession, table: String, cols: Seq[String],
      histogramCols: Seq[String] = Nil,
      numBins: Int = 32): CatalogStatistics = {
    val df = spark.table(table)
    val schema = df.schema
    histogramCols.foreach { c =>
      require(cols.contains(c), s"histogram column $c must be in cols")
      require(schema(c).dataType.isInstanceOf[NumericType],
        s"histogram column $c must be numeric")
    }
    val fractions = (0 to numBins).map(_.toDouble / numBins)
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
        val base = Seq(
          hll_distinct(col(c)).as(s"__ndv_$c"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"))
        val typed = schema(c).dataType match {
          case _: NumericType => base ++ Seq(
            min(col(c)).cast("string").as(s"__min_$c"),
            max(col(c)).cast("string").as(s"__max_$c"))
          case StringType => base ++ Seq(
            ceil(avg(length(col(c)))).cast("long").as(s"__avglen_$c"),
            max(length(col(c))).cast("long").as(s"__maxlen_$c"))
          case _ => base
        }
        val hist =
          if (histogramCols.contains(c))
            Seq(percentile_approx(col(c).cast("double"),
              lit(fractions.toArray), lit(10000)).as(s"__pct_$c"))
          else Nil
        typed ++ hist
      }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    // null-safe: on an empty table (or an all-null string column) the
    // sum/avg aggregates come back NULL, not 0
    def l(name: String): Long = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) 0L else row.getLong(i)
    }
    def s(name: String): Option[String] = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.getString(i))
    }
    val n = l("__n")

    // second pass: distinct counts inside each [endpoint_i, endpoint_i+1]
    val binNdvs: Map[String, Array[Long]] =
      if (histogramCols.isEmpty) Map.empty
      else {
        // an all-null column has no percentiles → no histogram
        val withData = histogramCols
          .filter(c => !row.isNullAt(row.fieldIndex(s"__pct_$c")))
        if (withData.isEmpty) Map.empty
        else {
        val ndvAggs = withData.map { c =>
          val endpoints = row.getSeq[Double](row.fieldIndex(s"__pct_$c"))
          val agg = ApproxCountDistinctForIntervals(
            GraftColumnBridge.expression(col(c).cast("double")),
            Literal.create(endpoints, ArrayType(DoubleType)))
          GraftColumnBridge.column(agg.toAggregateExpression())
            .as(s"__binndv_$c")
        }
        val ndvRow = df.agg(ndvAggs.head, ndvAggs.tail: _*).collect()(0)
        withData.map { c =>
          c -> ndvRow.getSeq[Long](ndvRow.fieldIndex(s"__binndv_$c")).toArray
        }.toMap
        }
      }

    val colStats = cols.map { c =>
      val (minS, maxS) = schema(c).dataType match {
        case _: NumericType => (s(s"__min_$c"), s(s"__max_$c"))
        case _ => (None, None)
      }
      val (avgLen, maxLen) = schema(c).dataType match {
        case StringType if !row.isNullAt(row.fieldIndex(s"__avglen_$c")) =>
          (Some(l(s"__avglen_$c")), Some(l(s"__maxlen_$c")))
        case dt => (Some(dt.defaultSize.toLong), Some(dt.defaultSize.toLong))
      }
      val histogram = binNdvs.get(c).map { ndvs =>
        val endpoints = row.getSeq[Double](row.fieldIndex(s"__pct_$c"))
        val bins = (0 until numBins).map { i =>
          HistogramBin(endpoints(i), endpoints(i + 1), ndvs(i))
        }.toArray
        val nonNull = n - l(s"__nulls_$c")
        Histogram(nonNull.toDouble / numBins, bins)
      }
      c -> CatalogColumnStat(
        distinctCount = Some(BigInt(l(s"__ndv_$c"))),
        min = minS,
        max = maxS,
        nullCount = Some(BigInt(l(s"__nulls_$c"))),
        avgLen = avgLen,
        maxLen = maxLen,
        histogram = histogram)
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

  // ---------------------------------------------------------------
  // Path-keyed statistics: the bridge between PATH-loaded frames
  // (graft.sources.Tables.load — `spark.read.parquet(dir)`) and
  // persisted CatalogStatistics, so the cardinality estimator can
  // ROUTE physical plans (Percentiles.percentilesByGroupRouted) with
  // ZERO estimation jobs once a table has been analyzed. Fixture
  // directories are immutable for a session (the sharedPairCache
  // contract); a rewritten path needs a new session or an explicit
  // re-analyze to refresh its stats.
  // ---------------------------------------------------------------

  /** Catalog table name for a parquet directory — path-derived and
    * stable, so every session computes the same name for the same
    * data.
    */
  private[graft] def tableNameFor(path: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString
    s"graft_stats_$digest"
  }

  /** The single parquet path backing `df` — the file itself for a
    * one-file table (the fixture shape: `<sf>/lineitem.parquet` IS a
    * file), the shared parent directory for a multi-file one (the
    * production shape). None for joins of several tables, in-memory
    * frames, or multi-dir reads — those fall back to estimation
    * scans.
    */
  def sourceDir(df: DataFrame): Option[String] = {
    val files = df.inputFiles
    if (files.isEmpty) None
    else if (files.length == 1) Some(files.head)
    else {
      val parents = files.map(f =>
        new org.apache.hadoop.fs.Path(f).getParent.toString).distinct
      if (parents.length == 1) Some(parents.head) else None
    }
  }

  /** Ensure the parquet directory behind `df` is registered as an
    * external catalog table with persisted sketch statistics covering
    * `cols` (plus whatever was analyzed before — one merged re-scan
    * when columns are missing, zero jobs when already covered).
    * Returns None when `df` isn't a single-directory load or a
    * requested column isn't a physical column of the table.
    */
  def ensureAnalyzed(df: DataFrame, cols: Seq[String])
      : Option[CatalogStatistics] = sourceDir(df).flatMap { dir =>
    val spark = df.sparkSession
    ensureLock.synchronized {
      val name = tableNameFor(dir)
      if (!spark.catalog.tableExists(name)) {
        // schema inferred from the parquet footers: the catalog entry
        // must carry the FULL on-disk schema (a caller's projection
        // must not narrow what later callers can analyze)
        spark.catalog.createTable(name, dir, "parquet")
      }
      val physical = spark.table(name).schema.fieldNames.toSet
      if (!cols.forall(physical.contains)) None
      else {
        val existing = GraftColumnBridge.tableStats(spark, name)
          .filter(_.rowCount.isDefined)
        val missing = cols.filterNot(c =>
          existing.exists(_.colStats.contains(c)))
        if (existing.isDefined && missing.isEmpty) existing
        else Some(analyze(spark, name,
          (existing.map(_.colStats.keys.toSeq).getOrElse(Nil) ++ cols)
            .distinct))
      }
    }
  }

  /** Persisted stats for the table backing `df`, if it has been
    * analyzed this session (or registered before) — zero jobs.
    */
  def statsForFrame(df: DataFrame): Option[CatalogStatistics] =
    sourceDir(df).flatMap { dir =>
      val spark = df.sparkSession
      val name = tableNameFor(dir)
      if (spark.catalog.tableExists(name))
        GraftColumnBridge.tableStats(spark, name)
      else None
    }

  private val ensureLock = new Object
}
