package graft

import org.apache.spark.sql.functions._

/** Dev harness: measure what the delta-compensated MV read buys on a
  * MANY-FILE source — the load-window cost model at 100 TB. Builds an
  * N-part copy of lineitem, registers a summary, APPENDS a small
  * fraction of rows as new files, and times the same aggregate three
  * ways: (a) raw scan with routing off (what every query pays once a
  * strict staleness gate suspends), (b) the FRESH routed read
  * (pre-append baseline), (c) the DELTA-COMPENSATED routed read
  * (summary + appended files only). Also reports (d) the compensated
  * read with the TTL at 0, isolating the per-lookup listing tax from
  * the compensation itself.
  * `sbt "runMain graft.ProbeDelta [nParts] [appendPct]"`; results go
  * to PROFILE.md by hand.
  */
object ProbeDelta {
  def main(args: Array[String]): Unit = {
    val nParts = args.headOption.map(_.toInt).getOrElse(400)
    val appendPct = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(32)
      .master("local[32]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    plans.Summaries.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_delta_probe")
    val srcPath = dir.resolve("lineitem_many").toString
    val li = sources.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
    val cut = 100 - appendPct
    li.filter(col("l_orderkey") % 100 < cut)
      .repartition(nParts).write.parquet(srcPath)
    def q() = spark.read.parquet(srcPath)
      .groupBy("l_returnflag")
      .agg(sum(expr("cast(l_quantity as decimal(18,2))")).as("sq"))
    def time(label: String, n: Int = 15): Double = {
      q().collect() // warm
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        q().collect()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"PROBE $label%-34s median=${ts(n / 2)}%.1f ms  " +
        f"min=${ts.head}%.1f  max=${ts.last}%.1f")
      ts(n / 2)
    }
    try {
      plans.Summaries.create(spark.read.parquet(srcPath), "probe_delta",
        grain = Seq("l_returnflag", "l_linestatus"),
        sums = Seq("sum_qty" -> "cast(l_quantity as decimal(18,2))"))
      time("fresh routed (pre-append)")
      li.filter(col("l_orderkey") % 100 >= cut)
        .write.mode("append").parquet(srcPath)
      val nFiles = Option(new java.io.File(srcPath).listFiles())
        .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
      println(s"PROBE source now $nFiles parts " +
        s"($appendPct% of rows appended)")
      plans.Summaries.invalidate("probe_delta")
      time("delta-compensated routed")
      spark.conf.set(plans.Summaries.StaleTtlKey, "0")
      time("delta-compensated, ttl=0")
      spark.conf.unset(plans.Summaries.StaleTtlKey)
      spark.conf.set(plans.SummaryRewrite.ConfKey, "false")
      time("raw scan (routing off)")
      spark.conf.unset(plans.SummaryRewrite.ConfKey)
      spark.conf.set(plans.Summaries.DeltaReadKey, "false")
      time("suspended (deltaRead off) = raw")
      spark.conf.unset(plans.Summaries.DeltaReadKey)
    } finally {
      plans.Summaries.drop("probe_delta")
      spark.conf.unset(plans.Summaries.StaleTtlKey)
      spark.conf.unset(plans.SummaryRewrite.ConfKey)
      spark.conf.unset(plans.Summaries.DeltaReadKey)
    }
    spark.stop()
  }
}
