package graft

import org.apache.spark.sql.functions._

/** Dev harness: measure the MV staleness-check tax on a MANY-FILE
  * source — the 100 TB fixed cost of the fail-closed freshness gate
  * (one metadata listing + MD5 per routed lookup) and what the
  * freshness-memo TTL buys back. Builds a several-hundred-part copy
  * of lineitem, registers a summary, and times the same routed
  * aggregate under (a) staleness checking off, (b) on with TTL 0
  * (re-list every lookup), (c) on with the default TTL.
  * `sbt "runMain graft.ProbeStaleness [nParts]"`; results go to
  * PROFILE.md by hand.
  */
object ProbeStaleness {
  def main(args: Array[String]): Unit = {
    val nParts = args.headOption.map(_.toInt).getOrElse(400)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(32)
      .master("local[32]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    plans.Summaries.clear()
    val dir = java.nio.file.Files.createTempDirectory("graft_stale_probe")
    val srcPath = dir.resolve("lineitem_many").toString
    sources.Tables.load(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_quantity")
      .repartition(nParts)
      .write.parquet(srcPath)
    val nFiles = Option(new java.io.File(srcPath).listFiles())
      .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    println(s"PROBE source: $nFiles parquet parts at $srcPath")
    plans.Summaries.create(spark.read.parquet(srcPath), "probe_stale",
      grain = Seq("l_returnflag", "l_linestatus"),
      sums = Seq("sum_qty" -> "cast(l_quantity as decimal(18,2))"))
    def q() = spark.read.parquet(srcPath)
      .groupBy("l_returnflag")
      .agg(sum(expr("cast(l_quantity as decimal(18,2))")).as("sq"))
    def time(label: String, n: Int = 15): Unit = {
      q().collect() // warm
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        q().collect()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"PROBE $label%-28s median=${ts(n / 2)}%.1f ms  " +
        f"min=${ts.head}%.1f  max=${ts.last}%.1f")
    }
    try {
      spark.conf.set(plans.Summaries.StaleCheckKey, "false")
      time("staleCheck off")
      spark.conf.set(plans.Summaries.StaleCheckKey, "true")
      spark.conf.set(plans.Summaries.StaleTtlKey, "0")
      time("on, ttl=0 (re-list always)")
      spark.conf.set(plans.Summaries.StaleTtlKey,
        plans.Summaries.DefaultStaleTtlMs.toString)
      time("on, ttl=default")
    } finally {
      plans.Summaries.drop("probe_stale")
      spark.conf.unset(plans.Summaries.StaleCheckKey)
      spark.conf.unset(plans.Summaries.StaleTtlKey)
    }
    spark.stop()
  }
}
