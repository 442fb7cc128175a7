package graft

/** Per-query wall-clock bench (the reference's reader-benchmark role,
  * trainer.py:318-399). Each query gets one untimed warm-up execution
  * (codegen compilation, broadcast builds, FS cache) and three timed
  * runs of which the MINIMUM is reported — steady-state throughput,
  * which is what a resident engine delivers. The timed samples come
  * from three INTERLEAVED full passes over the suite, not
  * back-to-back runs: a multi-second co-tenant interference window
  * then lands on DIFFERENT queries in each pass, so the per-query min
  * discards it — back-to-back samples would both sit inside the same
  * window. (This container sees hypervisor-level steal that can
  * inflate a whole pass ~2×; with three passes the min survives one
  * entirely-slow pass.) The SQL cache is cleared after every
  * execution so persisted intermediates never bleed across
  * measurements (or accumulate). Prints exactly one JSON line for the
  * driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(cpus)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_TRACE=<path>: per-operator timeline capture (the
    // reference's ProfilerHook role) alongside the wall-clock numbers
    sys.env.get("SPARK_GRAFT_TRACE")
      .foreach(p => plans.TraceCapture.install(spark, p))
    // noop sink, not count(): under a count Catalyst's EliminateSorts
    // strips every query's final global sort, so orderBy-terminated
    // queries would be benched without their sort cost
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // dev-only subset filter (comma-separated names); the driver never
    // sets it, so its full-suite runs are unaffected
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val failed = scala.collection.mutable.Set.empty[String]
    def timedPass(timed: Boolean): Map[String, Double] =
      names.filterNot(failed).map { name =>
        val t = try {
          val t0 = System.nanoTime()
          run(SparkEntry.queries(name)(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed += name
          -1.0
        } finally spark.catalog.clearCache()
        name -> t
      }.toMap
    timedPass(timed = false) // warm-up pass: codegen + broadcasts + FS cache
    val passes = Seq.fill(3)(timedPass(timed = true))
    val results = names.map { n =>
      val samples = passes.flatMap(_.get(n)).filter(_ >= 0)
      n -> (if (failed(n) || samples.isEmpty) -1.0 else samples.min)
    }
    // 4 dp (0.1 ms) per query: full double precision is timer noise
    // and doubles the line length for nothing
    def f(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val ok = results.map(_._2).filter(_ >= 0)
    val total = ok.sum
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // Human-readable recap AFTER the contract line: the driver stores
    // only the last ~2000 chars of output, and the full per-query line
    // above outgrew that window — this line keeps the headline numbers
    // inside the stored tail. The "BENCH_SUMMARY " prefix keeps it from
    // parsing as a bare JSON line (the contract line stays the only one).
    val median = if (ok.isEmpty) 0.0 else ok.sorted.apply(ok.size / 2)
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(12)
      .map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    println(s"""BENCH_SUMMARY {"total_sec":${f(total)},"n_queries":${ok.size},""" +
      s""""median_sec":${f(median)},"failed":${failed.size},""" +
      s""""slowest":$slowest,"sf":"$sfDir"}""")
    spark.stop()
  }
}
