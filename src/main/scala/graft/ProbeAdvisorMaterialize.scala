package graft

/** Dev harness: close the Advisor loop on the engine's OWN workload —
  * trace every SparkEntry query once (the bench's trace, one pass),
  * let the Advisor nominate, `Advisor.materialize` the top nomination,
  * and re-run the nominated queries, recording which ones route and
  * the wall-clock delta. Results go to PROFILE.md by hand.
  * `sbt "runMain graft.ProbeAdvisorMaterialize"`, scale dir from
  * SPARK_GRAFT_SF_DIR.
  */
object ProbeAdvisorMaterialize {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(32)
      .master("local[32]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    plans.Summaries.clear()
    val trace = java.nio.file.Files
      .createTempFile("graft_probe_trace", ".jsonl").toString
    new java.io.File(trace).delete()
    val listener = plans.TraceCapture.install(spark, trace)
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[probe] $name failed: ${e.getMessage}")
      } finally spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    val before = scala.collection.mutable.Map.empty[String, Double]
    names.foreach { n =>
      plans.TraceCapture.setLabel(n)
      val t = run(n)
      org.apache.spark.sql.GraftColumnBridge.drainListenerBus(spark, 10000L)
      before(n) = t
    }
    plans.TraceCapture.clearLabel()
    plans.TraceCapture.uninstall(spark, listener)
    val src = scala.io.Source.fromFile(trace)
    val findings =
      try plans.Advisor.advise(src.getLines(), topN = 8)
      finally src.close()
    // self-managed MV queries hold their own summaries over the same
    // sources — exclude them from the advisor's automatic lever
    val selfManaged = operators.OlapQueries.mvBenchSetups.keySet
    // skip nominations over the engine's own summary directories (the
    // MV queries' summary scans get traced too — a summary-of-summary
    // is not the lever) and over sources the MV queries self-manage
    val noms = findings.filter(f => f.kind.nonEmpty && f.grain.nonEmpty)
      .filterNot(_.paths.exists(_.contains("graft_summaries")))
      .sortBy(-_.value)
    println(s"[probe] ${noms.size} materializable nominations:")
    noms.foreach(f => println(
      s"[probe]   ${f.kind} ${f.paths.mkString("⋈")} grain=${f.grain
        .mkString(",")} queries=${f.queries.size}"))
    // walk the list: materialize, re-run the nominated queries, keep
    // the first nomination that ROUTES at least one — the others are
    // dropped again (fail-closed grains can leave a nomination dry)
    var done = false
    noms.foreach { top =>
      if (!done) {
        val specOpt =
          try Some(plans.Advisor.materialize(spark, top, "probe_advised"))
          catch { case e: Throwable =>
            println(s"[probe] skip (${e.getMessage.take(120)})"); None
          }
        specOpt.foreach { spec =>
          println(s"[probe] materialized '${spec.name}' kind=${top.kind} " +
            s"grain=(${spec.grain.mkString(", ")})")
          try {
            val rerun = top.queries.filterNot(selfManaged)
            var routed = 0
            var tRouted = 0.0
            var tRaw = 0.0
            rerun.foreach { n =>
              // routed? — relation root paths of the optimized plan
              val r = try {
                SparkEntry.queries(n)(spark, sfDir)
                  .queryExecution.optimizedPlan.collect {
                    case lr: org.apache.spark.sql.execution
                        .datasources.LogicalRelation => lr.relation match {
                      case fs: org.apache.spark.sql.execution
                          .datasources.HadoopFsRelation =>
                        fs.location.rootPaths.map(_.toString)
                      case _ => Seq.empty[String]
                    }
                  }.flatten.exists(_.contains("graft_summaries"))
              } catch { case _: Throwable => false }
              if (r) routed += 1
              // warm A/B: routed run vs force-unrouted run, same cache
              // temperature — the traced first pass was cold (codegen,
              // broadcasts) and must not serve as the baseline
              val tOn = run(n)
              spark.conf.set(plans.SummaryRewrite.ConfKey, "false")
              val tOff = try run(n)
                finally spark.conf.unset(plans.SummaryRewrite.ConfKey)
              tRouted += tOn
              tRaw += tOff
              println(f"[probe]   $n%-34s raw $tOff%6.2f vs $tOn%6.2f s " +
                s"${if (r) "ROUTED" else "(raw either way)"}")
            }
            println(f"[probe] nominated=${rerun.size} routed=$routed " +
              f"wall raw ${tRaw}%.1f vs ${tRouted}%.1f s")
            if (routed > 0) done = true
          } finally plans.Summaries.drop("probe_advised")
        }
      }
    }
    spark.stop()
  }
}
