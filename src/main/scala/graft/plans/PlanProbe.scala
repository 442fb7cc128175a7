package graft.plans

/** Evidence hook for queries whose reports COLLECT internally (their
  * declared frame is a parallelized LocalTableScan, so a plain
  * `explain` shows nothing): when `SPARK_GRAFT_PLAN_PROBE` names a
  * directory, the internal analytic frame's formatted physical plan is
  * written there as `<tag>.txt` at build time. No-op (one env lookup)
  * otherwise — benches and the driver never set it.
  */
object PlanProbe {
  def dump(tag: String, df: org.apache.spark.sql.DataFrame): Unit =
    sys.env.get("SPARK_GRAFT_PLAN_PROBE").foreach { dir =>
      val p = java.nio.file.Paths.get(dir)
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.writeString(p.resolve(s"$tag.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
}
