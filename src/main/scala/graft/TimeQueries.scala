package graft

/** Dev harness: time individual queries by name (args), same
  * warm-up + noop-sink discipline as [[Bench]] but without the full
  * suite — the iterate-on-one-plan loop. Usage:
  * `sbt "runMain graft.TimeQueries q50_embedding_pairs_blocked ..."`,
  * scale dir from SPARK_GRAFT_SF_DIR.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(32)
      .master("local[32]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    args.foreach { name =>
      run(name) // warm-up: codegen + broadcasts + FS cache
      val samples = Seq(run(name), run(name))
      println(f"TIME $name%-32s min=${samples.min}%.3f s  (${samples.map(s => f"$s%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
