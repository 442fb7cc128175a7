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
    // per-run shuffle/spill bytes (Bench's listener, dev-sized): bytes
    // are plan properties, the noise-free A/B signal on this machine
    val sr = new java.util.concurrent.atomic.AtomicLong
    val sw = new java.util.concurrent.atomic.AtomicLong
    val sp = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            sr.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            sw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            sp.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          }
        }
      })
    def run(name: String): (Double, Long, Long, Long) = {
      val fn = SparkEntry.queries(name)
      sr.set(0); sw.set(0); sp.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftColumnBridge.drainListenerBus(spark, 10000L)
      spark.catalog.clearCache()
      (dt, sr.get, sw.get, sp.get)
    }
    args.foreach { name =>
      run(name) // warm-up: codegen + broadcasts + FS cache
      val samples = Seq(run(name), run(name))
      val (_, r, w, s) = samples.last
      println(f"TIME $name%-32s min=${samples.map(_._1).min}%.3f s  " +
        f"(${samples.map(t => f"${t._1}%.3f").mkString(", ")})  " +
        f"shuffle r+w=${(r + w) / 1048576.0}%.2f MiB  spill=$s%d B")
    }
    spark.stop()
  }
}
