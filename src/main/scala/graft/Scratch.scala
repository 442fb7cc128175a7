package graft

/** Throwaway timing/diagnosis harness (not part of the library). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(32)
      .master("local[32]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q12_batch_stats", "q42_dedup_decisions", "q43_grouping_sets",
      "q44_string_functions", "q45_big_spenders", "q46_kept_corpus",
      "q47_token_packing", "q49_heavy_hitters", "q17_rollup")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count()
      val t0 = System.nanoTime()
      val c = fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[scratch] $n%-28s $t%7.2f s  rows=$c")
    }
    spark.stop()
  }
}
