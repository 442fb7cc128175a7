package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness — not part of the library surface.
  * Times the named SparkEntry queries (args) or a default hot set.
  */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("scratch").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q134_trade_rank", "q140_butterflies", "q146_iqr_outliers",
      "q35_percentiles", "q147_copurchase_lift",
      "q25_ngram_jaccard_pairs", "q46_kept_corpus",
      "q92_cluster_sizes", "q151_cross_source_dups",
      "q42_dedup_decisions")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    for (n <- names) {
      val q = SparkEntry.queries(n)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        q(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $n%-28s min ${ts.min}%.3f  med ${ts.sorted.apply(ts.size / 2)}%.3f")
    }
    spark.stop()
  }
}
