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
    // LSH vs exact pair recall at sf0.01 and sf0.1, bench-style timing
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val exact = operators.Similarity.embeddingPairs(spark, sf, 0.4)
        .select("ai", "bi").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def lshDf() = operators.Similarity.embeddingLshPairs(spark, sf, 0.4, 128, 4)
      val lsh = lshDf().select("ai", "bi").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val t0 = System.nanoTime()
      lshDf().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[scratch] $sf lsh=${lsh.size} exact=${exact.size} " +
        f"missed=${(exact -- lsh).size} extra=${(lsh -- exact).size} warm_t=$t%.2f s")
    }
    spark.stop()
  }
}
