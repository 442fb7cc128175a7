package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

class ZDebugSpec extends SparkSpec {
  test("rollup plan shape") {
    val q = Tables.load(spark, sf, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
    info("OPTIMIZED:\n" + q.queryExecution.optimizedPlan.treeString)
  }
}
