package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin
import graft.sources.Tables

class RangeJoinSpec extends SparkSpec {

  test("bucketed range join equals the naive non-equi join") {
    import spark.implicits._
    val bands = RangeJoin.ValueBands.toDF("band_id", "lo", "hi")
    val events = Tables.load(spark, sf, "events")
    val naive = events.join(bands,
        col("value") >= col("lo") && col("value") < col("hi"))
      .select("event_id", "band_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = RangeJoin
      .bucketed(events, bands, col("value"), grid = 16.0)
      .select("event_id", "band_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
    assert(bucketed.nonEmpty)
  }

  test("boundary semantics: hi is exclusive, lo inclusive, across grids") {
    import spark.implicits._
    // values sitting exactly on band and grid boundaries
    val facts = Seq(0.0, 1.0, 2.0, 15.999, 16.0, 20.0, 499.999, 500.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val bands = RangeJoin.ValueBands.toDF("band_id", "lo", "hi")
    def run(grid: Double) = RangeJoin.bucketed(facts, bands, col("v"), grid)
      .select("id", "band_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = facts.join(bands,
        col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "band_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 500.0 matches nothing (hi exclusive); identical at any grid width
    assert(!want.exists(_._1 == 7L))
    Seq(1.0, 7.0, 16.0, 1000.0).foreach { g =>
      assert(run(g) == want, s"grid=$g diverges")
    }
  }

  test("q59 plan: equality join on grid cells, no BroadcastNestedLoopJoin") {
    val plan = RangeJoin.eventValueBands(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join must bucket to an equality join:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")
      || plan.contains("ShuffledHashJoin"), s"expected a hash join:\n$plan")
  }
}
