package graft

import graft.sources.Tables

class EntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has runnable plan at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      // count() forces full execution of the plan
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all testdata tables load with declared schemas") {
    Tables.schemas.keys.foreach { t =>
      val df = Tables.load(spark, sf, t)
      assert(df.count() > 0, s"$t is empty")
      assert(df.schema == Tables.schemas(t), s"$t schema drift")
    }
  }

  test("q01 topk: 5 event types, ordered by total desc") {
    val rows = SparkEntry.queries("q01_events_topk")(spark, sf).collect()
    assert(rows.length == 5)
    val totals = rows.map(_.getDouble(1))
    assert(totals.sameElements(totals.sorted.reverse))
    assert(rows.map(_.getLong(5)).sum == 1000L) // sf0.001 events rows
  }
}
