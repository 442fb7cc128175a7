package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.SqlQueries
import graft.sources.Tables

/** Spark-4 SQL features used by q115/q116 — the recursive date spine
  * and the LATERAL correlated subquery — each checked against an
  * independent recomputation (the DuckDB oracle re-proves them at
  * sf0.01).
  */
class SqlFeaturesSpec extends SparkSpec {

  private def monthUtc(ms: Long): (Int, Int) = {
    val d = java.time.Instant.ofEpochMilli(ms)
      .atZone(java.time.ZoneOffset.UTC)
    (d.getYear, d.getMonthValue)
  }

  test("q115 spine covers every month, zero months included") {
    val got = SqlQueries.monthlySpine(spark, sf).collect()
      .map(r => (monthUtc(r.getTimestamp(0).getTime), r.getLong(1),
        r.getDouble(2)))
    // 1995-01 .. 2001-08 inclusive = 80 months, from the SPINE, not
    // the data
    assert(got.length == 80)
    assert(got.head._1 == (1995, 1) && got.last._1 == (2001, 8))
    val orders = Tables.load(spark, sf, "orders")
      .select("o_orderdate", "o_totalprice")
      .collect()
      .map(r => monthUtc(r.getTimestamp(0).getTime) -> r.getDouble(1))
    val byMonth = orders.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    got.foreach { case (m, n, total) =>
      val (en, esum) = byMonth.getOrElse(m, (0L, 0.0))
      assert(n == en, s"month $m count")
      assert(math.abs(total - esum) < 0.02, s"month $m total")
    }
    // the spine's whole point: months can be empty yet still present
    assert(got.map(_._2).sum == orders.length.toLong)
  }

  test("q116 lateral top-1 equals the window spelling, no cartesian") {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val expected = Tables.load(spark, sf, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val df = SqlQueries.topOrderLateral(spark, sf)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
    // Catalyst must decorrelate the per-customer LIMIT 1 — a
    // nested-loop/cartesian plan would be the per-row execution a
    // scale engine can't afford
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in lateral:\n$plan")
  }
}
