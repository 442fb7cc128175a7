package graft

import org.apache.spark.sql.functions._
import graft.operators.OlapQueries
import graft.sources.Tables

/** TPC-H Q18/Q14/Q19/Q22/Q4 shapes (q84–q88) — each checked against an
  * independent driver-side recomputation on the sf0.001 fixture (the
  * DuckDB oracle re-proves them at sf0.01), plus plan-shape asserts:
  * the dims broadcast, EXISTS stays a semi join, and nothing degrades
  * to a cartesian product.
  */
class TpchShapesSpec extends SparkSpec {

  private lazy val lineitem = Tables.load(spark, sf, "lineitem")
    .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_shipdate")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getTimestamp(5).getTime))

  private lazy val orders = Tables.load(spark, sf, "orders")
    .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
      "o_orderpriority")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getTimestamp(3).getTime, r.getString(4)))

  private lazy val customer = Tables.load(spark, sf, "customer")
    .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))

  private lazy val part = Tables.load(spark, sf, "part")
    .select("p_partkey", "p_brand", "p_type", "p_size")
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))

  private def round4(d: Double): Double =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q84 largeOrders matches a naive recomputation and its ordering") {
    val sumQty = lineitem.groupBy(_._1).view
      .mapValues(g => round4(g.map(_._3).sum)).toMap
    val big = sumQty.filter(_._2 > 150.0)
    val custName = customer.map(c => c._1 -> c._2).toMap
    val expected = orders.filter(o => big.contains(o._1))
      .sortBy(o => (-o._3, o._1))
      .take(100)
      .map(o => (custName(o._2), o._2, o._1, o._3, big(o._1)))
    val got = OlapQueries.largeOrders(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty, "fixture should contain >150-quantity orders")
    assert(got.toSeq == expected.toSeq)
  }

  test("q85 promoRevenue matches a naive recomputation") {
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00").getTime
    val hi = java.sql.Timestamp.valueOf("1996-02-01 00:00:00").getTime
    val pType = part.map(p => p._1 -> p._3).toMap
    val month = lineitem.filter(l => l._6 >= lo && l._6 < hi)
    val total = month.map(l => l._4 * (1 - l._5)).sum
    val promo = month.filter(l => pType(l._2) == "PROMO")
      .map(l => l._4 * (1 - l._5)).sum
    val r = OlapQueries.promoRevenue(spark, sf).collect().head
    assert(total > 0, "fixture month should have revenue")
    assert(math.abs(r.getDouble(0) - 100.0 * promo / total) < 1e-3,
      s"promo_pct ${r.getDouble(0)} vs naive ${100.0 * promo / total}")
  }

  test("q86 disjunctiveRevenue matches a naive recomputation") {
    val byPart = part.map(p => p._1 -> p).toMap
    def hit(l: (Long, Long, Double, Double, Double, Long)): Boolean =
      byPart.get(l._2).exists { p =>
        (p._2 == "Brand#4" && l._3 >= 1 && l._3 <= 11 &&
          p._4 >= 1 && p._4 <= 5) ||
        (p._2 == "Brand#19" && l._3 >= 10 && l._3 <= 20 &&
          p._4 >= 1 && p._4 <= 10) ||
        (p._2 == "Brand#2" && l._3 >= 20 && l._3 <= 30 &&
          p._4 >= 1 && p._4 <= 15)
      }
    val matches = lineitem.filter(hit)
    val expectedRev = matches.map(l => l._4 * (1 - l._5)).sum
    val r = OlapQueries.disjunctiveRevenue(spark, sf).collect().head
    assert(r.getLong(0) == matches.length.toLong)
    assert(math.abs(r.getDouble(1) - expectedRev) < 0.02)
  }

  test("q87 idleRichCustomers matches a naive recomputation") {
    val since = java.sql.Timestamp.valueOf("1999-01-01 00:00:00").getTime
    val positive = customer.filter(_._3 > 0)
    val avgBal = positive.map(_._3).sum / positive.length
    val recent = orders.filter(_._4 >= since).map(_._2).toSet
    val idle = customer.filter(c => c._3 > avgBal && !recent.contains(c._1))
    val expected = idle.groupBy(_._4).view.mapValues { g =>
      (g.length.toLong,
        BigDecimal(g.map(_._3).sum)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = OlapQueries.idleRichCustomers(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (seg, (n, bal)) =>
      assert(n == expected(seg)._1, s"segment $seg count")
      assert(math.abs(bal - expected(seg)._2) < 0.02, s"segment $seg balance")
    }
  }

  test("q88 priorityWaitingOrders matches a naive recomputation") {
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00").getTime
    val hi = java.sql.Timestamp.valueOf("1997-01-01 00:00:00").getTime
    val lateMs = 240L * 86400000L
    val lateOrders = lineitem.groupBy(_._1).view
      .mapValues(_.map(_._6).max).toMap
    val byOrder = lineitem.groupBy(_._1)
    val expected = orders
      .filter(o => o._4 >= lo && o._4 < hi)
      .filter(o => byOrder.get(o._1).exists(_.exists(_._6 > o._4 + lateMs)))
      .groupBy(_._5).view.mapValues(_.length.toLong).toMap
    val got = OlapQueries.priorityWaitingOrders(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(lateOrders.nonEmpty)
  }

  test("q84–q88 plan shapes: semi join stays semi, no cartesian blowup") {
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val semi = plan(OlapQueries.priorityWaitingOrders(spark, sf))
    assert(semi.contains("LeftSemi"), s"EXISTS must plan as semi join:\n$semi")
    val disj = plan(OlapQueries.disjunctiveRevenue(spark, sf))
    assert(disj.contains("BroadcastHashJoin"),
      s"part dim must broadcast under the disjunctive residual:\n$disj")
    assert(!disj.contains("CartesianProduct"), s"cartesian in q86:\n$disj")
    val large = plan(OlapQueries.largeOrders(spark, sf))
    assert(large.contains("TakeOrderedAndProject"),
      s"top-100 must not global-sort:\n$large")
    assert(!large.contains("CartesianProduct"), s"cartesian in q84:\n$large")
    // q87's only nested-loop is the 1-row scalar broadcast — the
    // customer⋈orders anti join itself must be a hash join
    val idle = plan(OlapQueries.idleRichCustomers(spark, sf))
    assert(idle.contains("LeftAnti"), s"no anti join in q87:\n$idle")
  }
}
