package graft

import org.apache.spark.sql.functions._
import graft.operators.OlapQueries
import graft.sources.Tables

/** Attribution, funnel, and the Q17 window rewrite — each checked
  * against an independent driver-side recomputation of the same
  * semantics on the sf0.001 fixture (the DuckDB oracle re-proves them
  * at sf0.01).
  */
class EventAnalyticsSpec extends SparkSpec {

  private lazy val events = Tables.load(spark, sf, "events")
    .select("user_id", "event_id", "ts", "event_type", "value")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1),
      r.getTimestamp(2).getTime * 1000 +
        (r.getTimestamp(2).getNanos / 1000) % 1000,
      r.getString(3), r.getDouble(4)))

  test("q112 sessionWindowStats equals a gaps-and-islands recomputation") {
    val gap = 1800000000L
    val expected = events.groupBy(_._1).flatMap { case (u, rows) =>
      val times = rows.map(_._3).sorted
      val sessions =
        scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      var start = times.head
      var last = times.head
      var n = 1L
      times.tail.foreach { t =>
        if (t - last >= gap) {
          sessions += ((start, last + gap, n)); start = t; n = 0
        }
        last = t; n += 1
      }
      sessions += ((start, last + gap, n))
      sessions.map(s => (u, s._1, s._2, s._3))
    }.toSet
    val got = OlapQueries.sessionWindowStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected,
      s"divergence: ${got.diff(expected).take(3)} | ${expected.diff(got).take(3)}")
    assert(got.nonEmpty)
  }

  test("q113 eventTransitions equals a naive sequence recomputation") {
    val expected = events.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2)).map(_._4)
      ordered.zip(ordered.tail)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = OlapQueries.eventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    assert(got.values.sum ==
      events.length - events.map(_._1).distinct.length,
      "every user contributes |events|-1 transitions")
  }

  test("purchaseAttribution matches a naive recomputation") {
    val clicks = events.filter(_._4 == "click")
    val purchases = events.filter(_._4 == "purchase")
    val expected = purchases.map { p =>
      val n = clicks.count(c => c._1 == p._1 &&
        c._3 <= p._3 && c._3 > p._3 - 3600L * 1000000L)
      ((p._1, p._2), n.toLong)
    }.toMap
    val got = OlapQueries.purchaseAttribution(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    assert(got.size == purchases.length)
    assert(got == expected)
  }

  test("eventFunnel stages are ordered and match a naive recomputation") {
    val byUser = events.groupBy(_._1)
    def firstTs(evs: Array[(Long, Long, Long, String, Double)], t: String) =
      evs.filter(_._4 == t).map(_._3).minOption
    var (nView, nViewClick, nFull) = (0L, 0L, 0L)
    byUser.values.foreach { evs =>
      val arr = evs.toArray
      (firstTs(arr, "view"), firstTs(arr, "click"),
        firstTs(arr, "purchase")) match {
        case (Some(v), c, p) =>
          nView += 1
          if (c.exists(_ >= v)) {
            nViewClick += 1
            if (c.exists(cv => p.exists(_ >= cv))) nFull += 1
          }
        case _ =>
      }
    }
    val r = OlapQueries.eventFunnel(spark, sf).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((nView, nViewClick, nFull)))
    assert(r.getLong(0) >= r.getLong(1) && r.getLong(1) >= r.getLong(2))
    assert(r.getLong(2) > 0, "fixture should have full-funnel users")
  }

  test("smallQuantityRevenue matches a naive recomputation") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val avg = li.groupBy(_._1).map { case (k, g) =>
      k -> g.map(_._2).sum / g.size
    }
    val small = li.filter(l => l._2 < 0.2 * avg(l._1))
    val expected = BigDecimal(small.map(_._3).sum / 7.0)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val r = OlapQueries.smallQuantityRevenue(spark, sf).collect().head
    assert(r.getLong(1) == small.length.toLong)
    assert(math.abs(r.getDouble(0) - expected.toDouble) < 0.02,
      s"revenue ${r.getDouble(0)} vs naive $expected")
  }

  test("q127 scd2Intervals equals a naive change-log compaction") {
    val expected = events.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      val changes = ordered.headOption.toSeq ++
        ordered.zip(ordered.tail).collect {
          case (p, c) if p._4 != c._4 => c
        }
      val tos: Seq[Option[Long]] =
        changes.drop(1).map(c => Some(c._3)) :+ None
      changes.zip(tos).map { case (c, to) => (u, c._4, c._3, to) }
    }.toSet
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val got = OlapQueries.scd2Intervals(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), micros(r.getTimestamp(2)),
        Option(r.getTimestamp(3)).map(micros)))
      .toSet
    assert(got == expected,
      s"divergence: ${got.diff(expected).take(3)} | ${expected.diff(got).take(3)}")
    // exactly one open (NULL valid_to) interval per user
    val opens = got.toSeq.filter(_._4.isEmpty)
    assert(opens.map(_._1).distinct.length == opens.length &&
      opens.length == events.map(_._1).distinct.length)
    // both windows share one partitioning: a single exchange and sort
    val plan = OlapQueries.scd2Intervals(spark, sf)
      .queryExecution.executedPlan.toString
    val nonPresentationSorts =
      "\\[user_id.* ASC NULLS FIRST, ts.* ASC NULLS FIRST, event_id".r
        .findAllIn(plan).length
    assert(nonPresentationSorts >= 1 &&
      plan.sliding("hashpartitioning(user_id".length)
        .count(_ == "hashpartitioning(user_id") == 1,
      s"windows must share one user_id exchange:\n$plan")
  }

  test("q152 top paths: replica of sessionized opening sequences") {
    val got = OlapQueries.topPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val gap = 30L * 60 * 1000000
    val paths = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[String])
      var prev = Long.MinValue
      sorted.foreach { r =>
        if (prev != Long.MinValue && r._4 - prev > gap)
          sessions += scala.collection.mutable.ArrayBuffer.empty[String]
        sessions.last += r._3
        prev = r._4
      }
      sessions.map(_.take(3).mkString(">"))
    }.toSeq
    val counts = paths.groupBy(identity).view.mapValues(_.size.toLong)
    val expect = counts.toSeq.sortBy { case (pth, n) => (-n, pth) }.take(10)
    assert(got.toSeq == expect)
  }
}
