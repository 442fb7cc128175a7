package graft

import org.apache.spark.sql.functions._
import graft.operators.{OlapQueries, Pipeline}
import graft.streaming.{AdmittedDoc, CorpusStreams}
import graft.sources.Tables

/** Batch-4 round-3 additions: TPC-H Q1 (q97), cohort retention (q98),
  * and corpus admission (q99) with its streaming twin — naive
  * recomputes on sf0.001 plus a stream ≡ batch drive.
  */
class RetentionAdmissionSpec extends SparkSpec {

  test("q97 pricingSummary matches a naive recomputation") {
    val cutoff = java.sql.Timestamp.valueOf("2001-09-01 00:00:00").getTime
    val rows = Tables.load(spark, sf, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_shipdate")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getTimestamp(6).getTime))
      .filter(_._7 <= cutoff)
    val expected = rows.groupBy(l => (l._1, l._2)).view.mapValues { g =>
      (g.map(_._3).sum, g.map(_._4).sum,
        g.map(l => l._4 * (1 - l._5)).sum,
        g.map(l => l._4 * (1 - l._5) * (1 + l._6)).sum,
        g.length.toLong)
    }.toMap
    val got = OlapQueries.pricingSummary(spark, sf).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet ==
      expected.keySet)
    got.foreach { r =>
      val e = expected((r.getString(0), r.getString(1)))
      assert(math.abs(r.getDouble(2) - e._1) < 1e-2, "sum_qty")
      assert(math.abs(r.getDouble(3) - e._2) < 1e-1, "sum_base_price")
      assert(math.abs(r.getDouble(4) - e._3) < 1e-1, "sum_disc_price")
      assert(math.abs(r.getDouble(5) - e._4) < 1e-1, "sum_charge")
      assert(math.abs(r.getDouble(6) - e._1 / e._5) < 1e-3, "avg_qty")
      assert(r.getLong(9) == e._5, "count_order")
    }
  }

  test("q98 cohortRetention matches a naive recomputation") {
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    val cohorts = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val activity = ev.distinct
    // both stamps are week-truncated (Monday 00:00 UTC): the offset is
    // exact day arithmetic / 7
    def weeksBetween(a: Long, b: Long): Int =
      ((a - b) / 86400000L / 7L).toInt
    val expected = activity.groupBy { case (u, w) =>
      (cohorts(u), weeksBetween(w, cohorts(u)))
    }.view.mapValues(_.size.toLong).toMap
    val got = OlapQueries.cohortRetention(spark, sf).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1)) ->
        r.getLong(2)).toMap
    assert(got == expected)
    assert(got.size > 1, "weekly grain should yield a retention triangle")
    // offset 0 row per cohort: every user is active in their first week
    val zeroOffsets = got.keys.filter(_._2 == 0).map(_._1).toSet
    assert(zeroOffsets == cohorts.values.toSet)
  }

  test("q99 corpusAdmission = gate ∧ first-occurrence, and the " +
      "streaming twin admits the same doc_ids") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // batch twin semantics, recomputed naively
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def gateSignals(text: String): (Int, Double, Double) = {
      val ws = text.split(" ", -1)
      val swr = ws.count(w => w == "the" || w == "a").toDouble / ws.length
      val dr = ws.distinct.length.toDouble / ws.length
      val q = math.floor((0.4 * math.min(swr * 8, 1.0) +
        0.3 * math.min(ws.length.toDouble / 100, 1.0) + 0.3 * dr) *
        10000 + 0.5) / 10000
      (ws.length, q, dr)
    }
    def gatePass(text: String): Boolean = {
      val (nt, q, dr) = gateSignals(text)
      nt >= 20 && q >= 0.35 && dr >= 0.33
    }
    val gated = docs.filter(d => gatePass(d._2))
    val expected = gated.groupBy(_._2).values.map(_.map(_._1).min).toSet
    val batchIds = Pipeline.corpusAdmission(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(batchIds == expected)
    assert(batchIds.size < docs.length, "admission must reject something")

    // streaming twin over the WHOLE corpus — gate unfiltered: every
    // doc is fed with its real (nTokens, quality, distinctRatio)
    // signals, so the stream's own gate must reject what the batch
    // gate rejects. Arrival clock = 1 day + doc_id seconds (strictly
    // positive, ordered by doc_id).
    val dayUs = 86400L * 1000000L
    val feed = docs.map { d =>
      val (nt, q, dr) = gateSignals(d._2)
      (java.security.MessageDigest
        .getInstance("SHA-256").digest(d._2.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString,
        dayUs + d._1 * 1000000L, d._1, nt, q, dr)
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long, Int, Double, Double)]
    val q = CorpusStreams.admissionStream(mem.toDS(), delay = "365 days")
      .writeStream.outputMode("append")
      .format("memory").queryName("admission_test").start()
    try {
      val (b1, b2) = feed.splitAt(feed.length / 2)
      mem.addData(b1.toSeq)
      q.processAllAvailable()
      mem.addData(b2.toSeq)
      q.processAllAvailable()
      // flush: a sentinel far past every arrival clock finalizes state
      val flush = feed.map(_._2).max + 366L * dayUs
      mem.addData(("~flush", flush, -1L, 99, 0.9, 0.9))
      q.processAllAvailable()
      mem.addData(("~flush2", flush + 1, -2L, 99, 0.9, 0.9))
      q.processAllAvailable()
      val streamed = spark.table("admission_test").as[AdmittedDoc]
        .collect().filterNot(_.contentHash.startsWith("~"))
        .map(_.docId).toSet
      assert(streamed == expected,
        s"missing ${expected -- streamed}, extra ${streamed -- expected}")
    } finally q.stop()
  }
}
