package graft

import org.apache.spark.sql.functions._
import graft.operators.OlapQueries
import graft.sources.Tables

/** Welch's t-test (q145) and IQR outlier fences (q146): driver-side
  * replicas of both statistics from the same quantized inputs.
  */
class StatTestsSpec extends SparkSpec {

  test("welch t: replica from exact permille moments") {
    val r = OlapQueries.welchTTest(spark, sf).collect()(0)
    val vals = Tables.load(spark, sf, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"),
        round(col("value") * 1000, 0).cast("long").as("v"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    def moments(t: String) = {
      val v = vals.filter(_._1 == t).map(_._2)
      (v.length.toLong, v.sum, v.map(x => x * x).sum)
    }
    val (na, sa, ssa) = moments("click")
    val (nb, sb, ssb) = moments("view")
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    val ma = sa.toDouble / na; val mb = sb.toDouble / nb
    val va = (ssa.toDouble - sa.toDouble * sa / na) / (na - 1.0)
    val vb = (ssb.toDouble - sb.toDouble * sb / nb) / (nb - 1.0)
    val sea = va / na; val seb = vb / nb
    val t = (ma - mb) / math.sqrt(sea + seb)
    val df = (sea + seb) * (sea + seb) /
      (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0))
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    assert(math.abs(r.getDouble(4) - r4(t)) < 1e-9, "t_stat")
    assert(math.abs(r.getDouble(5) -
      math.floor(df * 100 + 0.5) / 100) < 1e-9, "welch_df")
    // df between min(n)-1 and na+nb-2 (Welch bounds)
    assert(r.getDouble(5) >= math.min(na, nb) - 1 &&
      r.getDouble(5) <= na + nb - 2)
  }

  test("copurchase lift: replica of baskets, margins, and lift") {
    val got = OlapQueries.copurchaseLift(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2),
        r.getDouble(3))))
    val baskets = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = baskets.map(_._1).distinct.length.toDouble
    val margin = baskets.groupBy(_._2).view.mapValues(_.length.toLong)
    val pairCount = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.groupBy(_._1).values.foreach { b =>
      val ps = b.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        pairCount((ps(i), ps(j))) =
          pairCount.getOrElse((ps(i), ps(j)), 0L) + 1
    }
    got.foreach { case ((a, b), (cab, lift)) =>
      assert(pairCount((a, b)) == cab && cab >= 3)
      val expect = nOrders * cab / (margin(a) * margin(b))
      assert(math.abs(lift -
        math.floor(expect * 10000 + 0.5) / 10000) < 1e-9)
    }
    // output is the top slice by (lift desc, pair)
    val lifts = got.map(_._2._2)
    assert(lifts.map(-_).sameElements(lifts.map(-_).sorted))
  }

  test("calibration deciles: cover the corpus, p monotone across buckets") {
    val rows = graft.operators.Estimators.calibrationDeciles(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    val total = Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(_._2).sum == total, "every row lands in a decile")
    assert(rows.forall(r => r._1 >= 1 && r._1 <= 10))
    // mean predicted p must be nondecreasing across deciles
    val byDecile = rows.sortBy(_._1).map(_._3)
    assert(byDecile.sameElements(byDecile.sorted),
      "avg_p not monotone across deciles")
    // the trained model separates the fixture: top decile is far more
    // positive than the bottom one
    val pos = rows.sortBy(_._1).map(_._4)
    assert(pos.last > pos.head, "no calibration signal")
  }

  test("cross-source dups: totals tie out against the q25 pair list") {
    val matrix = graft.operators.Dedup.crossSourceDups(spark, sf)
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3))))
    val pairs = graft.operators.Dedup.ngramJaccardPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val srcOf = Tables.load(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(matrix.map(_._2._1).sum == pairs.length,
      "every near-dup pair lands in exactly one source cell")
    matrix.foreach { case ((a, b), (n, avg)) =>
      val cell = pairs.filter { case (ai, bi, _) =>
        val (x, y) = (srcOf(ai), srcOf(bi))
        (if (x <= y) (x, y) else (y, x)) == ((a, b))
      }
      assert(cell.length == n, s"count for ($a,$b)")
      val spm = cell.map(p => math.floor(p._3 * 10000 + 0.5).toLong).sum
      assert(avg == ((2 * spm + n) / (2 * n)).toDouble / 10000.0,
        s"integer-space mean for ($a,$b)")
    }
  }

  test("conversion latency: replica of first-touch deltas") {
    val r = OlapQueries.conversionLatency(spark, sf).collect()(0)
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val firsts = ev.groupBy(_._1).view.mapValues { rows =>
      (rows.filter(_._2 == "view").map(_._3).minOption,
        rows.filter(_._2 == "purchase").map(_._3).minOption)
    }.toMap
    val viewers = firsts.filter(_._2._1.isDefined)
    val deltas = viewers.values.flatMap {
      case (Some(v), Some(b)) if b > v => Some((b - v) / 1000000.0)
      case _ => None
    }.toSeq.sorted
    assert(r.getLong(0) == viewers.size)
    assert(r.getLong(1) == deltas.size)
    def pct(p: Double): Double = {
      val pos = p * (deltas.size - 1)
      val lo = pos.toInt; val g = pos - lo
      val v = if (lo + 1 < deltas.size)
        deltas(lo) + g * (deltas(lo + 1) - deltas(lo)) else deltas(lo)
      math.floor(v * 100 + 0.5) / 100
    }
    assert(math.abs(r.getDouble(3) - pct(0.25)) < 1e-9, "p25")
    assert(math.abs(r.getDouble(4) - pct(0.50)) < 1e-9, "p50")
    assert(math.abs(r.getDouble(5) - pct(0.90)) < 1e-9, "p90")
  }

  test("bootstrap ci: replica of hash-drawn resamples, brackets the mean") {
    val r = OlapQueries.bootstrapCi(spark, sf).collect()(0)
    val rows = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val P = 1000000007L
    def weight(ok: Long, b: Int): Long = {
      val u = (((ok * 32 + b) % P) * 2654435761L % P).toDouble / P
      if (u < 0.36787944117144233) 0L
      else if (u < 0.7357588823428847) 1L
      else if (u < 0.9196986029286058) 2L
      else if (u < 0.9810118431238462) 3L else 4L
    }
    val means = (0 until 32).map { b =>
      var sw = 0L; var swc = 0L
      rows.foreach { case (ok, c) =>
        val w = weight(ok, b); sw += w; swc += w * c
      }
      swc.toDouble / sw
    }.sorted
    def pct(p: Double): Double = {
      val pos = p * (means.size - 1)
      val lo = pos.toInt; val g = pos - lo
      if (lo + 1 < means.size) means(lo) + g * (means(lo + 1) - means(lo))
      else means(lo)
    }
    def r2(x: Double) = math.floor(x / 100.0 * 100 + 0.5) / 100
    assert(r.getLong(0) == rows.length)
    assert(math.abs(r.getDouble(2) - r2(pct(0.025))) < 1e-9, "ci_lo")
    assert(math.abs(r.getDouble(3) - r2(pct(0.975))) < 1e-9, "ci_hi")
    // the CI brackets the point estimate
    assert(r.getDouble(2) <= r.getDouble(1) &&
      r.getDouble(1) <= r.getDouble(3))
  }

  test("gini: equals the direct rank-weighted formula, sane bounds") {
    val r = OlapQueries.giniRevenue(spark, sf).collect()(0)
    val cents = Tables.load(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
        .as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val sorted = cents.sortBy(t => (t._2, t._1)).map(_._2)
    val n = sorted.length
    val s = sorted.sum
    val rs = sorted.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    assert(r.getLong(0) == n)
    val gini = 2.0 * rs / (n.toDouble * s) - (n + 1.0) / n
    assert(math.abs(r.getDouble(2) -
      math.floor(gini * 1e6 + 0.5) / 1e6) < 1e-9)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0)
  }

  test("iqr outliers: fences bracket the bulk, tails counted exactly") {
    val rows = OlapQueries.iqrOutliers(spark, sf).collect()
    assert(rows.length == 3)
    val cents = Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("c"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    rows.foreach { r =>
      val flag = r.getString(0)
      val vs = cents.filter(_._1 == flag).map(_._2)
      assert(r.getLong(1) == vs.length)
      val lo = r.getDouble(4) * 100; val hi = r.getDouble(5) * 100
      // counted tails agree with the reported (rounded) fences within
      // the rounding slack of the fence itself
      val nLow = vs.count(_ < lo - 0.5); val nHigh = vs.count(_ > hi + 0.5)
      assert(math.abs(r.getLong(2) - nLow) <= vs.count(v =>
        math.abs(v - lo) <= 0.5), s"n_low for $flag")
      assert(math.abs(r.getLong(3) - nHigh) <= vs.count(v =>
        math.abs(v - hi) <= 0.5), s"n_high for $flag")
      // the overwhelming bulk sits inside Tukey fences
      assert(r.getLong(2) + r.getLong(3) < vs.length / 10)
    }
  }

  test("q159 cusum: closed form tracks the recurrence; alarm compare has margin") {
    val rows = OlapQueries.cusumDailyEvents(spark, sf).collect()
    assert(rows.length >= 10)
    var su = 0.0
    var sd = 0.0
    rows.foreach { r =>
      val z = r.getDouble(2)
      su = math.max(0.0, su + z - 0.5)
      sd = math.max(0.0, sd + (-z) - 0.5)
      // the window closed form is the recurrence (up to double jitter
      // far below the 6dp output grid)
      assert(math.abs(su - r.getDouble(3)) < 1e-6, s"up diverged at $r")
      assert(math.abs(sd - r.getDouble(4)) < 1e-6, s"down diverged at $r")
      assert(r.getBoolean(5) ==
        (r.getDouble(3) > 4.0 || r.getDouble(4) > 4.0))
      // the alarm threshold compare must not sit on the boundary
      assert(math.abs(r.getDouble(3) - 4.0) > 1e-6)
      assert(math.abs(r.getDouble(4) - 4.0) > 1e-6)
    }
  }

  test("q159 cusum: a sustained level shift fires the upward alarm") {
    import spark.implicits._
    // synthetic corpus: ~40 events/day for 20 days, ~80/day after —
    // written in the events schema so the SAME query machinery runs
    val base = 1700000000000000L
    val dayUs = 86400L * 1000000L
    val evs = (0 until 30).flatMap { d =>
      val n = if (d < 20) 40 else 80
      (0 until n).map { i =>
        (d.toLong * 1000 + i, base + d * dayUs + i.toLong * 1000000L,
          i.toLong % 7, "click", 1.0, "{}")
      }
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cusum").toString
    evs.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = OlapQueries.cusumDailyEvents(spark, dir).collect()
    assert(out.length == 30)
    // no alarm before the shift has accumulated; alarm by the tail
    assert(!out.take(20).exists(_.getBoolean(5)),
      "false alarm before the shift")
    assert(out.takeRight(5).forall(_.getBoolean(5)),
      "sustained shift never alarmed")
    // the downward side stays quiet on an upward shift
    assert(out.forall(_.getDouble(4) < 4.0))
  }

  test("q159 cusum: alarm-compare margins hold at all three fixtures") {
    // the oracle's one boolean (cusum > 4.0) must sit far from the
    // boundary at every SF — the tri-scale margin discipline every
    // new decision-bearing oracle gets
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val rows = OlapQueries.cusumDailyEvents(spark, dir).collect()
      val minMargin = rows.flatMap(r =>
        Seq(math.abs(r.getDouble(3) - 4.0),
          math.abs(r.getDouble(4) - 4.0))).min
      assert(minMargin > 1e-4, s"$dir margin $minMargin")
    }
  }
}
