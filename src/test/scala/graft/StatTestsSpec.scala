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
}
