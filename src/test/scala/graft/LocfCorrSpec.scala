package graft

import org.apache.spark.sql.functions._
import graft.operators.OlapQueries
import graft.sources.Tables

/** LOCF densification (q137) and the exact-moment correlation matrix
  * (q138): spine completeness, carry-forward semantics against a
  * driver-side replay, and r agreement with Spark's own corr().
  */
class LocfCorrSpec extends SparkSpec {

  test("locf: spine is gapless and carry-forward replays locally") {
    val rows = OlapQueries.locfFill(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getDouble(2), r.getBoolean(3)))
    val segs = rows.map(_._1).distinct.sorted
    val days = rows.map(_._2).distinct
    assert(rows.length == segs.length * days.length, "gapless spine")
    // per segment: value changes only on observed days; unobserved
    // days repeat the previous value (0 before the first observation)
    segs.foreach { s =>
      var prev = 0.0
      rows.filter(_._1 == s).sortBy(_._2.toEpochDay).foreach {
        case (_, _, v, obs) =>
          if (!obs) assert(v == prev, s"LOCF break in $s")
          prev = v
      }
    }
    // observed cells equal the direct aggregate
    val direct = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").as("v"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) -> r.getDouble(2))
      .toMap
    rows.filter(_._4).foreach { case (s, d, v, _) =>
      assert(direct((s, d)) == v, s"observed cell ($s,$d)")
    }
  }

  test("corr matrix: 6 pairs, |r| ≤ 1, agrees with Spark's corr()") {
    val got = OlapQueries.corrMatrix(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.size == 6)
    assert(got.values.forall(r => r >= -1.0 && r <= 1.0))
    val li = Tables.load(spark, sf, "lineitem")
    val builtin = li.agg(
      corr(col("l_quantity"), col("l_extendedprice")).as("qp"),
      corr(col("l_discount"), col("l_tax")).as("dt")).collect()(0)
    assert(math.abs(got("qty_price") - builtin.getDouble(0)) < 1e-6)
    assert(math.abs(got("disc_tax") - builtin.getDouble(1)) < 1e-6)
  }
}
