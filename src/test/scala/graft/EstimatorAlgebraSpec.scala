package graft

import org.apache.spark.sql.functions._
import graft.plans.CardinalityEstimator
import graft.sources.Tables

/** Join-cardinality estimation (q135) and KMV set algebra (q136):
  * exact audit columns recomputed driver-side, the sampled estimate's
  * determinism, and the small-domain branch where every estimate
  * must turn exact.
  */
class EstimatorAlgebraSpec extends SparkSpec {

  private val P = 1000000007L

  test("join-card: exact F2 matches a local recompute, estimate sane") {
    val r = CardinalityEstimator.joinCardEstimate(spark, sf).collect()(0)
    val counts = Tables.load(spark, sf, "lineitem")
      .groupBy("l_partkey").agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val exact = counts.map(t => t._2 * t._2).sum
    assert(r.getLong(0) == exact)
    val sampled = counts
      .filter(t => ((t._1 % P) * 2654435761L) % P < P / 64L)
      .map(t => t._2 * t._2).sum * 64L
    assert(r.getLong(1) == sampled)
    // 1-in-64 key sampling over a near-uniform key domain: the
    // estimate is the right order of magnitude on the fixture
    assert(r.getLong(1) > exact / 4 && r.getLong(1) < exact * 4,
      s"est ${r.getLong(1)} vs exact $exact")
    assert(math.abs(r.getDouble(2) -
      (sampled - exact).toDouble / exact * 100) < 0.01)
  }

  test("kmv set algebra: audit columns match a local recompute") {
    val r = CardinalityEstimator.kmvSetAlgebra(spark, sf).collect()(0)
    val dom = Tables.load(spark, sf, "lineitem")
      .filter(col("l_returnflag").isin("R", "A"))
      .select("l_returnflag", "l_partkey").distinct()
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val a = dom.filter(_._1 == "R").map(_._2).toSet
    val b = dom.filter(_._1 == "A").map(_._2).toSet
    // hash collisions would merge domain members; the portable hash is
    // injective on key domains ≪ P, which the fixture satisfies
    assert(r.getLong(0) == a.size && r.getLong(1) == b.size)
    assert(r.getLong(2) == (a ++ b).size)
    assert(r.getLong(4) == (a & b).size)
  }

  test("kmv set algebra: small-domain branch is exact (sf0.001)") {
    val r = CardinalityEstimator.kmvSetAlgebra(spark, sf, k = 256)
      .collect()(0)
    if (r.getLong(2) <= 256) { // union below k: sample IS the union
      assert(r.getLong(3) == r.getLong(2), "union_est must equal exact")
      assert(r.getLong(5) == r.getLong(4), "inter_est must equal exact")
      val jacc = math.floor(
        r.getLong(4).toDouble / r.getLong(2) * 10000 + 0.5) / 10000
      assert(math.abs(r.getDouble(6) - jacc) < 1e-9)
    }
  }

  test("estimates are deterministic across runs") {
    val a = CardinalityEstimator.kmvSetAlgebra(spark, sf).collect()(0)
    val b = CardinalityEstimator.kmvSetAlgebra(spark, sf).collect()(0)
    assert(a.toSeq == b.toSeq)
  }

  test("chi-square: replica over the full expected grid") {
    val got = graft.operators.OlapQueries.chiSquare(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ev = Tables.load(spark, sf, "events")
      .select(col("event_type"), hour(col("ts")).as("h"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val cells = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val types = ev.map(_._1).distinct
    val hours = ev.map(_._2).distinct
    val rt = types.map(t => t -> ev.count(_._1 == t).toLong).toMap
    val ct = hours.map(h => h -> ev.count(_._2 == h).toLong).toMap
    val n = ev.length.toDouble
    types.foreach { t =>
      val chi = hours.map { h =>
        val e = rt(t).toDouble * ct(h).toDouble / n
        val o = cells.getOrElse((t, h), 0L).toDouble
        (o - e) * (o - e) / e
      }.sum
      val (nEv, chiGot) = got(t)
      assert(nEv == rt(t))
      assert(math.abs(chiGot -
        math.floor(chi * 10000 + 0.5) / 10000) < 1e-9, s"chi2 for $t")
    }
  }

  test("column entropy: replica, bounds, and NDV agreement") {
    val got = CardinalityEstimator.columnEntropy(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == Set("l_returnflag", "l_linestatus",
      "l_linenumber", "l_quantity"))
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_linenumber").cast("string"),
        col("l_quantity").cast("string"))
      .collect()
    def check(name: String, vals: Seq[String]): Unit = {
      val counts = vals.groupBy(identity).view.mapValues(_.size).toMap
      val n = vals.size.toDouble
      val h = -counts.values.map { c =>
        val p = c / n; p * math.log(p)
      }.sum
      val (ndv, ent) = got(name)
      assert(ndv == counts.size, s"$name ndv")
      assert(math.abs(ent - math.floor(h * 10000 + 0.5) / 10000) < 1e-9,
        s"$name entropy")
      assert(ent >= 0 && ent <= math.log(counts.size) + 1e-9)
    }
    check("l_returnflag", li.map(_.getString(0)).toSeq)
    check("l_linestatus", li.map(_.getString(1)).toSeq)
    check("l_linenumber", li.map(_.getString(2)).toSeq)
    check("l_quantity", li.map(_.getString(3)).toSeq)
  }
}
