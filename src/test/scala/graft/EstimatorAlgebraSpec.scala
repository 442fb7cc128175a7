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
}
