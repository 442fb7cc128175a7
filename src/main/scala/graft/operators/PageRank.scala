package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** PageRank over the customer↔supplier trade graph — the
  * link-analysis member of the iterative-trainer family (next to
  * Lloyd k-means q120, logistic GD q124, and power iteration q125):
  * a fixed number of power-method iterations whose every iterate is
  * rounded to 6 dp, so the whole trajectory is engine-portable and a
  * SQL oracle replays THE SAME random walk through unrolled CTEs —
  * the discipline that makes an iterative computation hash-checkable.
  *
  * Unlike the other trainers, the model state here is O(|nodes|) — a
  * rank per node — so it cannot collect to the driver as literals.
  * It stays a DataFrame: each iteration is ONE shuffle (the
  * incoming-mass aggregate on dst) against the persisted edge list,
  * plus a 1-row dangling-mass aggregate (the collect-a-parameter
  * pattern). That is exactly Spark-at-100TB PageRank: edges
  * hash-partition by src for the rank join, masses combine map-side
  * before the dst shuffle, and the per-iteration driver state is one
  * double. Iterates persist and the previous cache drops as soon as
  * the next materializes — bounded memory, no lineage blow-up.
  *
  * Graph: one node per customer (node_id = 2·custkey) and per
  * supplier (node_id = 2·suppkey + 1 — parity keeps the id spaces
  * disjoint and SQL-replayable); one edge per DISTINCT
  * customer→supplier trade pair from orders⋈lineitem, mirrored in
  * both directions (trade relationships, not payments). Nodes with
  * no edges (customers who never ordered) are dangling: their mass
  * redistributes uniformly, the standard correction.
  *
  * Mass form: ranks are scaled by N (mean mass 1.0) so the 6 dp
  * rounding quantum sits ~10⁷ above the cross-partition summation
  * jitter at any graph size — the same calibration as the other
  * trainers' iterates.
  */
object PageRank {

  /** Top-`topK` nodes by rank mass after `iters` damped iterations.
    * Output: (node_id, node_type, rank_mass), ties broken by node_id.
    */
  def tradeRank(spark: SparkSession, sfDir: String,
      iters: Int = 3, topK: Int = 20): DataFrame = {
    // damping literals spelled separately (0.85 and 0.15), NOT derived
    // as 1.0 - d: the Scala-computed difference is 0.15000000000000002
    // while a SQL oracle parsing "0.15" gets 0.1499999999999999944…,
    // and the iterate formula must be bit-identical in both engines
    // before its 6 dp rounding.
    val d = 0.85
    val oneMinusD = 0.15
    val nodes = Tables.load(spark, sfDir, "customer")
      .select((col("c_custkey") * 2L).as("node_id"))
      .unionAll(Tables.load(spark, sfDir, "supplier")
        .select((col("s_suppkey") * 2L + 1L).as("node_id")))
    val pairs = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2L).as("c"),
        (col("l_suppkey") * 2L + 1L).as("s"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
      .persist() // re-joined every iteration
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .persist() // NDV-sized; read 2× per iteration
    val n = nodes.count() // parameter: |V|
    var ranks = nodes.withColumn("m", lit(1.0)).persist()
    ranks.count() // materialize before the loop reads it twice
    for (_ <- 1 to iters) {
      // dangling mass: nodes with no out-edges (1-row parameter)
      val dang = ranks.join(deg, col("node_id") === col("src"),
          "left_anti")
        .agg(coalesce(sum("m"), lit(0.0))).collect()(0).getDouble(0)
      // incoming mass: src rank spread over its out-degree, summed on
      // dst — map-side partials, one shuffle of O(partial) rows
      val contrib = edges
        .join(deg, "src")
        .join(ranks.withColumnRenamed("node_id", "src"), "src")
        .groupBy(col("dst").as("node_id"))
        .agg(sum(col("m") / col("outdeg")).as("contrib"))
      val next = nodes.join(contrib, Seq("node_id"), "left_outer")
        .select(col("node_id"),
          round(lit(oneMinusD) + lit(d) *
            (coalesce(col("contrib"), lit(0.0)) + lit(dang) / n), 6)
            .as("m"))
        .persist()
      next.count() // materialize, then drop the previous iterate
      ranks.unpersist(false)
      ranks = next
    }
    val out = ranks
      .select(col("node_id"),
        when(col("node_id") % 2 === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        col("m").as("rank_mass"))
      .orderBy(desc("rank_mass"), asc("node_id"))
      .limit(topK)
    // the report is topK rows — materialize it, then release the
    // caches deterministically (the Percentiles discipline)
    val rows = out.collect().toSeq
    ranks.unpersist(false)
    edges.unpersist(false)
    deg.unpersist(false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), out.schema)
  }

  /** BUTTERFLY (bipartite 4-cycle) census of the trade graph — the
    * clustering motif of bipartite graphs (customer↔supplier here;
    * triangles cannot exist across a bipartition, so butterflies are
    * what "clustering" means): two customers sharing two suppliers
    * close a 4-cycle.
    *
    * Wedge formulation, all exact integer arithmetic:
    * wedges (s₁ < s₂ sharing a customer) come off a self-join of the
    * distinct trade-pair list keyed on the customer; grouping wedges
    * by the supplier pair gives per-pair counts c, and each pair
    * closes C(c,2) butterflies. The wedge stream is Σ_c C(deg(c), 2)
    * rows — quadratic in per-customer degree, linear in customers —
    * and reduces map-side to ≤ C(|suppliers|, 2) groups before the
    * shuffle. At a 100 TB bipartite graph the standard mitigations
    * (degree-ordered wedge generation, hub-vertex sampling) bolt onto
    * exactly this plan; the fixture's degrees (~30) keep the exact
    * census cheap.
    */
  def butterflyCount(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
      .persist() // both sides of the wedge self-join
    val out = butterflyCensusPlan(pairs)
    val rows = out.collect().toSeq // 1-row report; release the cache
    pairs.unpersist(false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), out.schema)
  }

  /** The lazy census plan over a (c, s) trade-pair frame — separate so
    * plan tests can inspect it before the 1-row report materializes.
    */
  private[graft] def butterflyCensusPlan(pairs: DataFrame): DataFrame = {
    val wedges = pairs.select(col("c"), col("s").as("s1"))
      .join(pairs.select(col("c"), col("s").as("s2")), "c")
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("cnt"))
    wedges.agg(
      sum("cnt").as("n_wedges"),
      count(lit(1)).as("n_supplier_pairs"),
      // c choose 2 in integer math: c·(c−1) is even, div is exact
      sum(expr("cnt * (cnt - 1) div 2")).as("n_butterflies"))
      .crossJoin(broadcast(pairs.agg(count(lit(1)).as("n_edges"))))
      .select(col("n_edges"), col("n_wedges"),
        col("n_supplier_pairs"), col("n_butterflies"))
  }
}
