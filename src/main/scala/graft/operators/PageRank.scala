package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * It stays a DataFrame and each iteration is ONE driver action: the
  * dangling-node SET is static (topology, computed once before the
  * loop), so the action that materializes iterate i is the 1-row
  * aggregate of iterate i's mass over that set — exactly the
  * dangling-mass parameter iteration i+1 needs (iteration 1's mass is
  * |dangling|·1.0 from the setup count). The new iterate itself is a
  * single ZERO-SEEDED aggregate — edge contributions union one
  * (node, 0.0) row per node, so every node emerges from the aggregate
  * and no join-back-to-the-node-set stage exists. That is
  * Spark-at-100TB PageRank: the edge list persists ONCE,
  * pre-partitioned by src, the out-degree division rides the RANK
  * side (mw = m/outdeg, an O(|V|) frame) so each iteration exchanges
  * only rank-sized data, and masses combine map-side before the dst
  * shuffle. While |V| is broadcast-sized the whole loop is pre-planned
  * from that statistic (AQE off, explicit broadcasts, |V|-sized
  * shuffle partitions — see the loop comment); past it the same loop
  * runs un-hinted under AQE. Iterates persist and the previous cache
  * drops as soon as the next materializes — bounded memory, no
  * lineage blow-up.
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
    // The loop's join sides and sizes are KNOWN before it runs — the
    // rank/degree frames are O(|V|) and every exchange is rank-sized —
    // so while |V| is broadcast-sized the whole computation is
    // pre-planned from that one statistic (a metadata-cheap node
    // count, probed BEFORE anything builds): AQE off (its per-job
    // re-planning dominates a tiny iteration and its decisions are
    // exactly the ones we've already made), explicit broadcasts, and
    // shuffle partitions sized from |V| instead of the corpus default
    // (measured on this box: 12 s → 2.2 s for 3 iterations at
    // |V|=16k). Past the broadcast bound — the 10⁹-node cluster —
    // everything runs un-hinted with AQE on: mw joins ride the
    // src-partitioned edge cache and skew handling matters more than
    // scheduling latency.
    val n = nodes.count() // parameter: |V| (parquet-metadata count)
    // broadcast-regime bound derived from BYTES, not row count: an mw
    // row is ~24 B payload (~48 B built), so 1M nodes ≈ 50 MB per
    // broadcast BUILD — and the build re-ships every iteration. Past
    // that the re-broadcast cost (and driver/executor memory) outgrows
    // the exchange it saves and is a sizing AQE itself would never
    // choose; the un-hinted AQE path takes over well before the old
    // 8M-row bound's hundreds-of-MB-per-round hazard.
    val bcastable = n <= 1000000L
    // iteration-invariant state, built and MATERIALIZED once, OUTSIDE
    // the tuned regime: the setup join (lineitem⋈orders → distinct
    // pairs) is corpus-sized work that wants AQE and default shuffle
    // partitions — only the ITERATIONS (rank-sized frames with known
    // shapes) benefit from the pre-planned loop confs. The caches:
    // the RAW edge list, repartitioned by src (the 100 TB layout —
    // the per-iteration join key), the NDV-sized out-degree table,
    // and the dangling-node SET (topology, not mass — static).
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
      .repartition(col("src"))
      .persist() // re-joined every iteration, already src-partitioned
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .persist() // NDV-sized
    val dangNodes = nodes.join(deg, col("node_id") === col("src"),
        "left_anti")
      .select("node_id")
      .persist() // static set; its MASS is re-aggregated per iterate
    // this one action populates all three caches under the un-tuned
    // planner; every node starts at mass 1.0
    val dangStart = dangNodes.count().toDouble
    def run(): DataFrame = {
    var ranks = nodes.withColumn("m", lit(1.0))
    var prev: DataFrame = null
    var dang = dangStart
      for (_ <- 1 to iters) {
        // the out-degree division rides the O(|V|) rank side — mw is
        // rank-sized, so the edge cache never re-exchanges
        val mw0 = deg.join(ranks, col("src") === col("node_id"))
          .select(col("src"), (col("m") / col("outdeg")).as("mw"))
        val mw = if (bcastable) broadcast(mw0) else mw0
        // ZERO-SEEDED incoming-mass aggregate: edge contributions
        // union one (node, 0.0) row per node off the cached iterate,
        // so every node comes out of the ONE map-side-combined
        // aggregate and no join-back-to-the-node-set stage exists
        // (+0.0 terms are IEEE no-ops — mass is non-negative)
        val next = edges.join(mw, "src")
          .select(col("dst").as("node_id"), col("mw"))
          .unionAll(ranks.select(col("node_id"), lit(0.0).as("mw")))
          .groupBy("node_id").agg(sum("mw").as("contrib"))
          .select(col("node_id"),
            round(lit(oneMinusD) + lit(d) *
              (col("contrib") + lit(dang) / n), 6)
              .as("m"))
          .persist()
        // the iteration's SINGLE action: the dangling-mass semi-join
        // consumes every partition of `next` (populating its cache
        // exactly like a count() would) and returns the 1-row
        // parameter the NEXT iteration reads. With NO dangling nodes
        // the semi-join could collapse to an empty relation (AQE
        // empty-propagation) WITHOUT scanning next — the mass is
        // identically 0 then, so a plain count() materializes instead
        if (dang == 0.0) next.count()
        else {
          val dang0 = next.join(
            if (bcastable) broadcast(dangNodes) else dangNodes,
            Seq("node_id"), "left_semi")
          dang = dang0.agg(coalesce(sum("m"), lit(0.0)))
            .collect()(0).getDouble(0)
        }
        if (prev != null) prev.unpersist(false)
        prev = next
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
      dangNodes.unpersist(false)
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), out.schema)
    }
    // the pre-planned regime runs under the shared loop-conf lock
    // ([[LoopRegime]]): serialized against other tuned loops, restore
    // guaranteed — concurrent queries never see a torn half-regime
    if (bcastable)
      LoopRegime.withConfs(spark, Map(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" ->
          math.max(8L, n / 2000L).toString))(run())
    else run()
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
    * shuffle.
    *
    * HUB MITIGATION (the 100 TB hazard is one hot customer): a
    * customer of degree 10⁴ closes 5·10⁷ wedges, and the plain
    * self-join emits them all FROM ONE TASK (every row of a join key
    * lands in one partition). Customers whose degree exceeds
    * `hubDegreeCap` therefore take a salted two-phase path: their
    * adjacency splits into ⌈deg/cap⌉ hash chunks, the left side
    * replicates each row to every chunk id, and the join key becomes
    * (customer, right-chunk) — so the hub's C(deg,2) outputs spread
    * over ⌈deg/cap⌉ tasks, each emitting ≤ deg·cap rows. Each
    * unordered supplier pair still appears EXACTLY once (the s₁ < s₂
    * guard keeps only the orientation whose right leg owns the
    * chunk), so the wedge multiset — and the census — is identical
    * to the plain plan's; a spec proves equality at two cap settings
    * on a fixture with a synthetic hub. Light customers (the bulk)
    * take the plain self-join untouched.
    */
  def butterflyCount(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
      .persist() // both sides of the wedge self-join
    // statistics pick the plan: one NDV-sized degree probe over the
    // cache decides whether any hub exists — the bulk case (none)
    // runs the plain self-join with ZERO mitigation overhead, and the
    // salted path only builds when a hub is actually present
    val maxDeg = pairs.groupBy("c").agg(count(lit(1)).as("d"))
      .agg(max("d")).head().getLong(0)
    val out = butterflyCensusPlan(pairs, maxDegree = Some(maxDeg))
    val rows = out.collect().toSeq // 1-row report; release the cache
    pairs.unpersist(false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), out.schema)
  }

  /** The lazy census plan over a (c, s) trade-pair frame — separate so
    * plan and equality tests can drive it with explicit caps.
    * `hubDegreeCap` bounds per-task wedge fan-out (see scaladoc above).
    * `maxDegree` is the caller's degree statistic: when it proves no
    * hub exists (max ≤ cap — the TPC-H degree profile, ~30), the plan
    * is EXACTLY the plain self-join — the mitigation machinery (anti
    * join, chunk explode, union) isn't built at all, so the common
    * case pays zero overhead. Absent or exceeded, the guarded
    * two-path plan builds.
    */
  /** All unordered element pairs (s1 < s2) of a sorted distinct
    * array, each emitted exactly once: element i pairs with every
    * later element. C(n,2) structs generated in-row by codegen — the
    * self-join spelling generates n² rows and filters half away, plus
    * pays the join machinery; this is the degree-ordered generation
    * the wedge/basket censuses want (state bounded by the per-key
    * degree, which the hub path caps).
    */
  private[graft] def sortedPairs(arr: Column): Column =
    flatten(transform(arr, (x, i) =>
      transform(slice(arr, i + lit(2), size(arr)), y =>
        struct(x.as("s1"), y.as("s2")))))

  private[graft] def butterflyCensusPlan(pairs: DataFrame,
      hubDegreeCap: Int = 4096,
      maxDegree: Option[Long] = None): DataFrame = {
    // wedge keys PACK into one long (s1·2³² + s2 — ids are far below
    // 2³¹): the census only needs pair IDENTITY, and a single-long
    // group key keeps the multi-million-row wedge aggregate in fast
    // codegen'd hash paths instead of two-column struct keys
    val pk = lit(1L << 32)
    val wedges = (if (maxDegree.exists(_ <= hubDegreeCap)) {
      pairs.select(col("c"), col("s").as("s1"))
        .join(pairs.select(col("c"), col("s").as("s2")), "c")
        .filter(col("s1") < col("s2"))
        .select((col("s1") * pk + col("s2")).as("k"))
    } else {
      val deg = pairs.groupBy("c").agg(count(lit(1)).as("degc"))
      val hubs = deg.filter(col("degc") > hubDegreeCap)
      val light = pairs.join(hubs, Seq("c"), "left_anti")
      val lightWedges = light.select(col("c"), col("s").as("s1"))
        .join(light.select(col("c"), col("s").as("s2")), "c")
        .filter(col("s1") < col("s2"))
      // hub path: chunk the adjacency, replicate the left leg across
      // chunks, join on (c, right-chunk) — same wedge multiset, spread
      // over ⌈deg/cap⌉ tasks per hub
      val hubRows = pairs.join(hubs, Seq("c"))
        .withColumn("nch",
          ceil(col("degc").cast("double") / hubDegreeCap).cast("int"))
        .withColumn("ch",
          pmod(xxhash64(col("s")), col("nch").cast("long")).cast("int"))
      val hubWedges = hubRows
        .select(col("c"), col("s").as("s1"),
          explode(sequence(lit(0), col("nch") - 1)).as("jch"))
        .join(hubRows.select(col("c"), col("s").as("s2"),
          col("ch").as("jch")), Seq("c", "jch"))
        .filter(col("s1") < col("s2"))
        .select(col("c"), col("s1"), col("s2"))
      lightWedges.select((col("s1") * pk + col("s2")).as("k"))
        .unionAll(hubWedges.select((col("s1") * pk + col("s2")).as("k")))
    }).groupBy("k").agg(count(lit(1)).as("cnt"))
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
