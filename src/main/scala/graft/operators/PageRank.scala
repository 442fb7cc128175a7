package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.sources.Tables

/** PageRank over the customer↔supplier trade graph — the
  * link-analysis member of the iterative-trainer family (next to
  * Lloyd k-means q120, logistic GD q124, and power iteration q125):
  * a fixed number of power-method iterations whose every iterate is
  * rounded to 6 dp, so the whole trajectory is engine-portable and a
  * SQL oracle replays THE SAME random walk through unrolled CTEs —
  * the discipline that makes an iterative computation hash-checkable.
  *
  * TWO physical regimes, gated on |V| (the [[ConnectedComponents]]
  * discipline — same algebra, the substrate that wins at each size):
  *
  *  - BROADCAST regime (|V| within [[rddRank]]'s bound): the model
  *    state — a rank per node — is exactly what the other trainers
  *    broadcast, so the loop runs over the raw pair RDD with ZERO
  *    per-iteration Catalyst work. The mirrored edge list partitions
  *    by dst ONCE and persists; each iteration maps every edge to its
  *    contribution from a broadcast (node → m/outdeg) map and
  *    reduces by dst WITH THE SAME PARTITIONER — a narrow,
  *    map-side-combined, zero-shuffle job — then collects the
  *    |V|-bounded contribution map and closes the damped update on
  *    the driver (dangling mass is a sum over the static dangling
  *    set). Measured here: the DataFrame spelling of this loop spent
  *    ~1.5 s of a 4.4 s query re-planning three Catalyst-invariant
  *    iterations (the q155 disease); the RDD loop runs the same
  *    trajectory in ~3 stages total.
  *  - BIG regime (past the bound): rank state cannot ride a broadcast
  *    (a 10⁹-node graph re-ships the model every round), so the loop
  *    stays a DataFrame program under AQE: the edge list persists
  *    ONCE pre-partitioned by src, the out-degree division rides the
  *    RANK side (mw = m/outdeg, an O(|V|) frame) so each iteration
  *    exchanges only rank-sized data, masses combine map-side before
  *    the dst shuffle, and the new iterate is a single ZERO-SEEDED
  *    aggregate — edge contributions union one (node, 0.0) row per
  *    node, so every node emerges from the one aggregate and no
  *    join-back-to-the-node-set stage exists. Each iteration is ONE
  *    driver action (the dangling-mass aggregate doubles as the
  *    cache-populating materialization); iterates persist and the
  *    previous cache drops as the next lands — bounded memory, no
  *    lineage blow-up. Per-round planning latency is noise at that
  *    size, and AQE's skew handling is exactly what a hub node needs.
  *
  * Both regimes compute the SAME 6 dp-rounded trajectory (the
  * rounding quantum absorbs summation-order jitter — see the mass
  * calibration below), proven equal in GraphRankSpec.
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

  // damping literals spelled separately (0.85 and 0.15), NOT derived
  // as 1.0 - d: the Scala-computed difference is 0.15000000000000002
  // while a SQL oracle parsing "0.15" gets 0.1499999999999999944…,
  // and the iterate formula must be bit-identical in both engines
  // before its 6 dp rounding.
  private val D = 0.85
  private val OneMinusD = 0.15

  /** Spark's `round(_, 6)` on a double — java.math.BigDecimal via
    * Double.toString, HALF_UP (mathExpressions.scala's DoubleType
    * branch) — replicated exactly so the RDD regime's driver-side
    * update produces the bit-identical trajectory the DataFrame
    * regime (and the unrolled-CTE SQL oracle) computes.
    */
  private def round6(x: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Top-`topK` nodes by rank mass after `iters` damped iterations.
    * Output: (node_id, node_type, rank_mass), ties broken by node_id.
    * `broadcastNodeBound` gates the RDD broadcast regime — derived
    * from BYTES, not row count: a rank-map entry is ~24 B payload
    * (~48 B built), so 1M nodes ≈ 50 MB per broadcast BUILD, and the
    * build re-ships every iteration. Past that the re-broadcast cost
    * (and driver memory for the per-iteration contribution collect)
    * outgrows what it saves, and the un-hinted AQE DataFrame loop
    * takes over (tests pass 0 to force it on small fixtures).
    */
  def tradeRank(spark: SparkSession, sfDir: String,
      iters: Int = 3, topK: Int = 20,
      broadcastNodeBound: Long = 1000000L): DataFrame = {
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
    // regime statistic: |V| — a metadata-cheap count, probed before
    // anything builds
    val n = nodes.count()
    if (n <= broadcastNodeBound) rddRank(spark, nodes, pairs, n, iters, topK)
    else frameRank(spark, nodes, pairs, n, iters, topK)
  }

  /** The broadcast regime: the damped-iteration algebra over the raw
    * pair RDD. Setup runs three jobs (partition+persist the mirrored
    * edge list keyed by dst, collect the |V|-bounded out-degree map,
    * collect the node set); each iteration is then ONE job whose only
    * stage is NARROW — `mapPartitions(preservesPartitioning = true)`
    * keeps the dst partitioner, so the reduceByKey that sums incoming
    * mass never shuffles — and whose result is the |V|-bounded
    * contribution map. The damped update (teleport + dangling
    * redistribution + 6 dp round) closes on the driver over the node
    * array, exactly the arithmetic the DataFrame regime's projection
    * runs ([[round6]]); the dangling mass for the next iteration is a
    * driver sum over the static dangling set. Zero Catalyst work per
    * iteration — the plan latency that dominated the DataFrame
    * spelling of this regime (~1.5 s of a 4.4 s query at |V|=16k)
    * is gone, the same cure [[ConnectedComponents.components]] applies
    * to its small-graph loop.
    */
  private def rddRank(spark: SparkSession, nodes: DataFrame,
      pairs: DataFrame, n: Long, iters: Int, topK: Int): DataFrame = {
    val sc = spark.sparkContext
    val parts = math.max(4L, n / 2000L).toInt
    val edgesByDst = pairs.rdd
      .flatMap { r =>
        val c = r.getLong(0); val s = r.getLong(1)
        Iterator((s, c), (c, s)) // (dst, src), both directions
      }
      .partitionBy(new HashPartitioner(parts))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val degMap = edgesByDst
      .map { case (_, src) => (src, 1L) }
      .reduceByKey(_ + _)
      .collectAsMap() // |V|-bounded by the regime gate
    val nodeArr = nodes.rdd.map(_.getLong(0)).collect()
    java.util.Arrays.sort(nodeArr) // deterministic driver fold order
    val dangling = nodeArr.filterNot(degMap.contains)
    var rank = new scala.collection.mutable.LongMap[Double](nodeArr.length)
    nodeArr.foreach(nid => rank.update(nid, 1.0)) // every node starts at 1
    var dang = dangling.length.toDouble
    for (_ <- 1 to iters) {
      // the out-degree division rides the rank side (mw = m/outdeg) —
      // the broadcast ships O(|V|), never edge-sized data. An edge
      // whose src has no rank entry drops, matching the regime twin's
      // inner join.
      val mw = new scala.collection.mutable.LongMap[Double](degMap.size)
      degMap.foreach { case (nid, dg) =>
        rank.get(nid).foreach(m => mw.update(nid, m / dg))
      }
      val bc = sc.broadcast(mw)
      val contrib = edgesByDst
        .mapPartitions({ it =>
          val m = bc.value
          it.flatMap { case (dst, src) => m.get(src).map(v => (dst, v)) }
        }, preservesPartitioning = true)
        .reduceByKey(_ + _) // same partitioner — narrow, no shuffle
        .collectAsMap()
      val next = new scala.collection.mutable.LongMap[Double](nodeArr.length)
      val dangShare = dang / n
      nodeArr.foreach { nid =>
        next.update(nid,
          round6(OneMinusD + D * (contrib.getOrElse(nid, 0.0) + dangShare)))
      }
      dang = { var s = 0.0; dangling.foreach(nid => s += next(nid)); s }
      rank = next
      bc.destroy()
    }
    val top = nodeArr.map(nid => (nid, rank(nid)))
      .sortBy { case (nid, m) => (-m, nid) }
      .take(topK)
    edgesByDst.unpersist(false)
    import spark.implicits._
    spark.createDataset(top.toSeq.map { case (nid, m) =>
      (nid, if (nid % 2 == 0) "customer" else "supplier", m)
    }).toDF("node_id", "node_type", "rank_mass")
  }

  /** The big-graph regime: the same algebra as a DataFrame program
    * under AQE — see the object scaladoc for the plan shape. Caches:
    * the RAW edge list repartitioned by src (the 100 TB layout — the
    * per-iteration join key), the NDV-sized out-degree table, and the
    * dangling-node SET (topology, not mass — static; its MASS is
    * re-aggregated per iterate).
    */
  private def frameRank(spark: SparkSession, nodes: DataFrame,
      pairs: DataFrame, n: Long, iters: Int, topK: Int): DataFrame = {
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
      .repartition(col("src"))
      .persist() // re-joined every iteration, already src-partitioned
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .persist() // NDV-sized
    val dangNodes = nodes.join(deg, col("node_id") === col("src"),
        "left_anti")
      .select("node_id")
      .persist()
    // this one action populates all three caches; every node starts
    // at mass 1.0
    var dang = dangNodes.count().toDouble
    var ranks = nodes.withColumn("m", lit(1.0))
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      // the out-degree division rides the O(|V|) rank side — mw is
      // rank-sized, so the edge cache never re-exchanges
      val mw = deg.join(ranks, col("src") === col("node_id"))
        .select(col("src"), (col("m") / col("outdeg")).as("mw"))
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
          round(lit(OneMinusD) + lit(D) *
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
      else dang = next.join(dangNodes, Seq("node_id"), "left_semi")
        .agg(coalesce(sum("m"), lit(0.0)))
        .collect()(0).getDouble(0)
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
    // ONE grouping exchange carries the raw (c, s) stream: collect_set
    // dedups per customer inside the aggregate (subsuming the separate
    // distinct() exchange the pair spelling paid), and the cached frame
    // is customer-NDV-sized — every later pass (degree probe, wedge
    // generation, edge count) reads it, never the fact join again
    val adj = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .groupBy("c")
      .agg(sort_array(collect_set(col("s"))).as("ss"))
      .persist()
    // statistics pick the plan: one degree probe over the NDV-sized
    // cache decides whether any hub exists — the bulk case (none)
    // explodes wedges in-row with ZERO mitigation overhead, and the
    // salted path only builds when a hub is actually present
    val maxDeg = adj.agg(coalesce(max(size(col("ss"))), lit(0)))
      .head().getInt(0).toLong
    val out = butterflyCensusPlanAdj(adj, maxDegree = Some(maxDeg))
    graft.plans.PlanProbe.dump("q140_butterflies_internal", out)
    val rows = out.collect().toSeq // 1-row report; release the cache
    adj.unpersist(false)
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

  /** [[sortedPairs]] with each pair PACKED into one long
    * (s1·2³² + s2): half the in-row array bytes (a bare long per pair
    * instead of a two-field struct) and the downstream aggregate keys
    * on a single primitive — the codegen'd fast hash path. Only valid
    * while every element is in [0, 2³¹); callers gate on their max-id
    * statistic and fall back to the struct spelling past it.
    */
  private[graft] def sortedPackedPairs(arr: Column): Column =
    flatten(transform(arr, (x, i) =>
      transform(slice(arr, i + lit(2), size(arr)), y =>
        x * lit(1L << 32) + y)))

  private[graft] def butterflyCensusPlan(pairs: DataFrame,
      hubDegreeCap: Int = 4096,
      maxDegree: Option[Long] = None): DataFrame =
    butterflyCensusPlanAdj(
      pairs.groupBy("c")
        .agg(sort_array(collect_set(col("s"))).as("ss")),
      hubDegreeCap, maxDegree)

  /** The census over a pre-grouped adjacency frame (c, ss: sorted
    * distinct suppliers) — the shape [[butterflyCount]] caches. The
    * earlier pair-level spelling self-joined the edge stream on the
    * customer, which shuffled it twice more (both join sides) after
    * the distinct's exchange; here wedge pairs generate IN-ROW off the
    * sorted adjacency ([[sortedPairs]] — C(deg,2) structs from
    * codegen, each unordered pair exactly once), so the edge stream
    * crosses the network exactly once, in the grouping exchange that
    * builds `ss`. The hub guard is unchanged in spirit: light
    * customers explode in-row (≤ C(cap,2) rows from one input row);
    * hub adjacencies re-flatten and take the salted chunk join so one
    * hot customer's C(deg,2) wedges spread over ⌈deg/cap⌉ tasks.
    */
  private[graft] def butterflyCensusPlanAdj(adj: DataFrame,
      hubDegreeCap: Int = 4096,
      maxDegree: Option[Long] = None,
      inRowDegreeCap: Int = 512): DataFrame = {
    // wedge keys PACK into one long (s1·2³² + s2 — ids are far below
    // 2³¹): the census only needs pair IDENTITY, and a single-long
    // group key keeps the multi-million-row wedge aggregate in fast
    // codegen'd hash paths instead of two-column struct keys. The
    // in-row explode materializes the FULL C(deg,2) long array inside
    // one row before generating, so it takes only adjacencies whose
    // degree is at most `inRowDegreeCap` (512 → ≤ ~1 MB per row);
    // degrees between that and `hubDegreeCap` stream through the
    // chunk join with nch = 1 — a plain per-customer self-join whose
    // output is row-at-a-time, never a row-sized buffer. hubDegreeCap
    // keeps its original role: bounding per-TASK join fan-out.
    val pk = lit(1L << 32)
    val inRowCap = math.min(hubDegreeCap, inRowDegreeCap)
    def inRowWedges(a: DataFrame) =
      a.select(explode(sortedPackedPairs(col("ss"))).as("k"))
    val wedges = (if (maxDegree.exists(_ <= inRowCap)) {
      inRowWedges(adj)
    } else {
      val lightWedges =
        inRowWedges(adj.filter(size(col("ss")) <= inRowCap))
      // hub path: chunk the adjacency, replicate the left leg across
      // chunks, join on (c, right-chunk) — same wedge multiset, spread
      // over ⌈deg/cap⌉ tasks per hub
      val hubRows = adj.filter(size(col("ss")) > inRowCap)
        .select(col("c"), size(col("ss")).as("degc"),
          explode(col("ss")).as("s"))
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
        .select((col("s1") * pk + col("s2")).as("k"))
      lightWedges.unionAll(hubWedges)
    }).groupBy("k").agg(count(lit(1)).as("cnt"))
    wedges.agg(
      sum("cnt").as("n_wedges"),
      count(lit(1)).as("n_supplier_pairs"),
      // c choose 2 in integer math: c·(c−1) is even, div is exact
      sum(expr("cnt * (cnt - 1) div 2")).as("n_butterflies"))
      // n_edges = Σ|adjacency|: the sets are distinct by construction,
      // so this equals the distinct (c, s) pair count whether or not
      // the caller's pair stream carried duplicates
      .crossJoin(broadcast(adj.agg(
        coalesce(sum(size(col("ss"))), lit(0L)).as("n_edges"))))
      .select(col("n_edges"), col("n_wedges"),
        col("n_supplier_pairs"), col("n_butterflies"))
  }
}
