package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** CONNECTED COMPONENTS by alternating large-star / small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC'14) — the doubling algorithm whose round count
  * is O(log n) regardless of component DIAMETER, where min-label
  * propagation (even with pointer jumping, [[Dedup.resolveClusters]])
  * needs O(log diameter) rounds and a 10⁶-long chain would take ~20
  * materializations.
  *
  * Each round is two pure equality-shuffle steps over the edge list —
  * no windows, no driver-side graph state:
  *
  *  - LARGE-STAR: per node u, every strictly-larger neighbor
  *    re-attaches to m = min(Γ(u) ∪ {u}) — one groupBy(min) plus one
  *    join, emitted as (larger, smaller) edges;
  *  - SMALL-STAR: per node u over its ≤-neighbors, everything
  *    (including u) re-attaches to the minimum — same shape.
  *
  * Edges stay oriented (big, small); both steps only ever REDUCE the
  * partner of a node toward its component minimum, and at the fixed
  * point the edge list IS the star forest node → component min. The
  * fixed point is detected by an order-independent checksum
  * (count + sum of row hashes) — one action per round. Edge lists
  * stay edge-sized throughout (each node keeps ≤ its degree partners,
  * deduplicated per round); at 100 TB every step is a key-equality
  * shuffle AQE can split on skew (a hub node's neighborhood is
  * exactly the skew-join case).
  */
object ConnectedComponents {

  /** (node, component) for every node that appears in `edges` —
    * component = the smallest node id reachable. Input columns
    * (a, b); self-loops and duplicates are tolerated.
    */
  def components(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    // orient (big, small), drop self-loops, dedup — the invariant
    // every round preserves
    var cur = edges
      .select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val nodes = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .distinct() // read once at the end — plain lineage is fine
    // the same pre-planned regime as the PageRank loop: the round
    // shapes are known and every frame is edge-sized, so while the
    // edge list is small the loop runs with AQE off and edge-sized
    // shuffle partitions — per-round scheduling latency, not data,
    // dominates a doubling iteration on a modest graph. Big graphs
    // keep AQE (skew splits on hub neighborhoods matter there).
    val nEdges = cur.count()
    val smallGraph = nEdges <= 5000000L
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    if (smallGraph) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(4L, nEdges / 100000L).toString)
    }
    var prevSum: java.math.BigDecimal = null
    var prevCnt = -1L
    var converged = false
    var round = 0
    val maxRounds = 64 // ≫ log₂ of any conceivable node count
    // one LARGE-STAR + SMALL-STAR double round as a lazy plan:
    //  - LARGE-STAR: m(u) = min over Γ(u) ∪ {u}; each neighbor v > u
    //    re-attaches to m. Bidirectional view feeds one min-aggregate
    //    and one join — map-side combinable, key-equality shuffles;
    //    the min-tables are node-sized, so the small-graph regime
    //    broadcasts them (one aggregation exchange plus a map-side
    //    join, no co-partitioning exchanges). Dup edges between the
    //    stars are tolerated (min-aggregates and the final distinct
    //    absorb them) — no intermediate distinct.
    //  - SMALL-STAR: per big endpoint u over its small neighbors
    //    Γ⁻(u), m = min(Γ⁻(u)); u and every other small neighbor
    //    attach to m.
    def hint(df: DataFrame): DataFrame =
      if (smallGraph) broadcast(df) else df
    def starRound(in: DataFrame): DataFrame = {
      val bidir = in.select(col("a").as("u"), col("b").as("v"))
        .unionAll(in.select(col("b").as("u"), col("a").as("v")))
      val mins = bidir.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val afterLarge = bidir.join(hint(mins), "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
      val smins = afterLarge.groupBy(col("a").as("u"))
        .agg(min("b").as("m"))
      smins
        .select(col("u").as("a"), col("m").as("b"))
        .unionAll(afterLarge.join(hint(smins),
            afterLarge("a") === smins("u"))
          .filter(col("b") =!= col("m"))
          .select(col("b").as("a"), col("m").as("b")))
        .select(greatest(col("a"), col("b")).as("a"),
          least(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
    }
    try {
    while (!converged && round < maxRounds) {
      // one star round per materialization: afterLarge is referenced
      // twice inside a round, so composing rounds lazily multiplies
      // the inner DAG ~3× per level (measured 5× slower) — the
      // checkpoint boundary is what keeps each round linear
      val stepped = starRound(cur)
        .localCheckpoint(false) // lazy: the probe below materializes
      // order-independent fixed-point probe: one action per pair
      // (hash sum accumulates in decimal — a long would overflow ANSI)
      val probe = stepped
        .agg(count(lit(1)).as("cnt"),
          coalesce(sum(xxhash64(col("a"), col("b"))
            .cast("decimal(38,0)")), lit(0L).cast("decimal(38,0)"))
            .as("chk"))
        .head()
      val cnt = probe.getLong(0)
      val chk = probe.getDecimal(1)
      converged = cnt == prevCnt && prevSum != null &&
        chk.compareTo(prevSum) == 0
      prevCnt = cnt
      prevSum = chk
      cur = stepped
      round += 1
    }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      spark.conf.set("spark.sql.shuffle.partitions", savedParts)
    }
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxRounds rounds")
    // fixed point: cur is the star forest (node → component min);
    // nodes with no entry (component minima, isolated nodes) are
    // their own component
    nodes.join(cur, nodes("node") === cur("a"), "left")
      .select(col("node"),
        coalesce(col("b"), col("node")).as("component"))
  }

  /** q155: components of a chain graph over the DENSE customer-key
    * space — chains of `chainLen` consecutive custkeys plus skip-2
    * shortcut edges (same components, irregular degrees). Chain
    * diameter ≫ the label-propagation refusal bound, so this query
    * runs the doubling algorithm on a graph min-label propagation
    * would refuse; components are analytically known (the chain
    * start), which is what makes a plain-SQL oracle possible for a
    * whole-graph iterative computation. Output: every node with its
    * component representative, plus the component size it belongs to.
    */
  def chainComponents(spark: SparkSession, sfDir: String,
      chainLen: Long = 1000L): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("k"))
    val next = c.select(col("k").as("a"), (col("k") + 1L).as("b"))
    val skip = c.select(col("k").as("a"), (col("k") + 2L).as("b"))
    val present = c.select(col("k").as("b"))
    // keep edges whose far endpoint exists and stays in the chain —
    // integer DIV (double division can misfloor at 10^12-scale keys);
    // custkeys are 0-based in the fixtures, so blocks are k DIV len
    val edges = next.unionAll(skip)
      .join(present, Seq("b"), "left_semi")
      .filter(expr(s"a DIV $chainLen = b DIV $chainLen"))
    // components() covers nodes that appear in an edge; a customer
    // alone in its block (count ≡ 1 mod chainLen) has none — join the
    // full key set back so every node reports, matching the oracle
    val comp = c.select(col("k").as("node"))
      .join(components(edges), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("component"), col("node")).as("component"))
    val sizes = comp.groupBy("component")
      .agg(count(lit(1)).as("component_size"))
    comp.join(sizes, "component")
      .select(col("node"), col("component"), col("component_size"))
      .orderBy("node")
  }
}
