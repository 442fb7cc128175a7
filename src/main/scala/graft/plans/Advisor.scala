package graft.plans

/** Profile-driven re-optimization advice — closing the loop the
  * reference never could. The reference's whole workflow was: run the
  * pipeline with its ProfilerHook, load the merged timeline, stare at
  * the trace to find the bottleneck step, then hand-tune it
  * (reference README.md:138-144 and the `issue_profile.png`
  * walkthrough). [[TraceCapture]] already produces the per-operator
  * half of that story; this object reads those trace lines and emits
  * the top-N costliest exchanges / scans / spills / joins WITH the
  * matching tuning lever — the "query plan" panel of a SQL console,
  * as a library call over the engine's own profiler dumps.
  *
  * Pure function of the trace text (no session, no jobs): advice is
  * reproducible from an artifact, which is what makes it testable
  * against a deterministic fixture and usable offline against a
  * cluster's collected traces.
  *
  * Signals and levers (per operator kind, ranked by its own cost
  * metric, times preferred over sizes):
  *
  *  - EXCHANGE (shuffle): `shuffleWriteTime` (ns) + `fetchWaitTime`
  *    (ms), falling back to `dataSize`. Lever: pre-aggregate before
  *    the shuffle, shuffle only key+payload columns, broadcast the
  *    small side, or bucket/co-partition both sides.
  *  - SCAN: `scanTime` (ms), falling back to `filesSize`; a scan
  *    whose files are numerous but tiny additionally flags
  *    compaction. Lever: push predicates / prune columns; partition
  *    or Z-order by the hot predicate; compact small files.
  *  - SPILL: any operator with `spillSize` > 0. Lever: more shuffle
  *    partitions / smaller `maxPartitionBytes` / salt hot keys (AQE
  *    skew-join covers joins).
  *  - BROADCAST: `dataSize` of a BroadcastExchange near the build
  *    limit. Lever: verify the build side stays dim-sized at scale or
  *    switch to a shuffled join.
  *  - NESTED LOOP: any CartesianProduct / BroadcastNestedLoopJoin.
  *    Lever: rewrite with an equality key (banding / blocking /
  *    bounding one side).
  *  - SORT: `sortTime` (ms) under a sort-merge join. Lever: bucket
  *    both sides on the join key or broadcast the smaller one.
  *  - SUMMARY CANDIDATE (cross-query): a source path scanned by ≥2
  *    DISTINCT aggregate-bearing single-table queries. Lever: register
  *    a materialized summary ([[Summaries.create]]) so qualifying
  *    aggregates route onto the grain-level pre-aggregate — the
  *    advice that closes the profile → [[SummaryRewrite]] loop.
  *  - JOINED-SUMMARY CANDIDATE (cross-query): the same TWO-table
  *    equi-join feeding aggregates in ≥2 distinct queries — a
  *    single-table summary can never serve those. Lever:
  *    [[Summaries.createJoined]], which pre-computes the join AND the
  *    grain aggregate (the q177 routing shape).
  *  - HISTOGRAM-GRAIN CANDIDATE (cross-query): percentile-family
  *    aggregates over the same scan in ≥2 distinct queries. A sort
  *    per percentile never amortizes; a summary whose grain is
  *    (grouping columns ∪ percentile value columns) IS the
  *    counts-route histogram — every percentile / extremum / count
  *    over it becomes an NDV-sized walk (the q179 lever). The
  *    nominated grain is carried in the lever text.
  *  - ROLLUP CANDIDATE (cross-query): rollup/cube aggregates
  *    (grouping includes `spark_grouping_id`, i.e. an Expand
  *    multiplies the scan by the level count) over the same table in
  *    ≥2 distinct queries. Lever: a summary at the base grain slides
  *    under the Expand and each level re-aggregates summary rows
  *    cnt-weighted (the q181 lever).
  *  - PARTITION CANDIDATE (cross-query): the same EQUALITY predicate
  *    columns pushed as data filters (never partition filters) in ≥2
  *    distinct queries. Lever: rewrite Hive-partitioned on them
  *    ([[graft.operators.Layout.partitionByColumns]]) — directory
  *    pruning at planning.
  *  - SORT-CLUSTER CANDIDATE (cross-query): the same RANGE predicate
  *    columns pushed in ≥2 distinct queries while the scan EMITS far
  *    more rows than the filter keeps (row-group stats not
  *    skipping). Lever: rewrite range-clustered
  *    ([[graft.operators.Layout.sortByColumns]]) — the high-NDV
  *    complement to partitioning. EXACTLY TWO shared range columns
  *    upgrade to a Z-ORDER nomination
  *    ([[graft.operators.Layout.zorderByColumns]]): interleaved-bit
  *    cells make both columns' stats tight where a lexicographic
  *    sort serves only its leading column.
  *  - COMPACT CANDIDATE: a scan of ≥16 files averaging <4 MB — the
  *    small-files flag that always rode in the scan lever's prose,
  *    as a machine-readable nomination. Lever:
  *    [[graft.operators.Layout.compact]] (size-targeted rewrite,
  *    partition-tree-preserving).
  */
object Advisor {

  /** One piece of advice: which query, which operator (with its walk
    * position for disambiguation), what was measured, and the lever.
    * MV nominations additionally carry a MACHINE-READABLE payload —
    * `kind` ("summary" | "histogram" | "rollup" | "join"), the source
    * `paths`, the nominated `grain` (union of the nominated queries'
    * grouping/value column references), and for joins the equi-edge
    * list — which is what [[materialize]] consumes to perform the
    * recommended create/createJoined call instead of leaving the
    * lever as prose.
    */
  case class Finding(query: String, op: String, signal: String,
      value: Long, unit: String, lever: String,
      kind: String = "", paths: Seq[String] = Nil,
      grain: Seq[String] = Nil, edges: Seq[String] = Nil,
      queries: Seq[String] = Nil,
      // summary nominations only: the filter conjuncts EVERY
      // nominated query pushes (intersection across the workload) —
      // materialize() turns them into the created summary's declared
      // WHERE, the filtered-MV upgrade
      filters: Seq[String] = Nil)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Top-`topN` findings per signal class over the trace lines
    * (highest measured cost first within each class, classes in the
    * scaladoc's order). Malformed lines are skipped — advice must
    * work on a partially-written trace file.
    */
  def advise(lines: Iterator[String], topN: Int = 5,
      broadcastWarnBytes: Long = 64L * 1024 * 1024): Seq[Finding] = {
    val exchanges = collection.mutable.ArrayBuffer.empty[Finding]
    val scans = collection.mutable.ArrayBuffer.empty[Finding]
    val spills = collection.mutable.ArrayBuffer.empty[Finding]
    val broadcasts = collection.mutable.ArrayBuffer.empty[Finding]
    val loops = collection.mutable.ArrayBuffer.empty[Finding]
    val sorts = collection.mutable.ArrayBuffer.empty[Finding]
    // summary candidates: source path -> (per-query WORST scanTime ms,
    // union of grouping-column references — materialize()'s grain).
    // A bench traces each query several times — repeats collapse to
    // the max per (query, path) here, the same discipline top()
    // applies, so the reported total is a sum over DISTINCT queries,
    // not inflated by the repetition factor
    val sumCand = collection.mutable.Map
      .empty[String, (collection.mutable.Map[String, Long],
        collection.mutable.LinkedHashSet[String])]
    // per summary-candidate path, the INTERSECTION of pushed filter
    // conjuncts across its aggregate queries: when every query scans
    // the same slice, the nomination upgrades to a FILTERED summary
    // (create(..., where = ...)) — the slice's grain rows only
    val sumFilters = collection.mutable.Map.empty[String, Set[String]]
    // joined-summary candidates: (sorted path tuple) -> per-query
    // worst total scanTime, for aggregate-bearing MULTI-TABLE JOIN
    // queries (two-table fact⋈dim or an N-table star) — the
    // single-table summary can't serve those; Summaries.createJoined
    // can (it registers any INNER equi-join tree under the canonical
    // path+edge key)
    val joinCand = collection.mutable.Map
      .empty[Seq[String], (collection.mutable.Map[String, Long],
        collection.mutable.LinkedHashSet[String],
        collection.mutable.LinkedHashSet[String])] // (qs, groups, edges)
    // histogram-grain candidates: path -> (per-query worst scanTime,
    // union of nominated grain columns across its queries)
    val histCand = collection.mutable.Map.empty[String,
      (collection.mutable.Map[String, Long],
        collection.mutable.LinkedHashSet[String])]
    // rollup candidates: path -> (per-query worst scanTime, union of
    // base grouping columns)
    val rollCand = collection.mutable.Map.empty[String,
      (collection.mutable.Map[String, Long],
        collection.mutable.LinkedHashSet[String])]
    // bucketing candidates: (sorted path set, sorted edge set) ->
    // per-query worst total shuffle dataSize. A join that repeats on
    // the same tables and keys is a WRITE-TIME co-location candidate
    // (Layout.createBucketed) whether or not its aggregates are
    // MV-routable — the lever is orthogonal to the summary family
    val bucketCand = collection.mutable.Map
      .empty[(Seq[String], Seq[String]),
        (collection.mutable.Map[String, Long],
          collection.mutable.LinkedHashSet[String])]
    // partition-clustering candidates: path -> (per-query worst
    // scanned filesSize, per-query DATA-filter column sets). A scan
    // that pushes the same predicate columns in ≥2 distinct queries
    // yet reads the whole table (the predicate is a data filter, not
    // a partition filter — pfilters tells them apart) is a WRITE-TIME
    // clustering candidate: rewrite the table Hive-partitioned on
    // those columns and the predicate prunes directories instead of
    // filtering rows after the full read. The remaining layout lever
    // next to bucketing.
    val partCand = collection.mutable.Map.empty[String,
      (collection.mutable.Map[String, Long],
        collection.mutable.Map[String, Set[String]])]
    // sort-clustering candidates: path -> (per-query worst UNSKIPPED
    // rows, per-query RANGE-filter column sets). Hive partitioning
    // serves repeated EQUALITY predicates on low-NDV columns; a
    // repeated RANGE predicate on a high-NDV column (dates, keys,
    // scores) needs the other layout lever — range-cluster the table
    // (repartitionByRange + sortWithinPartitions) so parquet
    // row-group min/max stats skip everything outside the range. The
    // measured signal is the gap between what the scan EMITS and what
    // the filter above it KEEPS: on a clustered layout the stats
    // already skip and the gap closes, so acting makes the
    // nomination disappear (self-converging, like partitioning's
    // pfilters signal).
    val sortClusterCand = collection.mutable.Map.empty[String,
      (collection.mutable.Map[String, Long],
        collection.mutable.Map[String, Set[String]])]
    // compaction candidates: path -> (per-query worst file count,
    // bytes). The small-files flag has always ridden along in the
    // scan lever's PROSE; this is its machine-readable, actable form
    // (Layout.compact) — one nomination per shattered path, however
    // many queries scan it. Self-converging: the compacted copy's
    // file count drops below the shatter bar.
    val compactCand = collection.mutable.Map.empty[String,
      (collection.mutable.Map[String, Long], Array[Long])]
    // refreshDelta candidates: summary name -> per-query worst
    // compensated-delta bytes. A query that scans a graft_summaries
    // generation AND raw source files in the same plan is a
    // delta-COMPENSATED read (the router's merge(summary,
    // partial-agg(delta)) substrate) — correct, but it re-scans the
    // appended files on EVERY read; when that delta outgrows 1/4 of
    // the summary itself, one Summaries.refreshDelta(name) folds it
    // and reads return to summary-only. This closes the detect →
    // serve-compensated → fold lifecycle without a human watching.
    val refreshCand = collection.mutable.Map.empty[String,
      collection.mutable.Map[String, Long]]
    // summary name -> its registered source leaf paths (canonical),
    // resolved once per advise() call — delta-byte attribution
    val summaryLeaves =
      collection.mutable.Map.empty[String, Seq[String]]
    val summaryNameRx = ".*graft_summaries/([^/]+?)__g\\d+.*".r
    lines.foreach { line =>
      val root =
        try mapper.readTree(line)
        catch { case _: Throwable => null }
      if (root != null && root.path("event").asText("") == "query") {
        val qname = root.path("name").asText("query")
        val ops = root.path("operators")
        var lineHasAgg = false
        var lineHasEquiJoin = false
        var lineHasPercentile = false
        var lineHasGroupingId = false
        var lineShuffleBytes = 0L
        // only exchanges BELOW a join node count toward the bucketing
        // nomination — write-time co-location can delete the join's
        // input shuffles, not an aggregate shuffle above the join, so
        // crediting the whole plan's exchange bytes would overstate
        // the lever. Nodes arrive in pre-order with their depth, so a
        // stack of open join depths marks "inside a join subtree".
        var lineJoinShuffleBytes = 0L
        val joinDepths = collection.mutable.ArrayBuffer.empty[Int]
        // nearest-ancestor Filter for the scan underneath it:
        // pre-order + depth pops keep only open ancestors, so a
        // scan's enclosing Filter is the stack top. Rows are None
        // when the trace line carries no numOutputRows — a missing
        // metric must never read as "kept zero rows" (it would
        // fabricate a maximal nomination); conds are the Filter's
        // own conjuncts, for the subset check below.
        val filterRows = collection.mutable.ArrayBuffer
          .empty[(Int, Option[Long], Set[String])]
        // histogram grain: groups+pvals from PERCENTILE-bearing
        // aggregate nodes only — unrelated aggregates in a
        // multi-aggregate plan must not widen the nominated grain
        val lineGrain = collection.mutable.LinkedHashSet.empty[String]
        val lineBaseGroups = collection.mutable.LinkedHashSet.empty[String]
        val lineJoinEdges = collection.mutable.LinkedHashSet.empty[String]
        val linePaths = collection.mutable.Map.empty[String, Long]
        var lineSummaryName: Option[String] = None
        var lineSummaryBytes = 0L
        var lineDeltaBytes = 0L
        val lineScanFilters =
          collection.mutable.Map.empty[String, Set[String]]
        var i = 0
        while (i < ops.size()) {
          val node = ops.get(i)
          val op = node.path("op").asText("")
          val m = node.path("metrics")
          def metric(k: String): Long = m.path(k).asLong(0L)
          val opAt = s"$op#$i"
          val depth = node.path("depth").asInt(0)
          // leaving a join's subtree: pop every join no longer an
          // ancestor of the current node
          while (joinDepths.nonEmpty && joinDepths.last >= depth)
            joinDepths.remove(joinDepths.length - 1)
          while (filterRows.nonEmpty && filterRows.last._1 >= depth)
            filterRows.remove(filterRows.length - 1)
          if (op.startsWith("Filter")) {
            val rows =
              if (m.has("numOutputRows")) Some(metric("numOutputRows"))
              else None
            val cn = node.path("cond")
            val conds = (0 until cn.size()).map(cn.get(_).asText(""))
              .filter(_.nonEmpty).toSet
            filterRows += ((depth, rows, conds))
          }
          if (op.contains("Exchange") && !op.contains("Broadcast")) {
            val t = metric("shuffleWriteTime") / 1000000L +
              metric("fetchWaitTime")
            val (v, sig, u) =
              if (t > 0) (t, "shuffle write+fetch time", "ms")
              else (metric("dataSize"), "dataSize", "bytes")
            if (v > 0) exchanges += Finding(qname, opAt, sig, v, u,
              "pre-aggregate before the shuffle, shuffle only " +
                "key+payload columns, broadcast the small side, or " +
                "bucket/co-partition both sides")
            lineShuffleBytes += metric("dataSize")
            if (joinDepths.nonEmpty)
              lineJoinShuffleBytes += metric("dataSize")
          } else if (op.startsWith("Scan")) {
            val pth = node.path("path").asText("")
            if (pth.nonEmpty)
              linePaths(pth) = linePaths.getOrElse(pth, 0L) +
                metric("scanTime")
            if (pth.nonEmpty) {
              val fn = node.path("filters")
              val fset = (0 until fn.size()).map(fn.get(_).asText(""))
                .filter(_.nonEmpty).toSet
              lineScanFilters(pth) =
                lineScanFilters.getOrElse(pth, Set.empty) ++ fset
              // partitioning candidate: columns the query FILTERS on
              // but the layout does not prune on (data filters whose
              // columns appear in no partition filter)
              if (!pth.contains("graft_summaries")) {
                val pfn = node.path("pfilters")
                val pfset = (0 until pfn.size())
                  .map(pfn.get(_).asText("")).filter(_.nonEmpty).toSet
                val pcols =
                  filterColumns(pfset.toSeq).getOrElse(Nil).toSet
                // equality conjuncts nominate Hive PARTITIONING (a
                // directory per value — the low-NDV shape); range
                // conjuncts nominate SORT CLUSTERING below (a
                // directory per value would explode on the high-NDV
                // columns ranges run over)
                val dcols = classifiedFilterColumns(
                  (fset -- pfset).toSeq, equality = true)
                  .filterNot(pcols).toSet
                val scanned = metric("filesSize")
                if (dcols.nonEmpty && scanned > 0) {
                  val (qs, qcols) = partCand.getOrElseUpdate(pth,
                    (collection.mutable.Map.empty[String, Long],
                      collection.mutable.Map.empty[String, Set[String]]))
                  qs(qname) = math.max(qs.getOrElse(qname, 0L), scanned)
                  qcols(qname) =
                    qcols.getOrElse(qname, Set.empty) ++ dcols
                }
                // sort-clustering: a pushed RANGE conjunct whose scan
                // still EMITS far more rows than the Filter above
                // KEEPS — row-group stats are not skipping, so the
                // layout is unclustered on the range column
                // the 4x bar: stats skipping is file/row-group
                // grained, so even a perfectly clustered copy reads
                // whole boundary groups (~2-3x a narrow slice) —
                // nominate only when the gap is beyond what
                // clustering itself would leave, or acting would
                // re-nominate forever
                val rcols = classifiedFilterColumns(
                  (fset -- pfset).toSeq, equality = false)
                  .filterNot(pcols).toSet
                val emitted = metric("numOutputRows")
                // "kept" is trustworthy only when the enclosing
                // Filter re-evaluates exactly the PUSHED conjuncts
                // (its conds ⊆ the scan's filters) — a residual
                // non-pushable predicate would conflate its own
                // selectivity with the range's, and clustering could
                // never close that gap (perpetual re-nomination)
                val kept = filterRows.lastOption.collect {
                  case (_, Some(rows), conds)
                      if conds.nonEmpty && conds.subsetOf(fset) =>
                    rows
                }.getOrElse(-1L)
                if (rcols.nonEmpty && emitted > 0 && kept >= 0 &&
                    emitted > 4 * kept) {
                  val (qs, qcols) = sortClusterCand.getOrElseUpdate(pth,
                    (collection.mutable.Map.empty[String, Long],
                      collection.mutable.Map.empty[String, Set[String]]))
                  qs(qname) =
                    math.max(qs.getOrElse(qname, 0L), emitted - kept)
                  qcols(qname) =
                    qcols.getOrElse(qname, Set.empty) ++ rcols
                }
              }
            }
            pth match {
              case summaryNameRx(sn) =>
                lineSummaryName = Some(sn)
                lineSummaryBytes += metric("filesSize")
              case _ if pth.nonEmpty && lineSummaryName.isDefined =>
                // raw files scanned ALONGSIDE a summary generation:
                // the compensated substrate's delta read — but only
                // scans whose path lies UNDER the summary's own
                // registered source leaves count. A query that joins
                // a routed summary with an UNRELATED raw table must
                // not fabricate a refreshDelta nomination from that
                // table's bytes (attribution by ownership, not by
                // plan position; an unresolvable name credits
                // nothing — fail closed, it's advice)
                val owned = lineSummaryName.exists { sn =>
                  val cp = try Summaries.canon(pth)
                    catch { case _: Throwable => pth }
                  summaryLeaves.getOrElseUpdate(sn,
                    Summaries.leafPathsOf(sn))
                    .exists(l => cp == l || cp.startsWith(l + "/"))
                }
                if (owned) lineDeltaBytes += metric("filesSize")
              case _ =>
            }
            val nFiles = metric("numFiles")
            val bytes = metric("filesSize")
            val smallFiles = nFiles >= 16 && bytes > 0 &&
              bytes / nFiles < 4L * 1024 * 1024
            if (smallFiles && pth.nonEmpty &&
                !pth.contains("graft_summaries")) {
              val (qs, meta) = compactCand.getOrElseUpdate(pth,
                (collection.mutable.Map.empty[String, Long],
                  Array(0L, 0L)))
              qs(qname) = math.max(qs.getOrElse(qname, 0L), nFiles)
              meta(0) = math.max(meta(0), nFiles)
              meta(1) = math.max(meta(1), bytes)
            }
            val lever =
              (if (smallFiles)
                 s"$nFiles files averaging ${bytes / nFiles / 1024} KB" +
                   " - compact the table (Layout.compact); then "
               else "") +
                "push predicates / prune columns; partition or " +
                "Z-order by the hot predicate"
            val (v, sig, u) =
              if (metric("scanTime") > 0) (metric("scanTime"), "scanTime", "ms")
              else (bytes, "filesSize", "bytes")
            if (v > 0) scans += Finding(qname, opAt, sig, v, u, lever)
          } else if (op.contains("BroadcastExchange")) {
            val v = metric("dataSize")
            if (v >= broadcastWarnBytes)
              broadcasts += Finding(qname, opAt, "dataSize", v, "bytes",
                "broadcast build near the limit: verify the build " +
                  "side stays dim-sized at scale or switch to a " +
                  "shuffled join")
          } else if (op.contains("CartesianProduct") ||
              op.contains("BroadcastNestedLoopJoin")) {
            loops += Finding(qname, opAt, "numOutputRows",
              metric("numOutputRows"), "rows",
              "non-equality join: rewrite with an equality key " +
                "(banding / blocking) or bound one side")
          } else if (op.startsWith("Sort") && metric("sortTime") > 0) {
            sorts += Finding(qname, opAt, "sortTime",
              metric("sortTime"), "ms",
              "if this sort feeds a sort-merge join: bucket both " +
                "sides on the join key or broadcast the smaller side")
          }
          if (metric("spillSize") > 0)
            spills += Finding(qname, opAt, "spillSize",
              metric("spillSize"), "bytes",
              "partitions outgrow memory: raise " +
                "spark.sql.shuffle.partitions, lower " +
                "files.maxPartitionBytes, or salt the hot keys")
          if (op.contains("Aggregate")) {
            lineHasAgg = true
            // aggregate-shape fields (TraceCapture stamps them on
            // BaseAggregateExec nodes): percentile functions and the
            // rollup/cube grouping-id marker drive the MV nominations
            val aggsNode = node.path("aggs")
            var nodeHasPercentile = false
            var a = 0
            while (a < aggsNode.size()) {
              if (aggsNode.get(a).asText("").startsWith("percentile"))
                nodeHasPercentile = true
              a += 1
            }
            if (nodeHasPercentile) lineHasPercentile = true
            val groupsNode = node.path("groups")
            var g = 0
            while (g < groupsNode.size()) {
              val gn = groupsNode.get(g).asText("")
              if (gn == "spark_grouping_id") lineHasGroupingId = true
              else {
                if (nodeHasPercentile) lineGrain += gn
                lineBaseGroups += gn
              }
              g += 1
            }
            val pvalsNode = node.path("pvals")
            var v = 0
            while (v < pvalsNode.size()) {
              if (nodeHasPercentile)
                lineGrain += pvalsNode.get(v).asText("")
              v += 1
            }
          }
          if (op.contains("Join") && !op.contains("NestedLoop") &&
            !op.contains("Cartesian")) {
            lineHasEquiJoin = true
            val jk = node.path("jkeys")
            var e = 0
            while (e < jk.size()) {
              lineJoinEdges += jk.get(e).asText(""); e += 1
            }
            joinDepths += depth
          }
          i += 1
        }
        // exactly ONE scanned path → single-table summary candidate;
        // exactly TWO + an equi-join → joined-summary candidate. An
        // aggregate over a join can never route onto a single-table
        // summary, so the classes are disjoint by construction.
        if (lineHasAgg && linePaths.size == 1)
          linePaths.foreach { case (pth, t) =>
            val (qs, groups) = sumCand.getOrElseUpdate(pth,
              (collection.mutable.Map.empty[String, Long],
                collection.mutable.LinkedHashSet.empty[String]))
            qs(qname) = math.max(qs.getOrElse(qname, 0L), t)
            groups ++= lineBaseGroups
            val fset = lineScanFilters.getOrElse(pth, Set.empty)
            sumFilters(pth) =
              if (sumFilters.contains(pth)) sumFilters(pth) & fset
              else fset
          }
        if (lineHasAgg && linePaths.size == 1 && lineHasPercentile)
          linePaths.foreach { case (pth, t) =>
            val (qs, grain) = histCand.getOrElseUpdate(pth,
              (collection.mutable.Map.empty[String, Long],
                collection.mutable.LinkedHashSet.empty[String]))
            qs(qname) = math.max(qs.getOrElse(qname, 0L), t)
            grain ++= lineGrain
          }
        if (lineHasAgg && linePaths.size == 1 && lineHasGroupingId)
          linePaths.foreach { case (pth, t) =>
            val (qs, grain) = rollCand.getOrElseUpdate(pth,
              (collection.mutable.Map.empty[String, Long],
                collection.mutable.LinkedHashSet.empty[String]))
            qs(qname) = math.max(qs.getOrElse(qname, 0L), t)
            grain ++= lineBaseGroups
          }
        if (lineHasAgg && lineHasEquiJoin && linePaths.size >= 2) {
          val key = linePaths.keys.toSeq.sorted
          val (qs, groups, edges) = joinCand.getOrElseUpdate(key,
            (collection.mutable.Map.empty[String, Long],
              collection.mutable.LinkedHashSet.empty[String],
              collection.mutable.LinkedHashSet.empty[String]))
          qs(qname) =
            math.max(qs.getOrElse(qname, 0L), linePaths.values.sum)
          groups ++= lineBaseGroups
          edges ++= lineJoinEdges
        }
        // compensated read with a grown delta: nominate the fold once
        // the re-scanned files pass 1/4 of the summary's own size
        lineSummaryName.foreach { sn =>
          if (lineDeltaBytes > 0 && lineDeltaBytes * 4L > lineSummaryBytes) {
            val qs = refreshCand.getOrElseUpdate(sn,
              collection.mutable.Map.empty[String, Long])
            qs(qname) = math.max(qs.getOrElse(qname, 0L), lineDeltaBytes)
          }
        }
        if (lineHasEquiJoin && linePaths.size >= 2 &&
            lineJoinEdges.nonEmpty && lineJoinShuffleBytes > 0) {
          val key = (linePaths.keys.toSeq.sorted,
            lineJoinEdges.toSeq.sorted)
          val (qs, _) = bucketCand.getOrElseUpdate(key,
            (collection.mutable.Map.empty[String, Long],
              collection.mutable.LinkedHashSet.empty[String]))
          qs(qname) =
            math.max(qs.getOrElse(qname, 0L), lineJoinShuffleBytes)
        }
      }
    }
    // a bench traces every query several times — collapse repeated
    // executions of the same (query, operator, signal) to the worst
    // reading before ranking
    def top(b: collection.mutable.ArrayBuffer[Finding]) =
      b.groupBy(f => (f.query, f.op, f.signal))
        .map(_._2.maxBy(_.value)).toSeq
        .sortBy(f => (-f.value, f.query, f.op)).take(topN)
    // summary candidates are already aggregated across the whole
    // trace — rank by breadth (distinct aggregate-bearing queries),
    // then by total scan time
    val summaries = sumCand.toSeq.collect {
      case (pth, (qs, groups)) if qs.size >= 2 =>
        val t = qs.values.sum
        val shared = sumFilters.getOrElse(pth, Set.empty).toSeq.sorted
        Finding(s"${qs.size} queries", s"Scan $pth",
          "aggregate-scanning queries", qs.size, "queries",
          "the same table feeds aggregates in " +
            s"${qs.keys.toSeq.sorted.take(4).mkString(", ")}" +
            (if (qs.size > 4) ", …" else "") +
            s" (total scanTime ${t} ms): if they share a grouping " +
            "grain, register a materialized summary " +
            "(Summaries.create) so they route onto the pre-aggregate" +
            (if (shared.isEmpty) ""
             else " — and EVERY one of them scans the same slice, so " +
               "declare it FILTERED (where = Some(\"" +
               shared.mkString(" AND ") + "\")) and the summary " +
               "builds over only those grain rows"),
          kind = "summary", paths = Seq(pth),
          grain = groups.toSeq.sorted, queries = qs.keys.toSeq.sorted,
          filters = shared)
    }.sortBy(f => (-f.value, f.op)).take(topN)
    val histograms = histCand.toSeq.collect {
      case (pth, (qs, grain)) if qs.size >= 2 =>
        val t = qs.values.sum
        val cols = grain.toSeq.sorted.mkString(", ")
        Finding(s"${qs.size} queries", s"Scan $pth",
          "percentile-scanning queries", qs.size, "queries",
          "percentile aggregates re-scan and re-sort this table in " +
            s"${qs.keys.toSeq.sorted.take(4).mkString(", ")}" +
            (if (qs.size > 4) ", …" else "") +
            s" (total scanTime ${t} ms): register a histogram-grain " +
            s"summary (Summaries.create, grain = ($cols)) — the " +
            "stored count becomes the percentile frequency and every " +
            "percentile/extremum/count walks NDV-sized summary rows",
          kind = "histogram", paths = Seq(pth),
          grain = grain.toSeq.sorted, queries = qs.keys.toSeq.sorted)
    }.toSeq.sortBy(f => (-f.value, f.op)).take(topN)
    val rollups = rollCand.toSeq.collect {
      case (pth, (qs, grain)) if qs.size >= 2 =>
        val t = qs.values.sum
        val cols = grain.toSeq.sorted.mkString(", ")
        Finding(s"${qs.size} queries", s"Scan $pth",
          "rollup/cube-scanning queries", qs.size, "queries",
          "rollup/cube Expands multiply this table's scan by the " +
            "level count in " +
            s"${qs.keys.toSeq.sorted.take(4).mkString(", ")}" +
            (if (qs.size > 4) ", …" else "") +
            s" (total scanTime ${t} ms): register a base-grain " +
            s"summary (Summaries.create, grain = ($cols)) — the " +
            "router slides it under the Expand and each level " +
            "re-aggregates summary rows cnt-weighted",
          kind = "rollup", paths = Seq(pth),
          grain = grain.toSeq.sorted, queries = qs.keys.toSeq.sorted)
    }.toSeq.sortBy(f => (-f.value, f.op)).take(topN)
    val joinSummaries = joinCand.toSeq.collect {
      case (ps, (qs, groups, edges)) if qs.size >= 2 =>
        val t = qs.values.sum
        Finding(s"${qs.size} queries", s"Join ${ps.mkString(" ⋈ ")}",
          "aggregate-join queries", qs.size, "queries",
          s"the same ${ps.size}-table join feeds aggregates in " +
            s"${qs.keys.toSeq.sorted.take(4).mkString(", ")}" +
            (if (qs.size > 4) ", …" else "") +
            s" (total scanTime ${t} ms): if they share a grouping " +
            "grain and join keys, register a joined materialized " +
            "summary (Summaries.createJoined — any INNER equi-join " +
            "star registers) so they route onto the pre-joined " +
            "pre-aggregate",
          kind = "join", paths = ps, grain = groups.toSeq.sorted,
          edges = edges.toSeq.sorted, queries = qs.keys.toSeq.sorted)
    }.sortBy(f => (-f.value, f.op)).take(topN)
    val buckets = bucketCand.toSeq.collect {
      case ((ps, edges), (qs, _)) if qs.size >= 2 =>
        val bytes = qs.values.sum
        Finding(s"${qs.size} queries", s"Join ${ps.mkString(" ⋈ ")}",
          "join-feeding shuffle dataSize", bytes, "bytes",
          s"the same join on (${edges.mkString(", ")}) repeats in " +
            s"${qs.keys.toSeq.sorted.take(4).mkString(", ")}" +
            (if (qs.size > 4) ", …" else "") +
            ": write both sides bucketed on their join keys " +
            "(Layout.createBucketed, matched bucket counts ≈ table " +
            "bytes / target partition bytes) and the join runs with " +
            "no exchange on either side — the shuffle is paid once, " +
            "at write time, instead of per query. A layout change " +
            "for the table owner, not a transparent rewrite: queries " +
            "must read the bucketed tables",
          kind = "bucket", paths = ps, edges = edges,
          queries = qs.keys.toSeq.sorted)
    }.sortBy(f => (-f.value, f.op)).take(topN)
    // rank by the bytes partitioning would stop scanning; the common
    // columns are the INTERSECTION across the nominated queries —
    // a layout serves the whole workload or it thrashes
    val partitions = partCand.toSeq.flatMap {
      case (pth, (qs, qcols)) if qs.size >= 2 =>
        val common = qcols.values.reduceOption(_ & _)
          .getOrElse(Set.empty[String])
        if (common.isEmpty) None
        else {
          val bytes = qs.values.sum
          val cols = common.toSeq.sorted
          Some(Finding(s"${qs.size} queries", s"Scan $pth",
            "filtered-scan filesSize", bytes, "bytes",
            s"${qs.keys.toSeq.sorted.take(4).mkString(", ")}" +
              (if (qs.size > 4) ", …" else "") +
              s" all push a predicate on (${cols.mkString(", ")}) " +
              s"yet the scan reads the full table ($bytes bytes " +
              "across the workload): rewrite it Hive-partitioned on " +
              "those columns (Advisor.actOnPartitioning / " +
              "Layout.partitionByColumns) so the predicate prunes " +
              "directories at planning instead of filtering rows " +
              "after the read — a layout change for the table " +
              "owner; queries must read the partitioned copy",
            kind = "partition", paths = Seq(pth), grain = cols,
            queries = qs.keys.toSeq.sorted))
        }
      case _ => None
    }.sortBy(f => (-f.value, f.op)).take(topN)
    // rank by the rows a clustered layout would stop reading; common
    // columns are the intersection across the nominated queries —
    // one sort order serves the whole workload or it thrashes
    val sortClusters = sortClusterCand.toSeq.flatMap {
      case (pth, (qs, qcols)) if qs.size >= 2 =>
        val common = qcols.values.reduceOption(_ & _)
          .getOrElse(Set.empty[String])
        if (common.isEmpty) None
        else {
          val rows = qs.values.sum
          val cols = common.toSeq.sorted
          // exactly TWO shared range columns → a lexicographic sort
          // serves only its leading column; nominate Z-ORDER instead
          // (bit-interleaved cells make BOTH columns' stats tight)
          val twoD = cols.length == 2
          Some(Finding(s"${qs.size} queries", s"Scan $pth",
            "range-filtered rows read beyond kept", rows, "rows",
            s"${qs.keys.toSeq.sorted.take(4).mkString(", ")}" +
              (if (qs.size > 4) ", …" else "") +
              s" all push a RANGE predicate on (${cols.mkString(", ")})" +
              s" yet the scan emits $rows rows the filter then drops " +
              "(row-group min/max stats cannot skip on a scattered " +
              "layout): rewrite the table " +
              (if (twoD)
                 "Z-ORDER-clustered on the pair " +
                   "(Advisor.actOnZorderClustering / " +
                   "Layout.zorderByColumns) so each file covers a 2-D " +
                   "cell and a box predicate skips everything outside"
               else
                 "range-clustered on those columns " +
                   "(Advisor.actOnSortClustering / " +
                   "Layout.sortByColumns) so pushed range predicates " +
                   "skip whole row groups at read") +
              " — a layout change for the table owner; queries must " +
              "read the clustered copy",
            kind = if (twoD) "zorder-cluster" else "sort-cluster",
            paths = Seq(pth), grain = cols,
            queries = qs.keys.toSeq.sorted))
        }
      case _ => None
    }.sortBy(f => (-f.value, f.op)).take(topN)
    val compactions = compactCand.toSeq.map {
      case (pth, (qs, meta)) =>
        val (nf, bytes) = (meta(0), meta(1))
        Finding(s"${qs.size} quer" + (if (qs.size == 1) "y" else "ies"),
          s"Scan $pth", "shattered-table file count", nf, "files",
          s"$nf files averaging ${bytes / math.max(nf, 1) / 1024} KB " +
            s"scanned by ${qs.keys.toSeq.sorted.take(4).mkString(", ")}" +
            (if (qs.size > 4) ", …" else "") +
            ": per-file open/footer overhead dominates a read this " +
            "shattered — rewrite size-targeted " +
            "(Advisor.actOnCompaction / Layout.compact, ~128 MB " +
            "files) and repoint; at 100 TB the same shatter costs a " +
            "task per tiny file",
          kind = "compact", paths = Seq(pth),
          queries = qs.keys.toSeq.sorted)
    }.sortBy(f => (-f.value, f.op)).take(topN)
    val refreshes = refreshCand.toSeq.map { case (name, qs) =>
      Finding(s"${qs.size} queries", s"Summary $name",
        "compensated-delta bytes", qs.values.sum, "bytes",
        s"reads of '$name' are delta-COMPENSATED in " +
          s"${qs.keys.toSeq.sorted.take(4).mkString(", ")}" +
          (if (qs.size > 4) ", …" else "") +
          " (the routed plan re-scans the appended source files on " +
          "every read) and the delta has outgrown 1/4 of the summary " +
          s"""itself: fold it once — Summaries.refreshDelta("$name") """ +
          "— and reads return to summary-only until the next append",
        kind = "refresh", queries = qs.keys.toSeq.sorted)
    }.sortBy(f => (-f.value, f.op)).take(topN)
    top(spills) ++ top(loops) ++ top(exchanges) ++ top(scans) ++
      top(broadcasts) ++ top(sorts) ++ summaries ++ joinSummaries ++
      histograms ++ rollups ++ buckets ++ partitions ++
      sortClusters ++ compactions ++ refreshes
  }

  /** ACT on an MV nomination: perform the Summaries.create /
    * createJoined call the finding's lever recommends, from its
    * machine-readable payload — the step that closes the profile →
    * advise → CREATE → route loop without a human transcribing the
    * lever text. Measures are not nominated (traces carry grouping
    * references, not full aggregate expression shapes), so the
    * summary registers with the grain and count only: everything the
    * counts-route serves — COUNT / MIN / MAX / integral SUM /
    * DISTINCT / exact percentile over grain columns — routes
    * immediately; declared-measure sums stay raw until a human adds
    * them. Queries whose groupings or filters reach outside the
    * nominated grain also stay raw (fail closed, as ever).
    *
    * For a JOIN nomination the recorded equi-edges rebuild the join:
    * each edge's columns are attributed to their source by schema
    * membership (ambiguous names refuse), and paths attach one at a
    * time along their edges so every edge lands in a join condition.
    * Throws on a finding without an MV payload, on unattributable
    * edges, or on a disconnected edge set — a half-guessed
    * registration that silently serves wrong rows is the one outcome
    * this API must never produce (createJoined re-validates
    * connectivity anyway).
    *
    * COMPRESSION GATE: a grain that is the union of many queries'
    * grouping references can approach ROW grain (a traced id column
    * joins the union and the "summary" is the table again) — routing
    * onto it is correct but wins nothing and, measured, LOSES (a
    * row-grain documents summary routed two queries 1.4–2.0×
    * SLOWER). After building, the summary's row count is checked
    * against the source's: above `maxGrainRatio` the registration is
    * dropped and the call throws — at 100 TB a summary that saves
    * nothing must not silently double storage and capture queries.
    */
  def materialize(spark: org.apache.spark.sql.SparkSession,
      f: Finding, name: String,
      maxGrainRatio: Double = 0.5): Summaries.Spec = {
    require(f.kind.nonEmpty && f.paths.nonEmpty,
      s"finding carries no MV payload: $f")
    require(f.grain.nonEmpty,
      s"nominated grain is empty — nothing to summarize: $f")
    def gated(raw: org.apache.spark.sql.DataFrame,
        build: => Summaries.Spec): Summaries.Spec = {
      val spec = build
      val sRows = spark.read.parquet(spec.summaryPath).count()
      val rRows = raw.count()
      if (rRows > 0 && sRows > maxGrainRatio * rRows) {
        Summaries.drop(name)
        throw new IllegalArgumentException(
          s"nominated grain barely compresses ($sRows summary rows " +
            s"from $rRows source rows > ratio $maxGrainRatio) — " +
            "a summary that saves nothing must not capture queries" +
            (if (f.kind == "histogram")
               ". A percentile grain that fails this gate usually " +
                 "means a near-unique value domain: declare a " +
                 "quantile-sketch measure on the COARSE grain instead " +
                 "(qsks = … / quantile_sketch_est — q189's route)"
             else ""))
      }
      spec
    }
    // a shared-slice nomination upgrades to a FILTERED summary: the
    // conjuncts become the declared WHERE and their referenced
    // columns JOIN THE GRAIN (the router requires query filters over
    // grain columns, so the nominated queries could only route with
    // those columns present). Anything unresolvable drops the WHERE
    // — an unfiltered build is always a correct fallback.
    def whereAndExtraGrain(resolvable: String => Boolean)
        : (Option[String], Seq[String]) =
      if (f.filters.isEmpty) (None, Nil)
      else filterColumns(f.filters) match {
        case Some(cs) if cs.nonEmpty && cs.forall(resolvable) =>
          (Some(f.filters.toSeq.sorted.mkString(" AND ")),
            cs.filterNot(f.grain.contains))
        case _ => (None, Nil)
      }
    f.kind match {
      case "summary" | "histogram" | "rollup" =>
        require(f.paths.length == 1, s"single-table kind, many paths: $f")
        val df = spark.read.parquet(f.paths.head)
        // traced grouping references include PHYSICAL-plan internals
        // (_groupingexpression pre-projections, window/shard aliases)
        // that are not table columns — keep the schema-resolvable
        // subset. Queries grouping on the dropped derived expressions
        // simply fail closed to raw, as the grain gate always does.
        val cols = df.columns.toSet
        val grain = f.grain.filter(cols)
        require(grain.nonEmpty,
          s"no nominated grain column exists in ${f.paths.head}: $f")
        val (whereOpt, extra) = whereAndExtraGrain(cols)
        gated(df, Summaries.create(df, name,
          grain = grain ++ extra.filterNot(grain.contains),
          sums = Nil, where = whereOpt))
      case "join" =>
        require(f.edges.nonEmpty, s"join nomination without edges: $f")
        val dfs = f.paths.map(p => p -> spark.read.parquet(p))
        def ownerOf(colName: String): Int = {
          val owners = dfs.indices
            .filter(i => dfs(i)._2.columns.contains(colName))
          require(owners.length == 1,
            s"column $colName is ${if (owners.isEmpty) "absent from"
              else "ambiguous across"} the nominated tables")
          owners.head
        }
        val edges = f.edges.map { e =>
          val Array(a, b) = e.split("=", 2)
          (ownerOf(a), a, ownerOf(b), b)
        }.filter(t => t._1 != t._3)
        // attach one table at a time along its edges to the joined
        // prefix, so every edge becomes a join condition
        val attached = collection.mutable.Set(0)
        var joined = dfs(0)._2
        var progress = true
        while (attached.size < dfs.length && progress) {
          progress = false
          dfs.indices.filterNot(attached).foreach { i =>
            val mine = edges.filter(t =>
              (t._1 == i && attached(t._3)) ||
                (t._3 == i && attached(t._1)))
            if (mine.nonEmpty) {
              val cond = mine.map { case (_, a, _, b) =>
                org.apache.spark.sql.functions.col(a) ===
                  org.apache.spark.sql.functions.col(b)
              }.reduce(_ && _)
              joined = joined.join(dfs(i)._2, cond)
              attached += i
              progress = true
            }
          }
        }
        require(attached.size == dfs.length,
          s"recorded edges do not connect all nominated tables: $f")
        // same schema-resolvability filter as the single-table kinds,
        // plus unambiguity: a grain column owned by two tables can't
        // be name-mapped (ownerOf would throw) — drop it instead
        val grain = f.grain.filter(c =>
          dfs.count(_._2.columns.contains(c)) == 1)
        require(grain.nonEmpty,
          s"no nominated grain column resolves unambiguously: $f")
        val (whereOpt, extra) = whereAndExtraGrain(c =>
          dfs.count(_._2.columns.contains(c)) == 1)
        gated(joined,
          Summaries.createJoined(joined, name,
            grain = grain ++ extra.filterNot(grain.contains),
            sums = Nil, where = whereOpt))
      case other =>
        throw new IllegalArgumentException(
          s"finding kind '$other' is not materializable")
    }
  }

  /** ACT on a BUCKET nomination: CTAS every nominated table hash-
    * bucketed on its join-key column(s) with MATCHED bucket counts
    * ([[graft.operators.Layout.createBucketed]]), so the repeated
    * join runs with no exchange on either side. Key attribution is by
    * schema membership, exactly like [[materialize]]'s join path —
    * ambiguous or absent columns refuse rather than guess. Returns
    * nominated path → created table name; the CALLER repoints reads
    * (bucketing is a layout change for the table owner, not a
    * transparent rewrite — the lever text says the same).
    */
  def actOnBucketing(spark: org.apache.spark.sql.SparkSession,
      f: Finding, prefix: String, buckets: Int = 8)
      : Map[String, String] = {
    require(f.kind == "bucket", s"not a bucketing nomination: $f")
    require(f.paths.length >= 2 && f.edges.nonEmpty,
      s"bucket nomination without tables/edges: $f")
    val dfs = f.paths.map(p => p -> spark.read.parquet(p))
    def ownerOf(colName: String): Int = {
      val owners = dfs.indices
        .filter(i => dfs(i)._2.columns.contains(colName))
      require(owners.length == 1,
        s"column $colName is ${if (owners.isEmpty) "absent from"
          else "ambiguous across"} the nominated tables")
      owners.head
    }
    val keysByTable = f.edges.flatMap { e =>
      val Array(a, b) = e.split("=", 2)
      Seq(ownerOf(a) -> a, ownerOf(b) -> b)
    }.groupBy(_._1).map { case (i, ks) => i -> ks.map(_._2).distinct }
    require(dfs.indices.forall(keysByTable.contains),
      s"a nominated table carries no join key: $f")
    dfs.indices.map { i =>
      val (path, df) = dfs(i)
      val keys = keysByTable(i)
      val table = s"${prefix}_${new java.io.File(path).getName
        .replaceAll("[^A-Za-z0-9_]", "_")}_$i"
      graft.operators.Layout.dropOrphanLocation(spark, table)
      graft.operators.Layout.createBucketed(
        df, table, buckets, keys.head, sortCols = keys)
      path -> table
    }.toMap
  }

  /** ACT on a PARTITION nomination: rewrite the nominated table
    * Hive-partitioned on the nominated predicate columns
    * ([[graft.operators.Layout.partitionByColumns]]) so every query
    * in the workload prunes directories at planning instead of
    * scanning the full table. A layout change for the table owner —
    * the workload repoints at the returned copy; answers are
    * unchanged (partitioning moves columns into the path, it never
    * drops rows).
    */
  def actOnPartitioning(spark: org.apache.spark.sql.SparkSession,
      f: Finding, outDir: String): String = {
    require(f.kind == "partition", s"not a partitioning nomination: $f")
    require(f.paths.length == 1 && f.grain.nonEmpty,
      s"partition nomination without a table/columns: $f")
    graft.operators.Layout.partitionByColumns(
      spark, f.paths.head, outDir, f.grain)
  }

  /** ACT on a SORT-CLUSTER nomination: rewrite the nominated table
    * range-clustered on the nominated range-predicate columns
    * ([[graft.operators.Layout.sortByColumns]]) so parquet row-group
    * min/max stats skip everything outside a pushed range. The
    * high-NDV complement to [[actOnPartitioning]]; answers unchanged
    * (a sort moves rows between files, it never drops or retypes
    * them). The workload repoints at the returned copy; the re-traced
    * nomination disappears because the scan now emits ≈ what the
    * filter keeps.
    */
  def actOnSortClustering(spark: org.apache.spark.sql.SparkSession,
      f: Finding, outDir: String): String = {
    require(f.kind == "sort-cluster",
      s"not a sort-clustering nomination: $f")
    require(f.paths.length == 1 && f.grain.nonEmpty,
      s"sort-cluster nomination without a table/columns: $f")
    graft.operators.Layout.sortByColumns(
      spark, f.paths.head, outDir, f.grain)
  }

  /** ACT on a ZORDER-CLUSTER nomination (exactly two shared range
    * columns): rewrite the nominated table z-order-clustered
    * ([[graft.operators.Layout.zorderByColumns]]) so a 2-D box
    * predicate skips every file outside its cells — where a
    * lexicographic sort would serve only the leading column.
    * `files` sets the cell-grid resolution explicitly (tests);
    * 0 derives it from size.
    */
  def actOnZorderClustering(spark: org.apache.spark.sql.SparkSession,
      f: Finding, outDir: String, files: Int = 0): String = {
    require(f.kind == "zorder-cluster",
      s"not a zorder-clustering nomination: $f")
    require(f.paths.length == 1 && f.grain.length == 2,
      s"zorder nomination without a table/column pair: $f")
    graft.operators.Layout.zorderByColumns(
      spark, f.paths.head, outDir, f.grain, files)
  }

  /** ACT on a COMPACT nomination: rewrite the shattered table
    * size-targeted ([[graft.operators.Layout.compact]], preserving a
    * Hive-partitioned tree) and return the copy's path. Answers
    * unchanged; the re-traced scan drops below the shatter bar, so
    * the nomination disappears.
    */
  def actOnCompaction(spark: org.apache.spark.sql.SparkSession,
      f: Finding, outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): String = {
    require(f.kind == "compact", s"not a compaction nomination: $f")
    require(f.paths.length == 1,
      s"compaction nomination without a table: $f")
    graft.operators.Layout.compact(spark, f.paths.head, outDir,
      targetFileBytes)
    outDir
  }

  /** Single-part column names of conjuncts of ONE comparison shape:
    * `equality = true` keeps `=` / `<=>` / `IN` conjuncts (the Hive-
    * partitioning lever — a directory per value wants low NDV);
    * `equality = false` keeps `<` / `<=` / `>` / `>=` (the
    * sort-clustering lever — ranges run over high-NDV columns).
    * Unparsable or other-shaped conjuncts contribute nothing (this
    * feeds advice, not answers).
    */
  private def classifiedFilterColumns(filters: Seq[String],
      equality: Boolean): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe,
      EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In,
      LessThan, LessThanOrEqual}
    filters.flatMap { f =>
      val parsed =
        try Some(org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseExpression(f))
        catch { case scala.util.control.NonFatal(_) => None }
      def attr(x: Expression): Option[String] = x match {
        case u: org.apache.spark.sql.catalyst.analysis
              .UnresolvedAttribute if u.nameParts.length == 1 =>
          Some(u.nameParts.head)
        case _ => None
      }
      parsed.toSeq.flatMap { ex =>
        val sides: Seq[Expression] = ex match {
          case EqualTo(a, b) if equality => Seq(a, b)
          case EqualNullSafe(a, b) if equality => Seq(a, b)
          case In(a, _) if equality => Seq(a)
          case GreaterThan(a, b) if !equality => Seq(a, b)
          case GreaterThanOrEqual(a, b) if !equality => Seq(a, b)
          case LessThan(a, b) if !equality => Seq(a, b)
          case LessThanOrEqual(a, b) if !equality => Seq(a, b)
          case _ => Nil
        }
        sides.flatMap(attr)
      }
    }.distinct
  }

  /** The single-part column names a set of filter-conjunct SQLs
    * references; None when any conjunct fails to parse. */
  private def filterColumns(filters: Seq[String]): Option[Seq[String]] =
    try {
      Some(filters.flatMap { f =>
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseExpression(f).collect {
            case u: org.apache.spark.sql.catalyst.analysis
                  .UnresolvedAttribute if u.nameParts.length == 1 =>
              u.nameParts.head
          }
      }.distinct)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Render findings as aligned report lines (one per finding). */
  def report(findings: Seq[Finding]): String =
    if (findings.isEmpty) "no findings — nothing spilled, looped, or dominated"
    else findings.map(f =>
      f"${f.query}%-28s ${f.op}%-26s ${f.signal}=${f.value} ${f.unit}%-5s -> ${f.lever}")
      .mkString("\n")

  /** CLI: `runMain graft.plans.Advisor <trace.jsonl> [topN]` — print
    * the report for a captured trace file (e.g. the bench's
    * SPARK_GRAFT_TRACE output).
    */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Advisor <trace.jsonl> [topN]")
    val topN = if (args.length > 1) args(1).toInt else 5
    val src = scala.io.Source.fromFile(args(0))
    try println(report(advise(src.getLines(), topN)))
    finally src.close()
  }
}
