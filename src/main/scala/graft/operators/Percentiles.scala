package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Exact per-group percentiles WITHOUT per-group value lists — the
  * scale path for what `percentile()` (q35) computes by shuffling a
  * collect-list state per group, which is exactly what dies first on
  * a 100 TB fact table.
  *
  * Shape (the classic counts-and-ranks selection):
  *  1. ONE corpus scan melts every measure column into (group,
  *     measure, fixed-point value) and reduces to a count table —
  *     values are fixed-point (money is cents, quantities are
  *     units), so this table is bounded by NDV·groups·measures, not
  *     rows, and the aggregate is map-side combinable;
  *  2. a sharded two-pass prefix sum ([[PrefixSum]]) over the count
  *     table ordered by (stripe, value) — no corpus-wide window, no
  *     single-partition cumsum; per-stripe ranks come off the global
  *     cumsum by subtracting each stripe's starting offset;
  *  3. each percentile target becomes ≤ 2 (stripe, position, weight)
  *     probe rows — a stripes×targets-sized broadcast joined against
  *     the count table's [start, cum] rank ranges, so selection is
  *     one scan of the NDV table;
  *  4. linear interpolation = the weighted two-row sum, matching
  *     `quantile_cont` arithmetic to well under the 4dp rounding.
  *
  * The stripe list ((group, measure) combos) is collected once to
  * index stripes (parameter-scale: percentile reports group by
  * low-cardinality dimensions); value NDV per stripe is unbounded —
  * that side never leaves the cluster.
  *
  * Crossover note: the win is counts ≪ rows. A fixed-point domain
  * CAPS the counts table — cents stay ≤ ~10^7 distinct whether the
  * fact table has 10^6 or 10^12 rows — so at 100 TB even a money
  * measure reduces ~10,000×. But on a corpus SMALLER than its value
  * domain (e.g. 600k rows of near-unique cents at sf0.1) the
  * "counts" table is the data and the machinery only adds overhead —
  * there, `percentile()` (small groups), `percentile_approx`
  * (sketch), or a sort-based selection is the right tool. The
  * bench query therefore reports bounded-NDV measures; the price
  * path is spec-tested for exactness, not benched.
  */
object Percentiles {

  /** One percentile measure: a tagged value column with its
    * fixed-point scale and the (name, fraction) targets to report.
    */
  case class Measure(tag: String, value: Column, scale: Long,
      targets: Seq[(String, Double)])

  /** Physical route for an exact per-group percentile: the NDV-sized
    * counts machinery ([[percentilesByGroupMulti]]), the classic
    * per-group value-list aggregate (`percentile()`), or histogram
    * range-narrowing selection ([[selectionPercentiles]]).
    */
  sealed trait PercentileRoute
  case object CountsRoute extends PercentileRoute
  case object ValueListRoute extends PercentileRoute
  case object SelectionRoute extends PercentileRoute

  /** The crossover decisions, made from data statistics rather than
    * by hand — the SCALE.md crossover, previously hard-coded per
    * query; routing it from an estimate is the cardinality-estimator
    * north star making a physical-plan call.
    *
    *  - NDV · crossoverRatio ≤ rows → COUNTS: the fixed-point domain
    *    is far smaller than the corpus, so the counts table still
    *    reduces ≥ ratio× and its state is NDV-sized, map-side
    *    combinable — the 100 TB plan.
    *  - else rows ≤ listRowLimit → VALUE LIST: the corpus is small
    *    enough that a per-group `percentile()` list fits one task
    *    comfortably and nothing beats a single aggregate.
    *  - else → SELECTION: near-unique domain over a corpus too big
    *    for per-group lists — iterative histogram narrowing finds the
    *    ranked values with bounded-fanout passes (no row-sized
    *    aggregation state anywhere).
    */
  def chooseRoute(rows: Long, ndvEstimate: Long,
      crossoverRatio: Long = 8L,
      listRowLimit: Long = 100000L): PercentileRoute =
    // division compare — the product overflows long at estimator
    // scale (ndv ~1e11 × ratio) and a wrapped-negative product would
    // route a huge counts table down the wrong path
    if (ndvEstimate <= rows / crossoverRatio) CountsRoute
    else if (rows <= listRowLimit) ValueListRoute
    else SelectionRoute

  /** Per-measure route decisions from ONE cheap estimation aggregate:
    * `count(*)` plus an HLL NDV sketch of each measure's fixed-point
    * domain (the same mergeable-sketch estimate GraftAnalyze
    * publishes). `ndvHints` short-circuits the sketch for measures
    * whose NDV is already known (an ANALYZE'd column, a domain bound
    * like "cents of a capped price") — with every measure hinted the
    * estimation scan reads no measure bytes at all.
    */
  /** Estimation-pass output per measure: the corpus row count, the
    * measure's HLL NDV estimate, and its max fixed-point value (the
    * selection route's initial domain bound).
    */
  case class MeasureStats(rows: Long, ndv: Long, maxQ: Long,
      grps: Long = 1L)

  /** ONE cheap estimation aggregate for all measures: `count(*)` plus
    * an HLL NDV sketch and max of each measure's fixed-point domain
    * (the same mergeable-sketch estimates GraftAnalyze publishes).
    * `ndvHints` short-circuits the sketch for measures whose NDV is
    * already known (an ANALYZE'd column, a domain bound like "cents of
    * a capped price").
    */
  def estimateStats(df: DataFrame, measures: Seq[Measure],
      ndvHints: Map[String, Long] = Map.empty,
      groupCol: Option[String] = None,
      maxQHints: Map[String, Long] = Map.empty)
      : Map[String, MeasureStats] = {
    require(measures.nonEmpty, "at least one measure")
    // fully-hinted measures (an ANALYZE'd column, a domain bound like
    // "units ≤ 50" or "cents of a capped price") contribute NO
    // aggregate — with every measure hinted the estimation pass reads
    // no measure bytes at all (count(*) answers from footer metadata,
    // the group column from its dictionary pages). A maxQ hint only
    // sets the selection route's initial bucket width, so a loose
    // bound costs narrowing passes, never correctness.
    val aggs = (count(lit(1)).as("__rows") +:
      groupCol.map(g =>
        approx_count_distinct(col(g)).as("__grps")).toSeq) ++
      measures.flatMap { m =>
        val q = round(m.value * m.scale).cast("long")
        val ndv =
          if (ndvHints.contains(m.tag)) Nil
          else Seq(approx_count_distinct(q).as(s"__ndv_${m.tag}"))
        val mx =
          if (maxQHints.contains(m.tag)) Nil
          else Seq(coalesce(max(q), lit(0L)).as(s"__max_${m.tag}"))
        ndv ++ mx
      }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val rows = r.getLong(0)
    val grps = groupCol.map(_ => r.getLong(r.fieldIndex("__grps")))
      .getOrElse(1L)
    measures.map { m =>
      val ndv = ndvHints.getOrElse(m.tag,
        r.getLong(r.fieldIndex(s"__ndv_${m.tag}")))
      val mx = maxQHints.getOrElse(m.tag,
        r.getLong(r.fieldIndex(s"__max_${m.tag}")))
      m.tag -> MeasureStats(rows, ndv, mx, grps)
    }.toMap
  }

  /** Per-measure route decisions from the [[estimateStats]] pass. */
  def routeMeasures(df: DataFrame, measures: Seq[Measure],
      ndvHints: Map[String, Long] = Map.empty,
      crossoverRatio: Long = 8L,
      listRowLimit: Long = 100000L): Map[String, PercentileRoute] =
    estimateStats(df, measures, ndvHints).map { case (tag, s) =>
      tag -> chooseRoute(s.rows, s.ndv, crossoverRatio, listRowLimit)
    }

  /** The column NAME a measure reads, when it is a plain column
    * reference (what catalog statistics are keyed by); None for
    * computed measures, which fall back to the estimation scan.
    */
  private def attrName(c: Column): Option[String] =
    org.apache.spark.sql.GraftColumnBridge.simpleAttrName(c)

  /** [[MeasureStats]] for every measure straight from PERSISTED
    * catalog statistics — ZERO jobs, the estimator-ANALYZE'd fast
    * path ([[graft.plans.GraftAnalyze]]). Resolves when `df` is a
    * single-directory parquet load (the Tables.load shape), every
    * measure is a plain column reference whose stat carries NDV and a
    * numeric max, and the group column's NDV is known; with
    * `autoAnalyze` the first call on an un-analyzed table pays ONE
    * sketch scan (GraftAnalyze persists the result for the session)
    * and every later routed query on that table plans for free.
    *
    * The catalog NDV is of the RAW column where the estimation scan
    * sketches the QUANTIZED domain — raw ≥ quantized, so routing from
    * catalog stats can only deflect a borderline measure from the
    * counts route toward selection (a conservative, never-wrong
    * direction: selection survives any NDV).
    */
  private[graft] def statsFromCatalog(df: DataFrame,
      measures: Seq[Measure], groupCol: String,
      autoAnalyze: Boolean = true): Option[Map[String, MeasureStats]] = {
    val named = measures.flatMap(m => attrName(m.value).map(m.tag -> _))
    if (named.size != measures.size) return None
    val needed = (groupCol +: named.map(_._2)).distinct
    val stats =
      if (autoAnalyze) graft.plans.GraftAnalyze.ensureAnalyzed(df, needed)
      else graft.plans.GraftAnalyze.statsForFrame(df)
    stats.flatMap { s =>
      val byTag = named.toMap
      val resolved = for {
        rows <- s.rowCount.map(_.toLong)
        grps <- s.colStats.get(groupCol).flatMap(_.distinctCount)
          .map(_.toLong)
        per <- traverse(measures) { m =>
          for {
            cs <- s.colStats.get(byTag(m.tag))
            ndv <- cs.distinctCount.map(_.toLong)
            mx <- cs.max.flatMap(v => scala.util.Try(v.toDouble).toOption)
          } yield m.tag -> MeasureStats(rows, ndv,
            math.round(mx * m.scale), grps)
        }
      } yield per.toMap
      resolved
    }
  }

  private def traverse[A, B](xs: Seq[A])(f: A => Option[B])
      : Option[Seq[B]] = {
    val out = xs.map(f)
    if (out.forall(_.isDefined)) Some(out.map(_.get)) else None
  }

  /** Estimator-ROUTED exact percentiles: measures whose estimated
    * fixed-point NDV sits below the crossover run through the
    * NDV-sized counts machinery; the rest run as per-group
    * `percentile()` value lists — per MEASURE, from one estimation
    * pass, so a bounded-domain measure (units, permille) and a
    * near-unique one (cents over a small corpus) in the same report
    * each get the plan that survives their shape. Both routes
    * interpolate on the same quantized grid ((1−f)·lo + f·hi over
    * round(v·scale) integers), so the answer is route-invariant and
    * any SQL oracle replays it with `quantile_cont` on the same
    * integers. Returns (grp, target, result).
    */
  def percentilesByGroupRouted(df: DataFrame, groupCol: String,
      measures: Seq[Measure], ndvHints: Map[String, Long] = Map.empty,
      crossoverRatio: Long = 8L,
      listRowLimit: Long = 100000L): DataFrame = {
    val spark = df.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        percentilesByGroupRoutedRows(df, groupCol, measures, ndvHints,
          crossoverRatio, listRowLimit), 1))
      .toDF("grp", "target", "result")
  }

  /** [[percentilesByGroupRouted]] returning the report as LOCAL rows —
    * the report is groups×targets-sized by contract, and callers that
    * reshape it (pivot to wide, fence arithmetic) can do so on the
    * driver instead of spending Spark jobs on a dozen rows.
    */
  def percentilesByGroupRoutedRows(df: DataFrame, groupCol: String,
      measures: Seq[Measure], ndvHints: Map[String, Long] = Map.empty,
      crossoverRatio: Long = 8L,
      listRowLimit: Long = 100000L,
      maxQHints: Map[String, Long] = Map.empty,
      statsOverride: Option[Map[String, MeasureStats]] = None)
      : Seq[(String, String, Double)] = {
    val spark = df.sparkSession
    // ONE narrow quantized projection feeds the estimation aggregate
    // AND whichever route(s) run — the source is scanned once, not
    // once per phase. If the caller already cached df, its cache backs
    // the projection and no second copy is made.
    val proj = df.select(
      col(groupCol).cast("string").as("__grp") +:
        measures.map(m =>
          round(m.value * m.scale).cast("long").as(s"__q_${m.tag}")): _*)
    val callerCached = df.storageLevel != org.apache.spark.storage
      .StorageLevel.NONE
    // plan from persisted ANALYZE stats when the source is an
    // analyzed table (ZERO estimation jobs — the estimator's catalog
    // half steering the route); the estimation aggregate is the
    // fallback for derived frames and computed measures. Hints beat
    // both (caller-known domain bounds cost nothing).
    // callers whose measure derives INJECTIVELY from an analyzed raw
    // column (e.g. integer cents = round(price·100)) pass the raw
    // column's catalog statistics re-keyed to the derived measure via
    // `statsOverride` — routing then costs zero jobs even though the
    // frame itself is derived and the catalog cannot see it
    val catalogStats = statsOverride
      .orElse(statsFromCatalog(df, measures, groupCol))
    // the projection persists only for DERIVED frames (catalog stats
    // unresolvable — computed measures, filtered/joined sources):
    // there each phase would re-run the derivation. A plain analyzed
    // table load re-reads as a column-pruned parquet scan per phase —
    // at 100 TB that is strictly better than materializing a
    // corpus-sized cache nobody needs a third time.
    val src = if (callerCached || catalogStats.isDefined) proj
      else proj.persist()
    // re-derive each measure off its quantized column: q/scale is a
    // double whose round(·scale) recovers exactly q (|q| ≤ 2^40 ≪
    // 2^52), so every route sees bit-identical fixed-point values
    val adjusted = measures.map(m =>
      m.copy(value = col(s"__q_${m.tag}").cast("double") / m.scale))
    val stats = catalogStats
      .map(_.map { case (tag, s) => tag -> s.copy(
        ndv = ndvHints.getOrElse(tag, s.ndv),
        maxQ = maxQHints.getOrElse(tag, s.maxQ)) })
      .getOrElse(estimateStats(src, adjusted, ndvHints, Some("__grp"),
        maxQHints))
    val routes = stats.map { case (tag, s) =>
      tag -> chooseRoute(s.rows, s.ndv, crossoverRatio, listRowLimit)
    }
    // the report contract is dimension-scale groups: the output
    // itself (groups × targets), the counts route's stripe index, and
    // the selection route's histograms ALL land on the driver sized
    // by the group count — fail loud past the budget rather than
    // collecting an unbounded report (the estimate errs by HLL
    // accuracy, ~2%; the budget has 10× slack over any sane report)
    val grpsEst = stats.values.headOption.map(_.grps).getOrElse(1L)
    require(grpsEst <= 65536L,
      s"~$grpsEst distinct groups in '$groupCol' — the routed " +
        "percentile report is dimension-scale by contract (<= 65536 " +
        "groups); bucket or aggregate the group column first")
    // the counts route splits on a second statistic: when the whole
    // counts table is estimated report-sized (groups × NDV ≤ 64k —
    // a bounded domain like units at ANY corpus size), it rides the
    // selection machinery with EXACT width-1 histograms (the
    // vocab-table pattern: the histogram IS the counts table, every
    // rank resolves on the driver with no further pass); the sharded
    // prefix-sum machinery is for counts tables too big to collect
    // but still ≪ rows. Exact-counts and narrowing measures SHARE
    // one histogram job.
    val (driverM, multiM) = adjusted
      .filter(m => routes(m.tag) == CountsRoute)
      // division compare: grps × ndv overflows long at estimator scale
      .partition { m =>
        val s = stats(m.tag)
        s.ndv == 0L || s.grps <= 65536L / s.ndv
      }
    val listM = adjusted.filter(m => routes(m.tag) == ValueListRoute)
    // the selection route's pass-1 histogram (and each probe round)
    // collects groups × fanout (4096) rows per measure — cap that
    // driver load like the 65536 exact-counts cap above: past ~256
    // groups a selection measure falls back to the sharded counts
    // machinery, whose driver state is the groups-sized stripe index
    // (already bounded by the report-budget require)
    val (selM, selOverBudget) = adjusted
      .filter(m => routes(m.tag) == SelectionRoute)
      .partition(m => stats(m.tag).grps <= (1L << 20) / 4096L)
    val histItems =
      driverM.map(m => SelItem(m, s"__q_${m.tag}", stats(m.tag).maxQ,
        exactCounts = true)) ++
      selM.map(m => SelItem(m, s"__q_${m.tag}", stats(m.tag).maxQ))
    val shardedM = multiM ++ selOverBudget
    // each part lands as local (grp, target, result) rows — the report
    // is groups×targets-sized, so the projection cache can release
    // deterministically before returning (finally: a failed route
    // must not leak the corpus-sized projection for the session)
    try {
      (if (histItems.nonEmpty)
        selectionPercentiles(src, "__grp", histItems)
      else Nil) ++
      (if (shardedM.nonEmpty)
        percentilesByGroupMulti(src, "__grp", shardedM).collect().toSeq
          .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      else Nil) ++
      (if (listM.nonEmpty)
        valueListPercentiles(src, "__grp", listM).collect().toSeq
          // an all-NULL group aggregates to a NULL percentile here;
          // the counts/selection routes omit such groups (their melts
          // filter NULLs) — drop the row so every route agrees
          .filter(r => !r.isNullAt(2))
          .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      else Nil)
    } finally {
      if (!callerCached && catalogStats.isEmpty) src.unpersist(false)
    }
  }

  /** Spark's `round(double, 4)` semantics on the driver
    * (BigDecimal.valueOf → HALF_UP), so driver-side report assembly
    * rounds bit-identically to the in-plan spelling.
    */
  private[graft] def round4(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** (grp, tag, q) melt of tagged quantized columns — a plain
    * projection for one measure, a per-row explode only when several
    * measures genuinely share the scan.
    */
  private def meltTagged(df: DataFrame, groupCol: String,
      items: Seq[(String, String)]): DataFrame = {
    val melted = items match {
      case Seq((tag, qcol)) =>
        df.select(col(groupCol).as("grp"), lit(tag).as("tag"),
          col(qcol).as("q"))
      case _ =>
        df.select(col(groupCol).as("grp"),
            explode(array(items.map { case (tag, qcol) =>
              struct(lit(tag).as("tag"), col(qcol).as("q"))
            }: _*)).as("m"))
          .select(col("grp"), col("m.tag").as("tag"), col("m.q").as("q"))
    }
    melted.filter(col("q").isNotNull)
  }

  /** One histogram-machinery measure: the measure over its quantized
    * column `qcol`, the estimation pass's maxQ, and `exactCounts` —
    * true when groups × NDV is report-sized so the histogram runs at
    * width 1 (the histogram IS the exact counts table — the
    * vocab-table pattern — and every rank resolves on the driver with
    * no further pass).
    */
  private[graft] case class SelItem(m: Measure, qcol: String,
      maxQ: Long, exactCounts: Boolean = false)

  /** Exact per-group percentiles for NEAR-UNIQUE fixed-point domains
    * via iterative histogram RANGE NARROWING — distributed
    * quickselect. Where the value-list route ships every row of a
    * group into one aggregation state and the counts route
    * materializes the full NDV table, this route never holds more
    * than `fanout` buckets of state anywhere:
    *
    *  1. one histogram pass buckets each measure's domain
    *     [0, maxQ] into ≤ `fanout` width-w stripes (integer `DIV` —
    *     double division can misbucket at wide widths) and counts
    *     per (group, measure, bucket) — a map-side-combinable
    *     aggregate whose result (groups × measures × fanout rows)
    *     collects to the driver;
    *  2. the driver turns each percentile target into its ≤ 2 global
    *     0-based ranks (r = f·(n−1); value ranks ⌊r⌋ and ⌊r⌋+1 when
    *     fractional — `percentile`/`quantile_cont` arithmetic) and
    *     walks the cumulative histogram to the bucket holding each
    *     rank, leaving a rank-within-bucket remainder;
    *  3. while any probe's bucket is wider than `fanout` values, a
    *     further histogram pass re-buckets JUST the probed ranges
    *     (rows join a broadcast probe table) — each pass divides the
    *     range by `fanout`, so ⌈log_fanout(domain)⌉ passes total
    *     (one for any domain ≤ fanout², e.g. all money);
    *  4. one final pass collects the ≤ fanout distinct values of each
    *     probed bucket with counts; the driver walks them to the
    *     ranked value and interpolates (the same weighted two-term
    *     sum as the counts route, over the same quantized grid).
    *
    * At 100 TB: every pass is one scan + a fanout-bounded shuffle; the
    * driver holds histograms, never data. `exactCounts` measures ride
    * the SAME pass-1 job at width 1 — their ranks resolve from the
    * histogram directly, adding no passes of their own. Returns local
    * (grp, target, result) rows — selection output is report-sized by
    * construction.
    */
  private[graft] def selectionPercentiles(df: DataFrame,
      groupCol: String, items: Seq[SelItem],
      fanout: Int = 4096): Seq[(String, String, Double)] = {
    val spark = df.sparkSession
    import spark.implicits._
    // melt to (grp, tag, q): integer q straight off the quantized
    // column, bucket arithmetic in exact long DIV
    val melted = meltTagged(df, groupCol,
      items.map(it => (it.m.tag, it.qcol)))

    def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

    // pass 1: full-domain histogram — width 1 for exact-counts
    // measures (their buckets ARE the values), domain/fanout otherwise.
    // Bucket arithmetic (q DIV w, range [0, maxQ]) assumes the
    // Measure contract's non-negative fixed-point domain — a negative
    // q would truncate toward zero and misbucket, so fail loud.
    require(items.forall(_.maxQ >= 0L),
      "selection percentiles need a non-negative fixed-point domain")
    val width0 = items.map { it =>
      it.m.tag -> (if (it.exactCounts) 1L
        else math.max(1L, ceilDiv(it.maxQ + 1, fanout)))
    }.toMap
    val widthExpr = items.map { it =>
      (col("tag") === it.m.tag, lit(width0(it.m.tag)))
    }.foldRight(lit(1L)) { case ((c, w), acc) => when(c, w).otherwise(acc) }
    val hist1 = melted
      .withColumn("w", widthExpr)
      .select(col("grp"), col("tag"), expr("q DIV w").as("b"))
      .groupBy("grp", "tag", "b").agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2).sortBy(_._1)
      }

    // negative values would have truncated toward bucket zero above —
    // the histogram shows them as negative bucket ids, so the
    // contract violation is caught here, not as a wrong percentile
    require(hist1.values.forall(_.forall(_._1 >= 0L)),
      "selection percentiles saw negative fixed-point values — " +
        "the Measure contract requires a non-negative domain")

    // driver: per (grp, tag) → the 0-based global ranks each target
    // needs, then locate each rank's bucket in the cumulative walk
    case class Probe(grp: String, tag: String, lo: Long, hi: Long,
        rankWithin: Long)
    val byTag = items.map(it => it.m.tag -> it.m).toMap
    // per (grp, tag): target name → (rank0, frac); ranks deduped into
    // probes, probed values keyed back by (grp, tag, globalRank)
    val wants = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String, Long, Double, Int)]
    // (grp, tag, target, globalRank, weight, termIdx)
    val rankSet = scala.collection.mutable.LinkedHashMap
      .empty[(String, String, Long), Unit]
    for (((grp, tag), buckets) <- hist1) {
      val n = buckets.map(_._2).sum
      for ((name, f) <- byTag(tag).targets) {
        val r = f * (n - 1)
        val lo0 = math.floor(r).toLong
        val frac = r - lo0
        wants += ((grp, tag, name, lo0, 1.0 - frac, 0))
        rankSet.update((grp, tag, lo0), ())
        if (frac > 0) {
          wants += ((grp, tag, name, lo0 + 1, frac, 1))
          rankSet.update((grp, tag, lo0 + 1), ())
        }
      }
    }
    // locate each wanted rank's bucket: cumulative walk over the
    // sorted bucket list (ranks are 0-based: bucket holds ranks
    // [cumBefore, cumBefore + cnt)). Width-1 buckets RESOLVE here —
    // the bucket id is the value — so exact-counts measures (and any
    // probe landing on a single-value bucket) never reach the later
    // passes.
    val resolved = scala.collection.mutable.Map
      .empty[(String, String, Long), Long]
    var probes = rankSet.keys.toSeq.flatMap { case (grp, tag, rank) =>
      val buckets = hist1((grp, tag))
      var cum = 0L
      var found: Probe = null
      val w = width0(tag)
      for ((b, cnt) <- buckets if found == null) {
        if (rank < cum + cnt) found =
          Probe(grp, tag, b * w, b * w + w, rank - cum)
        cum += cnt
      }
      require(found != null, s"rank $rank beyond group size $cum")
      if (found.hi - found.lo == 1) {
        resolved((grp, tag, rank)) = found.lo
        None
      } else Some(((grp, tag, rank), found))
    }

    // narrowing rounds: re-histogram just the probed ranges until
    // every probe's range is ≤ fanout values wide
    while (probes.exists { case (_, p) => p.hi - p.lo > fanout }) {
      val probeDf = probes.zipWithIndex.map { case ((_, p), i) =>
        (i, p.grp, p.tag, p.lo, p.hi,
          math.max(1L, ceilDiv(p.hi - p.lo, fanout)))
      }.toDF("pid", "pgrp", "ptag", "plo", "phi", "pw")
      val h = melted.join(broadcast(probeDf),
          col("grp") === col("pgrp") && col("tag") === col("ptag") &&
            col("q") >= col("plo") && col("q") < col("phi"))
        .select(col("pid"), expr("(q - plo) DIV pw").as("b"))
        .groupBy("pid", "b").agg(count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sortBy(_._1) }
      probes = probes.zipWithIndex.map { case ((key, p), i) =>
        if (p.hi - p.lo <= fanout) (key, p)
        else {
          val w = math.max(1L, ceilDiv(p.hi - p.lo, fanout))
          var cum = 0L
          var np: Probe = null
          for ((b, cnt) <- h(i) if np == null) {
            if (p.rankWithin < cum + cnt) np = Probe(p.grp, p.tag,
              p.lo + b * w, math.min(p.hi, p.lo + b * w + w),
              p.rankWithin - cum)
            cum += cnt
          }
          require(np != null, s"narrowing lost rank for $key")
          (key, np)
        }
      }
    }

    // final pass (skipped entirely when every rank already resolved
    // from width-1 buckets): distinct values + counts inside each
    // probed range (≤ fanout distinct values per probe), then a
    // driver walk to the ranked value
    if (probes.nonEmpty) {
      val probeDf = probes.zipWithIndex.map { case ((_, p), i) =>
        (i, p.grp, p.tag, p.lo, p.hi)
      }.toDF("pid", "pgrp", "ptag", "plo", "phi")
      val vals = melted.join(broadcast(probeDf),
          col("grp") === col("pgrp") && col("tag") === col("ptag") &&
            col("q") >= col("plo") && col("q") < col("phi"))
        .groupBy("pid", "q").agg(count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sortBy(_._1) }
      for (((key, p), i) <- probes.zipWithIndex) {
        var cum = 0L
        var v = Option.empty[Long]
        for ((q, cnt) <- vals(i) if v.isEmpty) {
          if (p.rankWithin < cum + cnt) v = Some(q)
          cum += cnt
        }
        require(v.isDefined, s"final walk lost rank for $key")
        resolved(key) = v.get
      }
    }
    val valueAt = resolved

    // assemble targets: the same weighted two-term interpolation sum
    // the counts route computes, over the same quantized grid
    wants.groupBy(w => (w._1, w._2, w._3)).toSeq.map {
      case ((grp, tag, name), terms) =>
        val scale = byTag(tag).scale
        val res = terms.sortBy(_._6).map { case (_, _, _, rank, wt, _) =>
          if (wt > 0) wt * valueAt((grp, tag, rank)).toDouble / scale
          else 0.0
        }.sum
        (grp, name, res)
    }
  }

  /** The value-list route: per-group `percentile()` on the SAME
    * fixed-point grid as the counts machinery (quantize, select,
    * descale) so the two routes agree bit-for-bit modulo the 2-term
    * interpolation sum. Right when groups are small or the domain is
    * near-unique; its state is per-group value lists — the router
    * keeps it away from corpus-sized groups.
    */
  private[graft] def valueListPercentiles(df: DataFrame,
      groupCol: String, measures: Seq[Measure]): DataFrame = {
    val aggCols = measures.flatMap { m =>
      m.targets.map { case (name, f) =>
        (percentile(round(m.value * m.scale).cast("long"), lit(f)) /
          m.scale).as(name)
      }
    }
    val names = measures.flatMap(_.targets.map(_._1))
    df.groupBy(col(groupCol).cast("string").as("grp"))
      .agg(aggCols.head, aggCols.tail: _*)
      .select(col("grp"), explode(array(names.map { n =>
        struct(lit(n).as("target"), col(n).cast("double").as("result"))
      }: _*)).as("t"))
      .select(col("grp"), col("t.target").as("target"),
        col("t.result").as("result"))
  }

  /** Exact p50/p95 quantity and p50 discount per returnflag through
    * the distributed machinery — bounded-NDV fixed-point measures
    * (units, permille rates), where the counts table is ~200 rows at
    * ANY corpus size and the whole report costs one scan + one
    * NDV-sized pass. Near-unique measures (raw cents over a corpus
    * smaller than the value domain) sit below this operator's
    * crossover — see the scaladoc note on [[percentilesByGroupMulti]];
    * price-measure equivalence vs `percentile()` is spec-tested.
    */
  def quantityPercentilesDistributed(spark: SparkSession,
      sfDir: String): DataFrame = {
    val res = percentilesByGroupMulti(
      Tables.load(spark, sfDir, "lineitem"), "l_returnflag", Seq(
        Measure("qty", col("l_quantity"), 1L,
          Seq("p50_qty" -> 0.5, "p95_qty" -> 0.95)),
        Measure("disc", col("l_discount"), 100L,
          Seq("p50_disc" -> 0.5))))
    res.groupBy(col("grp").as("l_returnflag"))
      .pivot("target", Seq("p50_qty", "p95_qty", "p50_disc"))
      .agg(first("result"))
      .select(col("l_returnflag"),
        round(col("p50_qty"), 4).as("p50_qty"),
        round(col("p95_qty"), 4).as("p95_qty"),
        round(col("p50_disc"), 4).as("p50_disc"))
      .orderBy("l_returnflag")
  }

  /** Exact price percentiles through the SELECTION route explicitly
    * (`listRowLimit = 0` disables the small-corpus `percentile()`
    * fallback, so the histogram-narrowing machinery runs at every
    * fixture size and the oracle hash-proves it end-to-end): the
    * near-unique money domain is exactly the shape whose per-group
    * value lists die first at 100 TB, and whose NDV-sized counts
    * table is no reduction at all — iterative range narrowing is the
    * plan that survives, and here it answers `quantile_cont`-exactly.
    */
  def pricePercentilesSelection(spark: SparkSession,
      sfDir: String): DataFrame = {
    val names = Seq("p25_price", "p50_price", "p75_price", "p99_price")
    val rows = percentilesByGroupRoutedRows(
      Tables.load(spark, sfDir, "lineitem"), "l_returnflag", Seq(
        Measure("price", col("l_extendedprice"), 100L,
          names.zip(Seq(0.25, 0.5, 0.75, 0.99)))),
      listRowLimit = 0L)
    // report assembly (pivot to wide + 4 dp round + sort) happens on
    // the driver — the report is 3 groups × 4 targets, not a job
    val wide = rows.groupBy(_._1).toSeq.map { case (g, ts) =>
      val m = ts.map(t => t._2 -> t._3).toMap
      (g, round4(m(names(0))), round4(m(names(1))),
        round4(m(names(2))), round4(m(names(3))))
    }.sortBy(_._1)
    spark.createDataFrame(spark.sparkContext.parallelize(wide, 1))
      .toDF("l_returnflag" +: names: _*)
  }

  /** Mergeable bottom-k QUANTILE SKETCH: per-group nearest-rank
    * quantile estimates from the k rows with the smallest
    * engine-portable hash priority — a uniform without-replacement
    * sample whose selection (and therefore every estimate) is exactly
    * replayable in plain SQL, the quantile sibling of the KMV NDV
    * sketch (same bottom-k-by-portable-hash state, different payload).
    *
    * Where [[percentilesByGroupMulti]] is the EXACT machinery (right
    * when value NDV ≪ rows), the sketch is the one-pass answer when
    * neither holds: the bounded [[graft.functions.TopKRows]] aggregate
    * keeps ≤ k (priority, value) rows per group per map task, so the
    * shuffle carries O(k·groups) rows off ONE corpus scan at any data
    * size, the union of two samples re-truncated to k is the sample of
    * the union (mergeable across partitions, files, or days), and
    * rank selection runs over k-row groups. Estimate error is the
    * classic order-statistic bound (rank error O(n/√k)); k trades
    * accuracy for state like every sketch here.
    *
    * The priority is the Knuth-multiplicative hash of the unique line
    * key (reduce mod P BEFORE the multiply — no overflow at any
    * corpus size); the estimator is nearest-rank (value at row
    * ceil(p·n) of the value-sorted sample) — pure selection, no
    * interpolation arithmetic, so the hash compare is exact.
    */
  def sampleQuantiles(spark: SparkSession, sfDir: String,
      k: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val P = 1000000007L
    // l_linenumber ∈ [1,7]: ·10 keeps the line key unique and small
    val rk = col("l_orderkey") * lit(10L) + col("l_linenumber")
    val sampled = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), rk.as("rk"),
        (pmod(rk, lit(P)) * lit(2654435761L) % lit(P)).as("pri"),
        col("l_extendedprice").as("v"))
      .groupBy("l_returnflag")
      // ord = −priority: greatest ord ⇒ smallest hash; tie by line key
      .agg(graft.functions.TopKFunctions.topk_rows(
        -col("pri").cast("double"), col("rk"),
        struct(col("v"), col("rk")), k).as("top"))
      .select(col("l_returnflag"), explode(col("top")).as("s"))
      .select(col("l_returnflag"), col("s.v").as("v"), col("s.rk").as("rk"))
    // rank selection inside the ≤k-row groups (partitioned window —
    // each partition is one group's sample, never the corpus)
    val w = Window.partitionBy("l_returnflag")
    val ranked = sampled
      .withColumn("rv", row_number().over(w.orderBy(col("v"), col("rk"))))
      .withColumn("n", count(lit(1)).over(w))
    def pick(p: Double, name: String) =
      max(when(col("rv") === ceil(lit(p) * col("n")), col("v")))
        .cast("double").as(name)
    ranked.groupBy("l_returnflag")
      .agg(max(col("n")).cast("long").as("n_sample"),
        pick(0.50, "p50_est"), pick(0.90, "p90_est"),
        pick(0.99, "p99_est"))
      .orderBy("l_returnflag")
  }

  /** Single-measure convenience form of [[percentilesByGroupMulti]]:
    * returns (grp, target, result).
    */
  def percentilesByGroup(df: DataFrame, groupCol: String, value: Column,
      scale: Long, targets: Seq[(String, Double)]): DataFrame =
    percentilesByGroupMulti(df, groupCol,
      Seq(Measure("m", value, scale, targets)))

  /** Exact interpolated percentiles of every measure per `groupCol`:
    * returns (grp, target, result) — one row per group × target
    * across all measures, from ONE scan of `df`.
    *
    * Each measure's `value` must be non-negative fixed-point at its
    * `scale` (v·scale is a ≤2^40 integer after rounding off float
    * noise — cents, units); descaling by the same power recovers the
    * original double exactly, so results equal
    * `percentile`/`quantile_cont` up to summation-order jitter far
    * below 4dp rounding. `groupCol` is compared as a string
    * (dimension values — distinct renderings). Target names must be
    * globally unique across measures.
    */
  def percentilesByGroupMulti(df: DataFrame, groupCol: String,
      measures: Seq[Measure]): DataFrame = {
    require(measures.nonEmpty, "at least one measure")
    val tags = measures.map(_.tag)
    require(tags.distinct == tags, s"duplicate measure tags: $tags")
    val names = measures.flatMap(_.targets.map(_._1))
    require(names.distinct == names,
      s"target names must be globally unique: $names")
    val spark = df.sparkSession
    import spark.implicits._
    // one scan: melt measures into (grp, tag, fixed-point v) — round()
    // strips the float-multiply noise (914.44 * 100 = 91443.999…).
    // Persisted: the corpus reduces to this NDV-sized table ONCE; the
    // stripe-index collect, the prefix sum's shard-total collect, and
    // the rank probes all read the cache, never the corpus.
    val melted = df.select(col(groupCol).cast("string").as("grp"),
      explode(array(measures.map { m =>
        struct(lit(m.tag).as("tag"),
          round(m.value * m.scale).cast("long").as("v"))
      }: _*)).as("m"))
      .select(col("grp"), col("m.tag").as("tag"), col("m.v").as("v"))
      // percentile()/quantile_cont ignore NULL inputs — so does this
      // (a NULL v would also null the stripe key and break PrefixSum)
      .filter(col("v").isNotNull)
    val counts = melted.groupBy("grp", "tag", "v")
      .agg(count(lit(1)).as("cnt"))
      .persist()

    // stripe index over (group, measure): parameter-scale collect (the
    // report's dimension values), deterministic order. 2^40 per-stripe
    // key ranges keep PrefixSum shards from ever spanning two stripes
    // (shardWidth divides the stripe width — required below). The same
    // collect carries each stripe's min/max quantized value and
    // ENFORCES the packing domain v ∈ [0, 2^40): a value outside it
    // would land its count in a neighboring stripe's key range and
    // silently skew both stripes' n/offset (the r13 in-plan totals
    // were immune; the driver derivation must check what the plan no
    // longer guards).
    val StripeWidth = 1L << 40
    val ShardWidth = 1L << 20
    require(StripeWidth % ShardWidth == 0L,
      "shard width must divide the stripe width")
    val shardsPerStripe = StripeWidth / ShardWidth
    val stripeRows = counts.groupBy("grp", "tag")
      .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
      .orderBy("grp", "tag").collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    stripeRows.foreach { case (g, t, vmin, vmax) =>
      require(vmin >= 0L && vmax < StripeWidth,
        s"quantized values of $g/$t span [$vmin, $vmax] — the sharded " +
          "counts route requires v in [0, 2^40); rescale the measure " +
          "or route it through selection")
    }
    val stripes = stripeRows.map { case (g, t, _, _) => (g, t) }
      .zipWithIndex
    val stripeDf = stripes.map { case ((g, t), i) => (g, t, i.toLong) }
      .toSeq.toDF("grp", "tag", "sidx")
    val keyed = counts.join(broadcast(stripeDf), Seq("grp", "tag"))
      .withColumn("key", col("sidx") * lit(StripeWidth) + col("v"))
    // NOT persisted (the probe join is its only consumer now): the
    // per-stripe totals/offsets derive ON THE DRIVER from the shard
    // totals the prefix sum collected anyway — a shard never spans two
    // stripes, so the aggregate pass that recomputed them over the
    // cumulative table (and the cache that pass forced) is gone
    val (cum, shardTotals) = PrefixSum.withGlobalCumSumAndTotals(
      keyed, "key", col("cnt"), "gcum", shardWidth = ShardWidth)

    // driver: per-stripe n and starting offset by an exclusive prefix
    // scan over the sorted shard totals (shard = key div shardWidth ⇒
    // stripe index = shard div (stripeWidth/shardWidth) — derived from
    // the widths actually in force, never a hard-coded shift)
    val stripeN = scala.collection.mutable.LongMap.empty[Long]
    val stripeOff = scala.collection.mutable.LongMap.empty[Long]
    var runningOff = 0L
    shardTotals.foreach { case (shard, t) =>
      val sidx = shard / shardsPerStripe
      if (!stripeOff.contains(sidx)) stripeOff.update(sidx, runningOff)
      stripeN.update(sidx, stripeN.getOrElse(sidx, 0L) + t)
      runningOff += t
    }

    // ≤2 probe rows per stripe×target: 1-based positions lo0+1, lo0+2
    // with weights (1−frac), frac — the hi row only exists when the
    // rank is fractional, so position n+1 is never probed. Same
    // arithmetic (f · (n−1) in doubles, floor, residual) the in-plan
    // spelling ran, now over the driver-held stripe index.
    val byTag = measures.map(m => m.tag -> m).toMap
    val probeRows = stripes.toSeq.flatMap { case ((g, tg), i) =>
      val n = stripeN.getOrElse(i.toLong, 0L)
      val goff = stripeOff.getOrElse(i.toLong, 0L)
      if (n == 0L) Nil
      else byTag(tg).targets.flatMap { case (name, f) =>
        val r = f * (n - 1)
        val lo0 = math.floor(r).toLong
        val frac = r - math.floor(r)
        Seq((g, tg, name, byTag(tg).scale, goff + lo0 + 1, 1.0 - frac),
          (g, tg, name, byTag(tg).scale, goff + lo0 + 2, frac))
          .filter(_._6 > 0)
      }
    }
    val probes = probeRows
      .toDF("pgrp", "ptag", "target", "mscale", "pos", "weight")

    // rank-range probe: pos ∈ (gcum − cnt, gcum] picks the value at
    // that global rank; the probe side is stripes×targets×2 rows →
    // broadcast, so selection is one scan of the NDV table
    val out = cum.join(broadcast(probes),
        col("grp") === col("pgrp") && col("tag") === col("ptag") &&
          col("pos") > col("gcum") - col("cnt") && col("pos") <= col("gcum"))
      .groupBy("grp", "target")
      .agg(sum(col("weight") * col("v").cast("double") / col("mscale"))
        .as("result"))
    // the report is stripes×targets rows — materialize it, then drop
    // the NDV-sized cache deterministically (a lazy return would
    // leak it until RDD GC across repeated invocations)
    graft.plans.PlanProbe.dump("percentiles_multi_internal", out)
    val rows = out.collect().toSeq
    counts.unpersist(false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), out.schema)
  }
}
