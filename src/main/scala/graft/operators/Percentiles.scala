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
    // key ranges keep PrefixSum shards (2^20 keys) from ever spanning
    // two stripes.
    val stripes = counts.select("grp", "tag").distinct()
      .orderBy("grp", "tag").collect()
      .map(r => (r.getString(0), r.getString(1))).zipWithIndex
    val stripeDf = stripes.map { case ((g, t), i) => (g, t, i.toLong) }
      .toSeq.toDF("grp", "tag", "sidx")
    val keyed = counts.join(broadcast(stripeDf), Seq("grp", "tag"))
      .withColumn("key", col("sidx") * lit(1L << 40) + col("v"))
    // persisted too: both the per-stripe totals and the probe join
    // read the cumulative table — one window pass, not two
    val cum = PrefixSum.withGlobalCumSum(keyed, "key", col("cnt"), "gcum")
      .persist()

    // per-stripe totals → starting offsets and n
    val totals = cum.groupBy("grp", "tag")
      .agg(sum("cnt").as("n"), max("gcum").as("gend"))
      .withColumn("goff", col("gend") - col("n"))

    // ≤2 probe rows per stripe×target: 1-based positions lo0+1, lo0+2
    // with weights (1−frac), frac — the hi row only exists when the
    // rank is fractional, so position n+1 is never probed
    val targetDf = measures.flatMap(m =>
      m.targets.map { case (name, f) => (m.tag, name, f, m.scale) })
      .toDF("tag", "target", "f", "mscale")
    val probes = totals.join(broadcast(targetDf), "tag")
      .select(col("grp").as("pgrp"), col("tag").as("ptag"),
        col("target"), col("mscale"), col("goff"),
        (col("f") * (col("n") - 1)).as("r"))
      .select(col("pgrp"), col("ptag"), col("target"), col("mscale"),
        col("goff"), floor(col("r")).as("lo0"),
        (col("r") - floor(col("r"))).as("frac"))
      .select(col("pgrp"), col("ptag"), col("target"), col("mscale"),
        explode(array(
          struct((col("goff") + col("lo0") + 1).as("pos"),
            (lit(1.0) - col("frac")).as("weight")),
          struct((col("goff") + col("lo0") + 2).as("pos"),
            col("frac").as("weight")))).as("p"))
      .select(col("pgrp"), col("ptag"), col("target"), col("mscale"),
        col("p.pos").as("pos"), col("p.weight").as("weight"))
      .filter(col("weight") > 0)

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
    // the two NDV-sized caches deterministically (a lazy return would
    // leak them until RDD GC across repeated invocations)
    val rows = out.collect().toSeq
    counts.unpersist(false)
    cum.unpersist(false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), out.schema)
  }
}
