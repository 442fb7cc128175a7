package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.HllFunctions.hll_distinct
import graft.sources.Tables

/** Per-column NDV estimation and the hash-domain sizing rule built on
  * it — the end-to-end flow the reference performs by hand: measure
  * distinct counts offline (`vocab_size`, trainer.py:91-118), then
  * size each categorical hash domain as `ndv * 5`
  * (trainer.py:264).
  *
  * All columns are sketched in ONE scan (one HLL buffer per column in
  * a single aggregate), so analyzing a 40-column 100 TB table costs
  * the same pass a count(*) does.
  */
object CardinalityEstimator {

  val BucketMultiplier = 5 // trainer.py:264

  /** One-pass approximate NDV for each named column. */
  def vocabSizes(df: DataFrame, cols: Seq[String]): Map[String, Long] = {
    val aggs: Seq[Column] = cols.map(c => hll_distinct(col(c)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
  }

  /** The reference's sizing rule: hash-bucket domain = ndv × 5. */
  def bucketSizes(vocab: Map[String, Long]): Map[String, Long] =
    vocab.map { case (c, n) => c -> n * BucketMultiplier }

  /** Heavy hitters of a column as rows — the frequency half of the
    * column-statistics story (exact when ndv ≤ capacity, which the
    * oracle relies on). One scan, sketch-sized shuffle.
    */
  def heavyHitters(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .agg(graft.functions.FreqFunctions.freq_topk(col("event_type"), 8)
        .as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.value").as("value"), col("h.cnt").as("cnt"))
      .orderBy(desc("cnt"), asc("value"))

  /** Long-form table of (column, approx ndv, bucket size) for the
    * categorical columns of a table — the engine's rendition of the
    * reference's `vocab_size` dict. Not oracle-checked (DuckDB's HLL
    * differs); accuracy is property-tested against exact counts.
    */
  def vocabTable(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val cols = Seq("l_returnflag", "l_linestatus", "l_partkey",
      "l_suppkey", "l_orderkey")
    val aggs = cols.map(c => hll_distinct(col(c)).as(c))
    val wide = li.agg(aggs.head, aggs.tail: _*) // ONE scan, 5 sketches
    val stackArgs = cols.map(c => s"'$c', $c").mkString(", ")
    wide.select(expr(
        s"stack(${cols.size}, $stackArgs) AS (column_name, approx_ndv)"))
      .withColumn("n_buckets", col("approx_ndv") * BucketMultiplier)
      .orderBy("column_name")
  }

  /** The vocab table again, through the KMV sketch and AUDITED — per
    * key column of the fact table: exact NDV next to the
    * [[graft.functions.KmvNdv]] estimate. Unlike [[vocabTable]]'s HLL
    * (whose register layout no other engine replays), the KMV state is
    * just "the k smallest distinct hashes", and the hash here is the
    * portable (v mod p)·2654435761 mod p integer arithmetic — so the
    * DuckDB oracle rebuilds the k-th order statistic with a
    * row_number window and lands on the SAME integer estimate. The
    * fixture's l_suppkey NDV sits below k, exercising the exact branch;
    * the other two estimate.
    *
    * Production shape: `kmv_ndv` alone is one scan with O(k) state per
    * (group × column) and map-side partial merge — the exact column
    * here is the audit, priced like q06's distinct. The melt triples
    * rows BEFORE the distinct, which is what lets one hash shuffle
    * dedup all three columns in a single exchange.
    */
  def kmvVocabTable(spark: SparkSession, sfDir: String,
      k: Int = 128): DataFrame = {
    val P = 1000000007L
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey")
    val melted = Tables.load(spark, sfDir, "lineitem")
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col(c).as("v"))): _*)).as("m"))
      .select(col("m.column_name").as("column_name"), col("m.v").as("v"))
    val distinctV = melted.distinct()
    distinctV
      .withColumn("h", (col("v") % lit(P)) * lit(2654435761L) % lit(P))
      .groupBy("column_name")
      .agg(count(lit(1)).as("exact_ndv"),
        graft.functions.KmvFunctions.kmv_ndv(col("h"), k, P).as("kmv_ndv"))
      .orderBy("column_name")
  }
}
