package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis._
import graft.sources.Tables

/** Corpus-analysis queries over the documents table — the text-side
  * LLM-pipeline operators (token budgets, quality filtering, language
  * routing, fingerprinting). One scan each; every measure is a column
  * expression fused into the scan by whole-stage codegen.
  */
object TextQueries {

  /** Corpus stopwords (function words present in the synthetic
    * vocabulary).
    */
  val Stopwords: Seq[String] = Seq("the", "a")

  /** Token counting: whitespace tokens, BPE-ish subword units, mean
    * word length.
    */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        regexTokenCount(col("text")).cast("long").as("n_word_tokens"),
        round(avgWordLen(col("text")), 4).as("avg_word_len"))
      .orderBy("doc_id")

  /** Quality scoring: stopword ratio, vocabulary diversity, composite
    * score — the heuristic pre-training quality filter.
    */
  def qualityScores(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        round(stopwordRatio(col("text"), Stopwords), 4).as("stopword_ratio"),
        round(distinctRatio(col("text")), 4).as("distinct_ratio"),
        qualityScore(col("text"), Stopwords).as("quality"))
      .orderBy("doc_id")

  /** Language ID over the corpus (rows-only: the heuristic's accuracy
    * is unit-tested on real multilingual fixtures; this corpus's text
    * is English-shaped regardless of its `lang` label).
    */
  def langIdQuery(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        langId(col("text")).as("predicted_lang"))
      .orderBy("doc_id")

  /** Rolling-hash document fingerprints + exact-dup detection by
    * fingerprint collision count.
    */
  def fingerprints(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Hashing-trick term frequencies: every token hashed into `dim`
    * buckets with the portable rolling hash, counted per (doc,
    * bucket) — the reference's categorical hash-bucketing
    * (trainer.py:262-267) applied to text, for the scale where a vocab
    * table can't exist. One explode + one count, both map-side
    * combinable; the bucket function is the same pure-arithmetic fold
    * the oracle replays, so the feature vectors are engine-portable.
    */
  def hashedTf(spark: SparkSession, sfDir: String,
      dim: Int = 64): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .withColumn("bucket",
        pmod(fingerprint(col("w")), lit(dim.toLong)))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("tf"))
      .orderBy("doc_id", "bucket")
}
