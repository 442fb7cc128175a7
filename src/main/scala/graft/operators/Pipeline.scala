package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.sources.Tables

/** Training-data pipeline assembly operators: sequence packing and
  * benchmark decontamination — the steps between a cleaned corpus and
  * a training run.
  */
object Pipeline {

  /** Token-budget sequence packing, cumulative-window form: documents
    * (in doc_id order) are assigned to the budget window their running
    * token count ends in. A pack can exceed `budget` by at most its
    * last (straddling) document's tokens — this is the parallelizable
    * approximation of greedy packing (exact greedy resets at each
    * boundary, which is a sequential fold, not a window). The global
    * running sum mirrors the reference's sequential batching semantics
    * (trainer.py:222), computed as a sharded two-pass prefix sum
    * ([[PrefixSum]]) — no single-partition window. shardWidth=4096
    * exercises the multi-shard path even at test SF; production sizing
    * is ~2^20 keys/shard.
    */
  def tokenPacking(spark: SparkSession, sfDir: String,
      budget: Int = 512): DataFrame = {
    val toks = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    PrefixSum.withGlobalCumSum(toks, "doc_id", col("n_tokens"), "cum",
        shardWidth = 4096)
      // pack id: which budget-window the cumulative count lands in
      .withColumn("pack_id", floor((col("cum") - 1) / budget))
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("pack_id")
  }

  /** Benchmark decontamination: flag training documents sharing any
    * word 8-gram with the held-out set (here: doc_id < `evalCount`
    * plays the benchmark). The eval side's distinct grams are tiny →
    * broadcast; the training side explodes grams and inner-joins, so
    * the cost is one scan of the corpus however large it is. Returns
    * one row per contaminated training doc with its overlap count.
    */
  def contamination(spark: SparkSession, sfDir: String,
      evalCount: Long = 10, n: Int = 8): DataFrame = {
    // grams are compared as 64-bit hashes (single-pass kernel) — same
    // overlap counts as string grams w.h.p.; the oracle replays the
    // string form
    val docs = Tables.load(spark, sfDir, "documents")
    val gramHashes = graft.functions.VectorMath
      .word_ngram_hashes(col("text"), n)
    val evalGrams = docs.filter(col("doc_id") < evalCount)
      .select(explode(gramHashes).as("gram"))
      .distinct()
    val trainGrams = docs.filter(col("doc_id") >= evalCount)
      .select(col("doc_id"), explode(gramHashes).as("gram"))
    trainGrams.join(broadcast(evalGrams), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_grams"))
      .orderBy("doc_id")
  }
}
