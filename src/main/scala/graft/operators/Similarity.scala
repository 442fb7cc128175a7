package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two tiers, per the usual ANN playbook:
  *  - exact brute-force cosine (the baseline and the oracle-checkable
  *    form) — a single scan with a codegen'd fold per row; right
  *    whenever the candidate set is already bounded;
  *  - IVF (inverted-file) index — k-means cells, queries probe the
  *    nProbe nearest cells. At 100 TB the cell assignment is the
  *    partition key: each cell's vectors co-locate, a query touches
  *    nProbe partitions instead of the full corpus, and recall/cost is
  *    tuned by (k, nProbe), exactly like FAISS IVF-Flat.
  *
  * All arithmetic is double, accumulated in element order, so DuckDB
  * (same order, same width) agrees bit-for-bit before rounding.
  */
object Similarity {

  import graft.functions.VectorMath.dot_product

  /** Cosine similarity of two array<double> columns — native
    * DotProduct kernel (one primitive loop per pair, same IEEE
    * element-order accumulation as the oracle).
    */
  def cosine(a: Column, b: Column): Column =
    dot_product(a, b) / (sqrt(dot_product(a, a)) * sqrt(dot_product(b, b)))

  /** Cosine when per-row norms are already materialized — the pair
    * joins use this: one dot per pair instead of three.
    */
  def cosinePrenormed(dot: Column, normA: Column, normB: Column): Column =
    dot / (normA * normB)

  private def embeddingsAsDouble(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label"))

  /** Embeddings with the norm precomputed once per row (sqrt of the
    * self-dot) — the factor the O(pairs) stage must not recompute.
    */
  private def embeddingsWithNorm(spark: SparkSession, sfDir: String): DataFrame =
    embeddingsAsDouble(spark, sfDir)
      .withColumn("nrm", sqrt(dot_product(col("v"), col("v"))))

  /** The query vector: row `vecId`'s embedding, collected to the
    * driver (one row — the standard "parameter" pattern; at scale this
    * is the user-supplied query, not a scan).
    */
  def queryVector(spark: SparkSession, sfDir: String, vecId: Long): Seq[Double] =
    embeddingsAsDouble(spark, sfDir).filter(col("vec_id") === vecId)
      .select("v").collect()(0).getSeq[Double](0)

  /** Brute-force cosine top-k against the query vector — the exact
    * baseline. Ordered by rounded score (so float jitter can't flip
    * ranks across engines) with vec_id tie-break.
    */
  def cosineTopK(spark: SparkSession, sfDir: String,
      vecId: Long = 0L, k: Int = 20): DataFrame = {
    val q = typedlit(queryVector(spark, sfDir, vecId))
    embeddingsAsDouble(spark, sfDir)
      .filter(col("vec_id") =!= vecId)
      .select(col("vec_id"), round(cosine(col("v"), q), 4).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** Exact embedding near-duplicate pairs: all (ai<bi) with cosine ≥
    * threshold. O(n²) by design — this is the oracle-checkable exact
    * form; [[ivfTopK]] is the scale path.
    */
  def embeddingPairs(spark: SparkSession, sfDir: String,
      threshold: Double = 0.4): DataFrame = {
    val e = embeddingsWithNorm(spark, sfDir)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ai"), col("b.vec_id").as("bi"),
        round(cosinePrenormed(dot_product(col("a.v"), col("b.v")),
          col("a.nrm"), col("b.nrm")), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("ai", "bi")
  }

  // IVF index cache: building the index is an offline step (at scale
  // the corpus is written out partitioned by cell once); queries must
  // not refit k-means. Keyed by (session, sfDir, numCells) — a cached
  // DataFrame is bound to the session that built it and must not leak
  // into a later one.
  private val ivfCache =
    scala.collection.concurrent.TrieMap
      .empty[(String, String, Int), (DataFrame, Array[Seq[Double]])]

  /** IVF index: k-means cell id per vector (seeded, deterministic),
    * memoized per (session, corpus).
    */
  def ivfAssignments(spark: SparkSession, sfDir: String,
      numCells: Int = 16): (DataFrame, Array[Seq[Double]]) =
    ivfCache.getOrElseUpdate(
      (System.identityHashCode(spark).toString, sfDir, numCells), {
      val e = embeddingsAsDouble(spark, sfDir)
        .withColumn("features", array_to_vector(col("v")))
      val model = new KMeans().setK(numCells).setSeed(42L)
        .setFeaturesCol("features").fit(e)
      val assigned = model.transform(e)
        .select(col("vec_id"), col("v"), col("prediction").as("cell"))
        .persist()
      (assigned, model.clusterCenters.map(_.toArray.toSeq))
    })

  /** ANN top-k via IVF: rank cells by centroid cosine to the query,
    * probe the nProbe best, exact cosine only within probed cells.
    * Scans nProbe/numCells of the corpus; recall is property-tested
    * against [[cosineTopK]].
    */
  def ivfTopK(spark: SparkSession, sfDir: String, vecId: Long = 0L,
      k: Int = 20, numCells: Int = 16, nProbe: Int = 8): DataFrame = {
    val q = queryVector(spark, sfDir, vecId)
    val (assigned, centers) = ivfAssignments(spark, sfDir, numCells)
    def cos(c: Seq[Double]): Double = {
      val dot = c.zip(q).map { case (x, y) => x * y }.sum
      val n = math.sqrt(c.map(x => x * x).sum) * math.sqrt(q.map(x => x * x).sum)
      if (n == 0) 0.0 else dot / n
    }
    val probed = centers.zipWithIndex
      .sortBy { case (c, _) => -cos(c) }.take(nProbe).map(_._2).toSeq
    assigned
      .filter(col("cell").isin(probed: _*) && col("vec_id") =!= vecId)
      .select(col("vec_id"),
        round(cosine(col("v"), typedlit(q)), 4).as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }
}
