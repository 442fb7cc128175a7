package graft.operators

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{FeatureHasher, VectorAssembler}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The "estimator" half of the reference (SURVEY.md §2.9): a linear
  * classifier over hash-bucketed categorical + numeric feature columns
  * with a train/eval split — `LinearClassifier` +
  * `train_and_evaluate` (reference trainer.py:271-298), re-expressed
  * as a spark.ml Pipeline. FeatureHasher is the vectorized form of
  * `categorical_column_with_hash_bucket` (trainer.py:262-267); bucket
  * count follows the ndv×5 rule via CardinalityEstimator at real
  * scale.
  *
  * Not SQL-expressible → no oracle entry; covered by EstimatorSpec.
  */
object Estimators {

  /** Criteo-shaped supervised frame from events: numeric feature
    * (value), categorical feature (event_type), binary label.
    */
  def labeledEvents(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .select(
        col("event_id"), col("event_type"), col("value"),
        (col("event_type") === "purchase").cast("double").as("label"))

  /** E1+E3: fit LogisticRegression on a deterministic split, return
    * (areaUnderROC, model accuracy proxy). The label is derivable from
    * the categorical feature, so AUC≈1 is the expected signal — the
    * test asserts the pipeline learns it.
    */
  def trainEval(spark: SparkSession, sfDir: String): Double =
    evalPipeline(spark, sfDir, dnn = false)

  /** E2: the DNN variant — MultilayerPerceptronClassifier standing in
    * for `DNNClassifier(hidden_units=[512,256])` (reference
    * trainer.py:300-316), sized down to the toy feature space.
    */
  def trainEvalDnn(spark: SparkSession, sfDir: String): Double =
    evalPipeline(spark, sfDir, dnn = true)

  private def evalPipeline(spark: SparkSession, sfDir: String,
      dnn: Boolean): Double = {
    val df = labeledEvents(spark, sfDir)
    val Array(train, test) = df.randomSplit(Array(0.8, 0.2), seed = 42L)
    val model = fitPipeline(train, dnn)
    new BinaryClassificationEvaluator()
      .setLabelCol("label").setMetricName("areaUnderROC")
      .evaluate(model.transform(test))
  }

  /** Model persistence (the reference's `model_dir` checkpoint flow,
    * trainer.py:287-292, :517): a fitted pipeline writes itself as a
    * directory of parquet metadata + coefficients, and [[loadModel]]
    * restores a transform-identical model in a FRESH process — the
    * train-once / serve-many contract. MLWriter's format is
    * stage-by-stage parquet, so a model saved on the cluster that
    * trained it loads anywhere the library runs (no JVM serialization,
    * no classpath pinning beyond spark.ml itself).
    */
  def saveModel(model: org.apache.spark.ml.PipelineModel,
      path: String): Unit =
    model.write.overwrite().save(path)

  def loadModel(path: String): org.apache.spark.ml.PipelineModel =
    org.apache.spark.ml.PipelineModel.load(path)

  /** Fit the E1/E2 pipeline on a prepared training frame; exposed so
    * train / persist / restore / evaluate compose as separate steps
    * (the reference separates them the same way: estimator
    * construction, `train`, checkpoint restore).
    */
  def fitPipeline(train: DataFrame,
      dnn: Boolean): org.apache.spark.ml.PipelineModel = {
    val hasher = new FeatureHasher()
      // 2^8 buckets: ndv(5)*5 rounded up to the next power of two with
      // headroom — at 32, two of the five categories hash-collide and
      // the classifier tops out at AUC≈0.91
      .setInputCols("event_type").setNumFeatures(256)
      .setOutputCol("cat_features")
    val assembler = new VectorAssembler()
      .setInputCols(Array("cat_features", "value")).setOutputCol("features")
    val classifier = if (dnn) {
      // 256 hashed + 1 numeric input -> [16, 8] hidden -> 2 classes
      new org.apache.spark.ml.classification.MultilayerPerceptronClassifier()
        .setLayers(Array(257, 16, 8, 2)).setMaxIter(40).setSeed(42L)
        .setFeaturesCol("features").setLabelCol("label")
    } else {
      new LogisticRegression()
        .setMaxIter(20).setRegParam(0.01)
        .setFeaturesCol("features").setLabelCol("label")
    }
    new Pipeline().setStages(Array(hasher, assembler, classifier))
      .fit(train)
  }

  /** Batch gradient descent for logistic regression as pure DataFrame
    * aggregates — the engine-portable, oracle-replayable training loop
    * next to [[trainEval]]'s black-box spark.ml pipeline. Features are
    * bias ⊕ embedding; the label is the top-half class indicator.
    *
    * The distributed shape per iteration mirrors
    * [[Similarity.lloydClusters]]: the weight vector is model state
    * (dim+1 doubles — the collect-a-parameter pattern) broadcast into
    * ONE corpus scan as literals; the per-row residual σ(w·x) − y is a
    * codegen'd expression; the gradient is a posexplode →
    * (pos)-grouped mean whose partial aggregation reduces each task to
    * dim+1 partial sums before the shuffle — at 100 TB an iteration is
    * one scan plus an O(dim × tasks) shuffle, the cost model every
    * data-parallel SGD framework trains with. Gradients round to 6 dp
    * per iterate (quantum ≫ summation jitter) and the weight update
    * w − lr·g is the same IEEE subtraction in both engines, so any
    * engine replays the identical trajectory; iteration 1's σ(0) = 0.5
    * is exact everywhere. Output: the confusion matrix of the trained
    * model over the corpus with mean predicted probability per cell
    * (min |p − 0.5| margin ≈ 5e-7 at every fixture scale, nine orders
    * above cross-engine exp/summation noise).
    */
  /** The (bias ⊕ embedding, binary label) training frame shared by the
    * GD trainer and the calibration report.
    */
  private[graft] def logregFeatures(spark: SparkSession,
      sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"),
        concat(array(lit(1.0)), col("embedding").cast("array<double>"))
          .as("x"),
        when(col("label") >= 5, 1).otherwise(0).as("y"))

  /** σ(w·x) over the feature column for broadcast weight literals. */
  private[graft] def logregSigma(
      wl: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.functions.VectorMath.dot_product
    lit(1.0) / (lit(1.0) + exp(-dot_product(col("x"), wl)))
  }

  /** The trained weight trajectory (collect-a-parameter pattern, one
    * scan per iteration, gradients rounded 6 dp per iterate).
    */
  private[graft] def logregWeights(e: DataFrame, lr: Double,
      iters: Int): Seq[Double] = {
    val dim = e.select(size(col("x"))).head().getInt(0)
    var w: Seq[Double] = Seq.fill(dim)(0.0)
    for (_ <- 1 to iters) {
      val grads = e
        .withColumn("r", logregSigma(typedlit(w)) - col("y").cast("double"))
        .select(posexplode(col("x")).as(Seq("pos", "xj")), col("r"))
        .groupBy("pos").agg(round(avg(col("xj") * col("r")), 6).as("g"))
        .collect().map(r => (r.getInt(0), r.getDouble(1)))
        .sortBy(_._1).map(_._2).toSeq
      w = w.lazyZip(grads).map((wj, gj) => wj - lr * gj)
    }
    w
  }

  def logregGd(spark: SparkSession, sfDir: String, lr: Double = 1.0,
      iters: Int = 3): DataFrame = {
    // persisted: the dim probe, each GD iteration, and the confusion
    // census all scan this frame — unpersisted, that's iters+2 parquet
    // scans with the float→double widening re-run each time (the q156
    // discipline)
    val e = logregFeatures(spark, sfDir).persist()
    // the feature width is constant (bias ⊕ fixed-dim embedding): one
    // row answers it — never a corpus-wide aggregate
    val w = logregWeights(e, lr, iters)
    // registered AFTER the training collects (they read the cache);
    // the returned frame's first consuming action releases it
    graft.plans.CacheRelease.afterFirstUse(e)
    e.select(col("y"),
        when(logregSigma(typedlit(w)) >= 0.5, 1).otherwise(0).as("pred"),
        logregSigma(typedlit(w)).as("p"))
      .groupBy("y", "pred")
      .agg(count(lit(1)).as("n"), round(avg("p"), 4).as("avg_p"))
      .orderBy("y", "pred")
  }

  /** MODEL CALIBRATION deciles — the reliability diagram of the q124
    * model as a query: score the corpus with the trained weights,
    * round p to 6 dp (quantum ≫ cross-libm exp jitter), cut the score
    * distribution at the nine exact deciles, and report count, mean
    * predicted p, and observed positive rate per bucket.
    *
    * Scale shape: scoring is one codegen'd pass; the nine cutpoints
    * are a 1-row percentile aggregate BROADCAST back (decile
    * assignment is nine comparisons against literals via a
    * higher-order filter — no corpus-wide ntile window, which is the
    * textbook spelling and the thing that dies at scale); the report
    * is a 10-group aggregate.
    */
  def calibrationDeciles(spark: SparkSession, sfDir: String,
      lr: Double = 1.0, iters: Int = 3): DataFrame = {
    // persisted: weights (iters+1 scans), the cutpoint aggregate, and
    // the decile census all read this frame (the q156 discipline)
    val e = logregFeatures(spark, sfDir).persist()
    val w = logregWeights(e, lr, iters)
    // registered AFTER the training collects (they read the cache);
    // the returned frame's first consuming action releases it
    graft.plans.CacheRelease.afterFirstUse(e)
    val scored = e.select(col("y"),
      round(logregSigma(typedlit(w)), 6).as("p6"))
    // cutpoints round to the SAME 6 dp grid as the scores: Spark's
    // Percentile interpolates (1−f)·lo + f·hi while quantile_cont does
    // lo + f·(hi−lo) — between two equal quantized scores v the engines
    // can differ by 1 ulp around v, flipping every p6 == v row's strict
    // compare; rounding both to the grid makes the compare identical.
    val cuts = scored.agg(transform(expr(
      "percentile(p6, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))"),
      c => round(c, 6)).as("cs"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("decile",
        lit(1) + size(filter(col("cs"), c => col("p6") > c)))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        round(avg("p6"), 4).as("avg_p"),
        round(avg(col("y").cast("double")), 4).as("pos_rate"))
      .orderBy("decile")
  }

  /** TEXT-CLASSIFIER training frame: bias ⊕ dense `dim`-bucket
    * normalized hashed term frequencies (the q54 portable
    * rolling-hash buckets) per document — the fastText-style linear
    * filter a curation pipeline trains ON the corpus. The label
    * DISTILLS the hand-written quality gate: y = 1 when the
    * 'the'/'a' stopword share reaches 8% — compared in exact
    * integers (100·hits ≥ 8·tokens), so the label is bit-identical
    * in any engine — which a linear model over hashed tf shares can
    * genuinely learn (the stopwords own two buckets). The per-doc
    * map is ≤ dim entries (bounded, never corpus-sized); the melt to
    * dense rides one groupBy of the tf frame.
    */
  private[graft] def textFeatures(spark: SparkSession, sfDir: String,
      dim: Int = 16): DataFrame = {
    val tf = TextQueries.rawTf(spark, sfDir, dim)
      .groupBy("doc_id")
      .agg(map_from_entries(
        collect_list(struct(col("bucket"), col("tf")))).as("m"),
        sum("tf").as("tot"))
    val ws = split(col("text"), " ")
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        when(size(filter(ws, w => w.isin("the", "a"))) * 100 >=
          size(ws) * 8, 1).otherwise(0).as("y"))
      .join(tf, "doc_id")
      // normalized tf (bucket share of the doc's tokens): unit-scale
      // features keep the GD step sizes in q124's regime
      .select(col("doc_id"),
        concat(array(lit(1.0)),
          transform(sequence(lit(0), lit(dim - 1)),
            i => coalesce(element_at(col("m"), i.cast("long")), lit(0L))
              .cast("double") / col("tot"))).as("x"),
        col("y"))
  }

  /** Linear TEXT CLASSIFIER trained wholly in the engine (q156): the
    * q124 batch-GD machinery over STANDARDIZED hashed-TF features.
    * Per-bucket μ/σ come from one corpus aggregate, ROUNDED 6 dp (the
    * trainer-family trajectory quantum — every engine-crossing
    * parameter is quantized: μ, σ, then each iterate's avg-gradient),
    * z-scores and the σ(w·x) dot product are per-row deterministic
    * arithmetic in fixed array order, so the entire training run +
    * confusion matrix is replayed by an unrolled-CTE SQL oracle.
    * Standardization is what makes 5 plain GD steps actually learn
    * the gate (raw shares are tiny against the bias pull — measured:
    * unstandardized runs collapse to the majority class).
    * Scale shape: one stats pass, one scan per iteration with a
    * map-side-combined (dim+1)-group gradient aggregate, μ/σ/weights
    * as broadcast literals — the model is parameter-sized, the corpus
    * never moves.
    */
  def textClassifierGd(spark: SparkSession, sfDir: String,
      lr: Double = 1.0, iters: Int = 5, dim: Int = 16): DataFrame = {
    val raw = textFeatures(spark, sfDir, dim).persist()
    // per-bucket μ/σ_pop over the share features (pos 0 is the bias),
    // rounded to the 6 dp parameter grid; σ floors at the quantum so
    // a constant bucket can't divide by zero (oracle mirrors both)
    val statRows = raw
      .select(posexplode(col("x")).as(Seq("pos", "xj")))
      .filter(col("pos") > 0)
      .groupBy("pos")
      .agg(round(avg("xj"), 6).as("mu"),
        round(stddev_pop("xj"), 6).as("sd"),
        count(lit(1)).as("n"))
      .collect()
    val stats = statRows
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val mus = stats.map(_._2)
    val sds = stats.map(s => math.max(s._3, 1e-6))
    // the GD loop runs `iters` jobs over this cache, and each job's
    // fixed cost scales with its TASK count — at fixture scale the
    // session-default partitioning (= cores) schedules 32 tasks per
    // iteration for a few thousand cached rows. Size the cache from
    // the data instead (~1M rows per partition, floor 4): the loop is
    // scheduling-bound at small n and scan-bound at large n, and this
    // serves both (coalesce never raises the count above the parent's)
    val n = statRows.headOption.map(_.getLong(3)).getOrElse(0L)
    val nParts = math.max(4L, n / 1000000L)
      .min(Int.MaxValue.toLong).toInt
    val e = raw.select(col("y"),
        concat(array((lit(1.0) +: (1 to dim).map(j =>
          (element_at(col("x"), j + 1) - lit(mus(j - 1))) /
            lit(sds(j - 1)))): _*)).as("x"))
      .coalesce(nParts)
      .persist()
    val w = logregWeights(e, lr, iters)
    val out = e.select(col("y"),
        when(logregSigma(typedlit(w)) >= 0.5, 1).otherwise(0).as("pred"),
        logregSigma(typedlit(w)).as("p"))
      .groupBy("y", "pred")
      .agg(count(lit(1)).as("n"), round(avg("p"), 4).as("avg_p"))
      .orderBy("y", "pred")
    // 4-row report — materialize, then release both caches
    val rows = out.collect().toSeq
    raw.unpersist(false)
    e.unpersist(false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), out.schema)
  }
}
