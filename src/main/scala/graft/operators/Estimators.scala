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
    val model = new Pipeline().setStages(Array(hasher, assembler, classifier))
      .fit(train)
    new BinaryClassificationEvaluator()
      .setLabelCol("label").setMetricName("areaUnderROC")
      .evaluate(model.transform(test))
  }
}
