package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's feature-column flow (trainer.py:256-269 +
  * transform_row trainer.py:165-168), Spark-idiomatic:
  *
  *  - pick columns by declared type from the schema (P4 — the
  *    `field_type == 'INTEGER'` / `'STRING'` predicates,
  *    trainer.py:259,266);
  *  - numeric passthrough casts (F2 — `numeric_column`);
  *  - murmur3 hash-bucket categoricals sized ndv×5 (F1 —
  *    `categorical_column_with_hash_bucket`, trainer.py:262-267; ndv
  *    from CardinalityEstimator at real scale);
  *  - split a frame into (features struct, label) and drop bookkeeping
  *    columns (P2 — `pop('label')` / `pop('row_hash')`).
  */
object Features {

  /** P4: field names of a given Spark type, minus exclusions. */
  def columnsOfType(schema: StructType, dt: DataType,
      exclude: Set[String] = Set.empty): Seq[String] =
    schema.fields.filter(f => f.dataType == dt && !exclude(f.name))
      .map(_.name).toSeq

  /** F2: numeric feature — double passthrough. */
  def numericFeature(name: String): Column =
    col(name).cast("double").as(s"${name}_num")

  /** F1: murmur3 hash bucket in [0, nBuckets) — Spark's native
    * codegen'd hash (seed 42), the engine's equivalent of the
    * reference's string hash bucketing. Takes Long so
    * CardinalityEstimator.bucketSizes composes directly; murmur3 is a
    * 32-bit hash, so the domain is capped at Int.MaxValue.
    */
  def hashBucket(name: String, nBuckets: Long): Column = {
    require(nBuckets > 0 && nBuckets <= Int.MaxValue,
      s"bucket domain must fit an int, got $nBuckets")
    pmod(hash(col(name)), lit(nBuckets.toInt)).as(s"${name}_bucket")
  }

  /** Feature expressions for a frame: numerics pass through, strings
    * hash-bucket with per-column domain sizes (ndv×5 rule — the
    * output of CardinalityEstimator.bucketSizes plugs in directly).
    */
  def featureColumns(schema: StructType, bucketSizes: Map[String, Long],
      exclude: Set[String] = Set.empty): Seq[Column] = {
    val nums = (columnsOfType(schema, LongType, exclude) ++
      columnsOfType(schema, IntegerType, exclude) ++
      columnsOfType(schema, DoubleType, exclude) ++
      columnsOfType(schema, FloatType, exclude)).map(numericFeature)
    val cats = columnsOfType(schema, StringType, exclude)
      .map(c => hashBucket(c, bucketSizes.getOrElse(c, 1000L)))
    nums ++ cats
  }

  /** P2: (features, label) split — bookkeeping columns dropped, the
    * label pulled out, everything else packed into one struct.
    */
  def featuresLabelSplit(df: DataFrame, labelCol: String,
      bucketSizes: Map[String, Long],
      dropCols: Set[String] = Set.empty): DataFrame = {
    val feats = featureColumns(df.schema, bucketSizes,
      dropCols + labelCol)
    df.select(struct(feats: _*).as("features"),
      col(labelCol).cast("double").as("label"))
  }
}
