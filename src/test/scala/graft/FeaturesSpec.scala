package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Features
import graft.plans.CardinalityEstimator
import graft.sources.Tables

class FeaturesSpec extends SparkSpec {

  test("P4: schema-metadata column selection by declared type") {
    val s = Tables.lineitem
    assert(Features.columnsOfType(s, StringType) ==
      Seq("l_returnflag", "l_linestatus"))
    assert(Features.columnsOfType(s, StringType, Set("l_returnflag")) ==
      Seq("l_linestatus"))
    assert(Features.columnsOfType(s, DoubleType).size == 4)
  }

  test("F1+ndv*5: hash buckets sized from the estimator stay in range") {
    val ev = Tables.load(spark, sf, "events")
    val vocab = CardinalityEstimator.vocabSizes(ev, Seq("event_type"))
    val buckets = CardinalityEstimator.bucketSizes(vocab) // 5*5=25
    val df = ev.select(
      Features.hashBucket("event_type", buckets("event_type")))
    val Array(mn, mx) = df.agg(min("event_type_bucket"),
      max("event_type_bucket")).collect()(0).toSeq
      .map(_.asInstanceOf[Int]).toArray
    assert(mn >= 0 && mx < 25)
    // 5 distinct types -> at most 5 distinct buckets, deterministic
    assert(df.distinct().count() <= 5)
  }

  test("P2: features/label split drops bookkeeping and packs a struct") {
    val df = graft.operators.Estimators.labeledEvents(spark, sf)
    val split = Features.featuresLabelSplit(df, "label",
      Map("event_type" -> 25L), dropCols = Set("event_id"))
    assert(split.columns.toSeq == Seq("features", "label"))
    val featNames = split.schema("features").dataType
      .asInstanceOf[StructType].fieldNames.toSeq
    assert(featNames == Seq("value_num", "event_type_bucket"))
    assert(!featNames.exists(_.contains("event_id"))) // dropped
    assert(split.select("label").distinct().count() == 2)
  }

  test("E2: DNN classifier learns the derivable label") {
    val auc = graft.operators.Estimators.trainEvalDnn(spark, sf)
    info(s"DNN areaUnderROC = $auc")
    assert(auc > 0.9, s"DNN failed to learn: AUC=$auc")
  }

  test("S1: path glob expands to the matching files") {
    val df = spark.read.schema(Tables.documents)
      .parquet(s"$sf/doc*.parquet") // glob, not a literal path
    assert(df.count() == Tables.load(spark, sf, "documents").count())
  }

  test("S8: SQL API surface over registered views") {
    Tables.schemas.keys.foreach { t =>
      Tables.load(spark, sf, t).createOrReplaceTempView(s"sql_$t")
    }
    val top = spark.sql(
      """SELECT event_type, round(sum(value), 4) AS total
        |FROM sql_events GROUP BY event_type
        |ORDER BY total DESC LIMIT 3""".stripMargin).collect()
    assert(top.length == 3)
    val joined = spark.sql(
      """SELECT n_name, count(*) AS n FROM sql_customer
        |JOIN sql_nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n DESC LIMIT 1""".stripMargin).collect()
    assert(joined.nonEmpty)
  }
}
