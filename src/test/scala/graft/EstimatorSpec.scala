package graft

import graft.operators.Estimators

class EstimatorSpec extends SparkSpec {

  test("E1-E3: linear classifier learns the derivable label (AUC ~ 1)") {
    val auc = Estimators.trainEval(spark, sf)
    info(s"areaUnderROC = $auc")
    assert(auc > 0.95, s"pipeline failed to learn: AUC=$auc")
  }

  test("S2: raw binary record scan via binaryFile format") {
    // the gzipped-TFRecord analog (reference trainer.py:185-186):
    // opaque file-as-record reads for formats Spark lacks a reader for
    val df = spark.read.format("binaryFile")
      .load(s"$sf/events.parquet")
      .select("path", "length", "content")
    val r = df.collect()(0)
    assert(r.getAs[Long]("length") > 0)
    assert(r.getAs[Array[Byte]]("content").take(4).sameElements(
      "PAR1".getBytes)) // parquet magic — we really read raw bytes
  }
}
