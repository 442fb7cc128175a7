package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {

  test("cosine: unit/orthogonal/opposite sanity") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0)),
      (Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("a", "b")
    val got = df.select(round(Similarity.cosine(col("a"), col("b")), 6))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(1.0, 0.0, -1.0, 1.0))
  }

  test("dot_product: null elements and ragged lengths yield NULL") {
    import spark.implicits._
    import graft.functions.VectorMath.dot_product
    val df = Seq(1).toDF("x").select(
      dot_product(array(lit(1.0), lit(null).cast("double")),
        array(lit(2.0), lit(3.0))).as("with_null"),
      dot_product(array(lit(1.0)), array(lit(2.0), lit(3.0))).as("ragged"),
      dot_product(array(lit(1.0), lit(2.0)),
        array(lit(3.0), lit(4.0))).as("dense"))
    val r = df.collect()(0)
    assert(r.isNullAt(0), "null element must not be treated as 0")
    assert(r.isNullAt(1), "ragged lengths must not silently truncate")
    assert(r.getDouble(2) == 11.0)
  }

  test("cosineTopK: k rows, descending, self excluded") {
    val rows = Similarity.cosineTopK(spark, sf, vecId = 0L, k = 20).collect()
    assert(rows.length == 20)
    assert(!rows.map(_.getLong(0)).contains(0L))
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(scores.forall(s => s >= -1.0001 && s <= 1.0001))
  }

  test("ivfTopK: probes a subset yet recalls most of the exact top-k") {
    val exact = Similarity.cosineTopK(spark, sf, 0L, 20).collect()
      .map(_.getLong(0)).toSet
    val ann = Similarity.ivfTopK(spark, sf, 0L, 20, numCells = 16, nProbe = 8)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    info(s"IVF recall@20 (nProbe=8/16, near-random vectors): $recall")
    assert(recall >= 0.3, s"recall collapsed: $recall")
    // probing everything must recover the exact answer
    val full = Similarity.ivfTopK(spark, sf, 0L, 20, numCells = 16,
      nProbe = 16).collect().map(_.getLong(0)).toSet
    assert(full == exact)
  }

  test("IVF scale layout: cell-partitioned write prunes at read (SCALE.md)") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf").toString
    val (assigned, centers) = Similarity.ivfAssignments(spark, sf, 16)
    assigned.write.partitionBy("cell").mode("overwrite")
      .parquet(s"$tmp/corpus")
    // a query probing 2 cells reads only those partition directories
    val probed = Seq(0, 1)
    val pruned = spark.read.parquet(s"$tmp/corpus")
      .filter(col("cell").isin(probed: _*))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"cell filter not a partition filter:\n$plan")
    assert(pruned.count() ==
      assigned.filter(col("cell").isin(probed: _*)).count())
    assert(centers.length == 16)
  }

  test("percentile_approx sketch is partition-invariant (mergeable)") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    def p95(parts: Int) = li.repartition(parts)
      .agg(expr("percentile_approx(l_extendedprice, 0.95, 10000)"))
      .collect()(0).getDouble(0)
    assert(p95(1) == p95(16)) // same sketch whatever the plan shape
  }

  test("embeddingPairs is symmetric-free and thresholded") {
    val rows = Similarity.embeddingPairs(spark, sf, 0.4).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }
}
