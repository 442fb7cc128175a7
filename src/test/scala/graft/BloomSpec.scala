package graft

import org.apache.spark.sql.functions._
import graft.functions.{BloomFunctions, BloomKernel}
import graft.operators.Pipeline

class BloomSpec extends SparkSpec {

  test("kernel: no false negatives ever; FPR near the design point") {
    val m = 1 << 14 // 16 Kbit, k=7 → FPR ≈ 0.8% at n=1000
    val bits = new Array[Long](m / 64)
    val rng = new scala.util.Random(11)
    val inserted = Seq.fill(1000)(rng.nextLong()).distinct
    inserted.foreach(BloomKernel.set(bits, m, 7, _))
    assert(inserted.forall(BloomKernel.contains(bits, m, 7, _)),
      "bloom must never miss an inserted key")
    val absent = Seq.fill(20000)(rng.nextLong()).filterNot(inserted.contains)
    val fpr = absent.count(BloomKernel.contains(bits, m, 7, _)).toDouble /
      absent.size
    // (1 − e^{−kn/m})^k ≈ 0.008 here; generous ceiling for sampling noise
    assert(fpr < 0.02, s"FPR $fpr far above design point")
  }

  test("bloom_agg is partition-invariant (merge = bitwise OR)") {
    import spark.implicits._
    val keys = (1L to 5000L).toDF("k")
    def build(parts: Int): Array[Byte] = keys.repartition(parts)
      .agg(BloomFunctions.bloom_agg(col("k")).as("b"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(build(1), build(16)),
      "sketch must not depend on the plan's partitioning")
  }

  test("bloom_might_contain agrees with the aggregate's contents") {
    import spark.implicits._
    val sketch = (1L to 100L).toDF("k")
      .agg(BloomFunctions.bloom_agg(col("k")).as("b"))
      .collect()(0).getAs[Array[Byte]](0)
    val probed = (1L to 200L).toDF("k")
      .filter(BloomFunctions.bloom_might_contain(sketch, col("k")))
      .collect().map(_.getLong(0)).toSet
    assert((1L to 100L).toSet.subsetOf(probed), "false negative")
    // at m=2^20/k=7 with n=100 the FPR is ~1e-30: no extras expected
    assert(probed == (1L to 100L).toSet, s"extras: ${probed -- (1L to 100L)}")
  }

  test("bloom functions are SQL-registered") {
    // build via SQL bloom_agg, probe via SQL bloom_might_contain with
    // the sketch inlined as a hex binary literal (the probe requires a
    // foldable filter — the driver-collected-parameter pattern)
    val sketch = spark.sql(
      """SELECT bloom_agg(k, 65536, 7) AS b
        |FROM VALUES (1L), (2L), (3L) AS t(k)""".stripMargin)
      .collect()(0).getAs[Array[Byte]](0)
    val hex = sketch.map(b => f"$b%02X").mkString
    val r = spark.sql(
      s"""SELECT bloom_might_contain(X'$hex', 2L) AS hit,
         |       bloom_might_contain(X'$hex', 99L) AS miss
         |""".stripMargin).collect()(0)
    assert(r.getBoolean(0))
    assert(!r.getBoolean(1))
  }

  test("q62 bloom contamination ≡ q48 exact contamination") {
    val exact = Pipeline.contamination(spark, sf)
      .collect().map(_.toSeq).toSeq
    val bloom = Pipeline.bloomContamination(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(bloom == exact)
    assert(exact.nonEmpty, "fixture should contain contaminated docs")
  }

  test("probe fuses into the scan stage (whole-stage codegen survives)") {
    import spark.implicits._
    val sketch = (1L to 10L).toDF("k")
      .agg(BloomFunctions.bloom_agg(col("k")).as("b"))
      .collect()(0).getAs[Array[Byte]](0)
    // spark.range, not a local Seq: ConvertToLocalRelation would fold
    // a LocalRelation filter at optimization time, leaving no stage
    val plan = spark.range(1, 101).select(col("id").as("k"))
      .filter(BloomFunctions.bloom_might_contain(sketch, col("k")))
      .queryExecution.executedPlan.toString
    // '*(n)' prefix = operator inside a WholeStageCodegen region (the
    // PlanSpec idiom); a CodegenFallback probe would strip it
    val filterLine = plan.linesIterator
      .find(_.contains("bloom_might_contain")).get
    assert(filterLine.trim.matches("""^[+:\-\s]*\*\(\d+\).*"""),
      s"bloom probe demoted the stage to interpreted:\n$plan")
  }
}
