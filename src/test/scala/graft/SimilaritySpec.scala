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

  test("blockedEmbeddingPairs ≡ brute force (every pair, exactly once)") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val exact = Similarity.embeddingPairs(spark, sf, 0.4)
      .collect().map(key).toSeq
    val blocked = Similarity.blockedEmbeddingPairs(spark, sf, 0.4)
      .collect().map(key).toSeq
    // Seq equality (not Set): a pair double-counted by the grid would
    // surface as a duplicate row here
    assert(blocked == exact, s"blocked ≠ exact:\n${blocked.diff(exact)}")
    // block count must not change the answer (grid shape is a pure
    // granularity knob)
    val b3 = Similarity.blockedEmbeddingPairs(spark, sf, 0.4, numBlocks = 3)
      .collect().map(key).toSeq
    assert(b3 == exact)
  }

  test("embeddingLshPairs: full recall vs brute force at τ=0.4") {
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1))
    val exact = Similarity.embeddingPairs(spark, sf, 0.4)
      .select("ai", "bi").collect().map(key).toSet
    val lsh = Similarity.embeddingLshPairs(spark, sf, 0.4, 256, 4)
      .select("ai", "bi").collect().map(key).toSet
    // exact-cosine verification ⇒ lsh ⊆ exact always; at 64 bands of
    // 4 bits a τ=0.4 pair shares a band with p ≈ 1-(1-0.631^4)^64 ≈
    // 0.99998 — but the candidate rate at this weakly-separated
    // threshold is why q50 ships the blocked-exact path instead
    assert(lsh.subsetOf(exact))
    assert(lsh == exact, s"missed ${exact -- lsh}")
  }

  test("quantize_i8: codes bounded, zero vector safe, scale cancels in cosine") {
    import spark.implicits._
    import graft.functions.VectorMath.{dot_product_i8, quantize_i8}
    val vs = Seq(
      Seq(1.0, -2.0, 3.0, -4.0),
      Seq(0.5, 0.25, -0.125, 0.0),
      Seq(0.0, 0.0, 0.0, 0.0), // all-zero: no division, quantizes to zeros
      Seq(100.0, -100.0, 50.0, -50.0))
    val rows = vs.toDF("v")
      .select(col("v"), quantize_i8(col("v")).as("q"))
      .select(col("v"), col("q"),
        dot_product_i8(col("q"), col("q")).as("qq")).collect()
    rows.foreach { r =>
      val q = r.getSeq[Byte](1)
      assert(q.forall(b => b >= -127 && b <= 127))
      val mx = r.getSeq[Double](0).map(math.abs).max
      if (mx == 0) assert(q.forall(_ == 0) && r.getLong(2) == 0L)
      else assert(q.map(b => math.abs(b.toInt)).max == 127) // max maps to ±127
    }
    // cosine over codes tracks cosine over floats (scale cancels; only
    // rounding error remains, bounded by ~1/127 per element)
    val a = Seq(1.0, 2.0, 3.0)
    val b = Seq(2.0, 3.0, 9.0)
    val cos = Seq((a, b)).toDF("a", "b").select(
      Similarity.cosine(col("a"), col("b")).as("exact"),
      (dot_product_i8(quantize_i8(col("a")), quantize_i8(col("b")))
        .cast("double") /
        (sqrt(dot_product_i8(quantize_i8(col("a")), quantize_i8(col("a")))
          .cast("double")) *
          sqrt(dot_product_i8(quantize_i8(col("b")), quantize_i8(col("b")))
            .cast("double")))).as("quant")).collect()(0)
    assert(math.abs(cos.getDouble(0) - cos.getDouble(1)) < 0.02)
  }

  test("quantize_i8: non-finite elements yield NULL, even from non-nullable input") {
    import spark.implicits._
    import graft.functions.VectorMath.quantize_i8
    // array(non-nullable cols) is a NON-nullable child — the kernel
    // must still be able to report null (and the codegen path must
    // compile) when an element is NaN/Inf
    val rows = Seq((1.0, 2.0), (1.0, Double.NaN), (Double.PositiveInfinity, 0.0))
      .toDF("a", "b")
      .select(quantize_i8(array(col("a"), col("b"))).as("q")).collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
  }

  test("quantize_i8: property — per-element error bounded by half a step") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters, Passed}
    import org.apache.spark.sql.catalyst.util.ArrayData
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
    val prop = Prop.forAll(vecGen) { v =>
      val mx = v.map(math.abs).max
      val lit = org.apache.spark.sql.catalyst.expressions.Literal
        .create(v, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))
      val codes = graft.functions.QuantizeI8(lit).eval(null)
        .asInstanceOf[ArrayData].toByteArray()
      if (mx == 0) codes.forall(_ == 0)
      else codes.zip(v).forall { case (c, x) =>
        // dequantized value within half a quantization step (+eps)
        math.abs(c * mx / 127.0 - x) <= mx / 127.0 * 0.5 + 1e-9 * mx
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.status == Passed, res.status.toString)
  }

  test("quantizedTopK recalls most of the exact float top-k") {
    val exact = Similarity.cosineTopK(spark, sf, 0L, 20)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val quant = Similarity.quantizedTopK(spark, sf, 0L, 20)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall $recall too low")
  }

  test("embeddingLshPairs plan is bucketed: no BroadcastNestedLoopJoin") {
    val plan = Similarity.embeddingLshPairs(spark, sf, 0.4, 256, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"LSH pair path must be equality-join bucketed:\n$plan")
    assert(plan.contains("random_projection_band_keys"))
  }

  test("ivfTopKIndexed: persisted index probe is partition-pruned and " +
      "bit-identical to the in-memory form") {
    val inMem = Similarity.ivfTopK(spark, sf).collect().toSeq
    val indexed = Similarity.ivfTopKIndexed(spark, sf)
    assert(indexed.collect().toSeq == inMem,
      "the persisted-index probe must serve the identical answer")
    // the cell predicate must be PARTITION pruning (directory
    // metadata), not a data filter: nProbe=8 of numCells=16 dirs
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("cell"),
      s"cell predicate must land in PartitionFilters:\n$plan")
    // minority of files visited: the executed scan's numFiles metric
    // vs the index's total data files on disk
    import org.apache.spark.sql.execution.FileSourceScanExec
    val qe = indexed.queryExecution
    qe.executedPlan.executeCollect() // populate scan metrics
    val scans = qe.executedPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, plan)
    val visited = scans.map(_.metrics("numFiles").value).sum
    val (dataPath, _) = Similarity.ensureIvfIndex(spark, sf)
    val total = java.nio.file.Files.walk(
      java.nio.file.Paths.get(dataPath)).iterator()
    var totalFiles = 0
    while (total.hasNext) {
      val p = total.next()
      val n = p.getFileName.toString
      if (n.startsWith("part-") && !n.endsWith(".crc")) totalFiles += 1
    }
    assert(visited > 0 && visited < totalFiles,
      s"probe must open a strict minority of index files: " +
        s"$visited of $totalFiles")
    // a changed corpus fingerprint would rebuild; an unchanged one
    // reuses the on-disk layout (idempotent second call)
    val again = Similarity.ivfTopKIndexed(spark, sf).collect().toSeq
    assert(again == inMem)
  }

  test("blockedEmbeddingPairs plan: equality join on the grid cell, no BNLJ") {
    val plan = Similarity.blockedEmbeddingPairs(spark, sf, 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"blocked pair path must be an equality join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("knnJoin ≡ window spelling; plan has no window sort") {
    import org.apache.spark.sql.expressions.Window
    val got = Similarity.knnJoin(spark, sf, numQueries = 8, k = 5)
    val rows = got.collect()
    assert(rows.length == 8 * 5)
    // the composable spelling: score all pairs, row_number window
    val e = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy("q_id")
      .orderBy(desc("cosine"), asc("neighbor_id"))
    val expected = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(Similarity.cosine(col("v"), col("qv")), 4).as("cosine"))
      .withColumn("rk", row_number().over(w).cast("int"))
      .filter(col("rk") <= 5)
      .orderBy("q_id", "rk")
      .collect()
    assert(rows.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq)
    // the point of the aggregate: no WindowExec anywhere in the plan
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"knnJoin must not window-sort:\n$plan")
  }

  test("q77 semanticKept ≡ union-find over exact pairs; singletons kept") {
    val kept = Similarity.semanticKept(spark, sf, 0.4).collect()
      .map(_.getLong(0)).toSet
    // independent replica: union-find on the brute-force pair list
    val pairs = Similarity.embeddingPairs(spark, sf, 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val all = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val want = all.filter(id => find(id) == id)
    assert(kept == want,
      s"extra=${kept -- want} missing=${want -- kept}")
    // every dropped vector has a kept near-neighbor (the dedup contract)
    val dropped = all -- kept
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    dropped.foreach { d =>
      assert(find(d) != d && kept.contains(find(d)),
        s"dropped $d has no kept representative")
    }
    assert(dropped.forall(d => adj(d).nonEmpty))
  }

  test("lshPairs production regime: planted near-dups at bandBits=8") {
    import spark.implicits._
    // 60 well-spread base vectors + a planted >0.9-cosine near-dup of
    // each: the regime embedding dedup actually runs at (τ=0.9, 8-bit
    // bands: pair caught with p ≈ 1-(1-0.856^8)^16 ≈ 0.996)
    val rng = new scala.util.Random(7)
    val dim = 32
    val base = Seq.fill(60)(Seq.fill(dim)(rng.nextGaussian()))
    val rows = base.zipWithIndex.flatMap { case (v, i) =>
      val noisy = v.map(x => x + rng.nextGaussian() * 0.05)
      Seq((i.toLong * 2, v), (i.toLong * 2 + 1, noisy))
    }
    val df = rows.toDF("vec_id", "v")
    val found = Similarity.lshPairs(df, 0.9, 128, 8)
      .select("ai", "bi").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactPlanted = df.as("a").join(df.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Similarity.cosine(col("a.v"), col("b.v")).as("c"))
      .filter(col("c") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPlanted.size >= 50, "fixture should plant many near-dups")
    val recall = (found & exactPlanted).size.toDouble / exactPlanted.size
    info(s"planted near-dup recall at bandBits=8: $recall")
    assert(recall >= 0.95, s"recall collapsed: $recall")
  }

  test("q123 embeddingClusters matches a local union-find over the pairs") {
    val pairs = Similarity.blockedEmbeddingPairs(spark, sf, threshold = 0.4)
      .select("ai", "bi").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should have near-dup pairs at τ=0.4")
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.map(id => (id, find(id), id == find(id)))
      .sortBy(_._1).toSeq
    val got = Similarity.embeddingClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == expected, s"membership diverged:\n$got\nvs\n$expected")
    // the representative is the component minimum, so it is a member
    val reps = got.map(_._2).toSet
    assert(reps.subsetOf(got.map(_._1).toSet))
  }

  test("q125 pcaPowerIteration replays a local power-iteration trajectory") {
    import graft.sources.Tables
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Tables.load(spark, sf, "embeddings")
      .select(col("embedding").cast("array<double>"), col("label"))
      .collect().map(r => (r.getSeq[Double](0).toArray, r.getInt(1)))
    val dim = rows.head._1.length
    val mean = Array.tabulate(dim)(j =>
      r6(rows.map(_._1(j)).sum / rows.length))
    val cs = rows.map { case (x, l) =>
      (x.lazyZip(mean).map(_ - _).toArray, l)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    var v = Array.fill(dim)(r6(1.0 / math.sqrt(dim.toDouble)))
    for (_ <- 1 to 3) {
      val u = Array.tabulate(dim) { j =>
        cs.map { case (c, _) => c(j) * dot(c, v) }.sum
      }
      val nrm = math.sqrt(u.foldLeft(0.0)((a, x) => a + x * x))
      v = u.map(x => r6(x / nrm))
    }
    val expected = cs.groupBy(_._2).map { case (l, g) =>
      val ps = g.map { case (c, _) => dot(c, v) }
      (l, g.length.toLong, r4(ps.sum / ps.length),
        r4(ps.map(p => p * p).sum / ps.length))
    }.toSeq.sortBy(_._1)
    val got = Similarity.pcaPowerIteration(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got.map(_._2).sum == rows.length, "every vector projected once")
    assert(got == expected, s"trajectory diverged:\n$got\nvs\n$expected")
    // a power iterate is unit-length up to the rounding quantum
    val vn = math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
    assert(math.abs(vn - 1.0) < 1e-4, s"iterate not normalized: $vn")
  }

  test("q120 lloydClusters replays a local Lloyd trajectory exactly") {
    import graft.sources.Tables
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val k = 8
    var cents: Map[Int, Array[Double]] = vecs.filter(_._1 < k)
      .map { case (id, v) => id.toInt -> v.map(r6) }.toMap
    // same distance formula and summation order as the operator:
    // ‖v‖² − 2·v·c + ‖c‖², dots left-folded over array order
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def assign(v: Array[Double]): Int =
      (0 until k).map { cid =>
        val c = cents(cid)
        (dot(v, v) - 2.0 * dot(v, c) + dot(c, c), cid)
      }.min._2
    for (_ <- 1 to 3) {
      val byCluster = vecs.groupBy { case (_, v) => assign(v) }
      cents = cents.map { case (cid, prev) =>
        cid -> byCluster.get(cid).fold(prev) { members =>
          val dim = members.head._2.length
          Array.tabulate(dim) { d =>
            r6(members.map(_._2(d)).sum / members.length)
          }
        }
      }
    }
    val expected = vecs.groupBy { case (_, v) => assign(v) }.toSeq
      .map { case (cid, members) =>
        val nrm = BigDecimal(math.sqrt(dot(cents(cid), cents(cid))))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (cid, members.length.toLong, nrm)
      }.sortBy(_._1)
    val got = operators.Similarity.lloydClusters(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(_._2).sum == vecs.length, "every vector assigned once")
    assert(got == expected, s"trajectory diverged:\n$got\nvs\n$expected")
  }
}
