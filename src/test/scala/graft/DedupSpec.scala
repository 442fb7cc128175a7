package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

class DedupSpec extends SparkSpec {

  test("wordShingles: count and order-sensitivity") {
    import spark.implicits._
    val df = Seq("a b c d e", "e d c b a", "x y").toDF("text")
    val sh = df.select(Dedup.wordShingles(col("text")).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0) == Seq("a b c", "b c d", "c d e"))
    assert(sh(1) == Seq("e d c", "d c b", "c b a")) // order matters
    assert(sh(2) == Seq("x y")) // short-doc guard
  }

  test("intersect_count_at_least: property — bound never changes the answer") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters, Passed}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val arrGen = Gen.listOf(Gen.choose(0L, 40L)).map(_.distinct.sorted)
    val prop = Prop.forAll(arrGen, arrGen, Gen.choose(0L, 20L)) {
      (a: List[Long], b: List[Long], req: Long) =>
        val exact = a.toSet.intersect(b.toSet).size.toLong
        val lit = (x: List[Long]) => Literal.create(x, ArrayType(LongType))
        val got = graft.functions.IntersectCountAtLeast(
          lit(a), lit(b), Literal(req)).eval(null).asInstanceOf[Long]
        if (exact >= req) got == exact else got == -1L
    }
    val res = check(Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.status == Passed, res.status.toString)
  }

  test("intersect_count_at_least: exact when reachable, -1 only below bound") {
    import spark.implicits._
    import graft.functions.VectorMath.{intersect_count_at_least, intersect_count_sorted}
    // every (pair, required) cell: sorted-distinct arrays of varied
    // overlap, required swept past the true intersection size
    val pairs = Seq(
      (Seq(1L, 2L, 3L, 4L, 5L), Seq(3L, 4L, 5L, 6L, 7L)), // inter 3
      (Seq(1L, 2L, 3L), Seq(10L, 20L, 30L)), // disjoint
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)), // identical
      (Seq.empty[Long], Seq(1L, 2L)), // empty side
      (Seq(1L, 5L, 9L, 13L), Seq(2L, 5L, 9L, 14L, 15L))) // inter 2
    val df = pairs.toDF("a", "b")
    (0L to 5L).foreach { req =>
      val rows = df.select(
        intersect_count_sorted(col("a"), col("b")).as("exact"),
        intersect_count_at_least(col("a"), col("b"), lit(req)).as("bounded"))
        .collect()
      rows.foreach { r =>
        val (exact, bounded) = (r.getLong(0), r.getLong(1))
        if (exact >= req) assert(bounded == exact,
          s"req=$req: bounded=$bounded should equal exact=$exact")
        else assert(bounded == -1L,
          s"req=$req: bounded=$bounded should be -1 (exact=$exact)")
      }
    }
  }

  test("word_ngram_hashes kernel equals the composable shingle pipeline") {
    val docs = Tables.load(spark, sf, "documents")
    val diff = docs.select(
        graft.functions.VectorMath.word_ngram_hashes(col("text"), 3)
          .as("fast"),
        graft.functions.VectorMath.xxhash64_array(
          Dedup.wordShingles(col("text"), 3)).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("exactDedup keeps one row per distinct text") {
    val docs = Tables.load(spark, sf, "documents")
    val nDistinct = docs.select("text").distinct().count()
    val dedup = Dedup.exactDedup(spark, sf)
    assert(dedup.count() == nDistinct)
    assert(dedup.agg(sum("n_copies")).collect()(0).getLong(0) == docs.count())
  }

  /** Ground truth: all pairs with exact shingle jaccard >= t (O(n²),
    * test-scale only).
    */
  private def bruteForcePairs(t: Double): DataFrame = {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), Dedup.wordShingles(col("text")).as("sh"))
    docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ai"), col("b.doc_id").as("bi"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("j"))
      .filter(col("j") >= t)
  }

  test("minhashPairs recall: finds every true pair >= 0.8 jaccard") {
    val truth = bruteForcePairs(0.8).select("ai", "bi").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.minhashPairs(spark, sf).select("ai", "bi").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "corpus should contain planted near-dups")
    // verification step filters to >= 0.8, so found ⊆ truth always
    assert(found.subsetOf(truth))
    // LSH at b=12,r=6 catches j>=0.8 with p≈0.97 per pair (and
    // >0.9999 at j>=0.9, where the planted near-dups live)
    assert(found == truth,
      s"missed ${truth -- found}, extra ${found -- truth}")
  }

  test("prefixJaccardPairs ≡ blocking-free brute force, equality-join plan") {
    val truth = bruteForcePairs(0.8).select("ai", "bi").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val q = Dedup.prefixJaccardPairs(spark, sf)
    val found = q.select("ai", "bi").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // prefix filtering is exact (not probabilistic): the df-ordered
    // prefix lemma guarantees every j≥τ pair shares a prefix token
    assert(found == truth,
      s"missed ${truth -- found}, extra ${found -- truth}")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("simhashPairs: candidates agree with brute-force hamming") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        graft.functions.SimHashFunctions.simhash64(
          Dedup.shingleHashes(col("text"))).as("sig"))
    val truth = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ai"), col("b.doc_id").as("bi"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("h"))
      .filter(col("h") <= 3)
      .select("ai", "bi").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.simhashPairs(spark, sf).select("ai", "bi").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 4 bands of 16 bits catch hamming<=3 pairs exactly (pigeonhole)
    assert(found == truth, s"missed ${truth -- found}, extra ${found -- truth}")
    assert(found.nonEmpty, "planted near-dups should collide")
  }

  test("resolveClusters: transitive chains collapse to min-id reps") {
    import spark.implicits._
    // two clusters: {1,2,3} via chain 1-2, 2-3; {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("ai", "bi")
    // both regimes must implement the same contract: the local
    // union-find finish (default cutover) and the distributed
    // min-label loop (forced by localEdgeLimit = 0)
    for (limit <- Seq(4000000L, 0L)) {
      val got = Dedup.resolveClusters(pairs, localEdgeLimit = limit)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(got(1L) == ((1L, true)), s"limit=$limit")
      assert(got(2L) == ((1L, false)), s"limit=$limit")
      assert(got(3L) == ((1L, false)), s"limit=$limit") // transitive
      assert(got(10L) == ((10L, true)), s"limit=$limit")
      assert(got(11L) == ((10L, false)), s"limit=$limit")
    }
  }

  test("q158: substring duplication profile matches a driver replica") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wins = docs.flatMap { case (id, t) =>
      if (t.length < 32) Nil
      else (0 to t.length - 32 by 16).map(p => (id, t.substring(p, p + 32)))
    }
    val dupSet = wins.groupBy(_._2)
      .filter(_._2.map(_._1).distinct.size > 1).keySet
    val want = wins.groupBy(_._1).map { case (id, ws) =>
      id -> (ws.size.toLong, ws.count(w => dupSet(w._2)).toLong)
    }
    // the raw-string spelling is the oracle's literal twin…
    val got = Dedup.substringDedup(spark, sf, hashKeys = false).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    // the fixture's exact-dup docs make this non-vacuous: some doc
    // must report duplicated windows
    assert(want.values.exists(_._2 > 0L), "no cross-doc window found")
    assert(want.values.exists(v => v._2 < v._1),
      "profile must distinguish partial duplication")
    // …and the REGISTERED default (hashed 8-byte keys across both
    // shuffles — the 100 TB spelling) reports the identical profile
    val hashed = Dedup.substringDedup(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hashed == want)
  }

  test("resolveClusters: local finish ≡ distributed loop on real pairs") {
    val pairs = Dedup.minhashPairs(spark, sf).select("ai", "bi")
    def run(limit: Long) =
      Dedup.resolveClusters(pairs, localEdgeLimit = limit).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(run(4000000L) == run(0L))
  }

  test("dedupDecisions: every cluster keeps exactly one doc") {
    val df = Dedup.dedupDecisions(spark, sf)
    val perCluster = df.groupBy("cluster_rep")
      .agg(sum(col("keep").cast("int")).as("n_kept"),
        count(lit(1)).as("sz"))
    assert(perCluster.filter(col("n_kept") =!= 1).count() == 0)
    assert(perCluster.filter(col("sz") < 2).count() == 0)
  }

  test("saltedJoin equals plain join") {
    val li = Tables.load(spark, sf, "lineitem")
      .withColumnRenamed("l_orderkey", "k")
    val ord = Tables.load(spark, sf, "orders")
      .withColumnRenamed("o_orderkey", "k")
      .select("k", "o_totalprice")
    val plain = li.join(ord, Seq("k")).agg(
      count(lit(1)), sum("o_totalprice")).collect()(0)
    val salted = graft.operators.Skew.saltedJoin(li, ord, "k", salt = 8)
      .agg(count(lit(1)), sum("o_totalprice")).collect()(0)
    assert(plain.getLong(0) == salted.getLong(0))
    assert(math.abs(plain.getDouble(1) - salted.getDouble(1)) < 1e-6)
  }

  test("saltedJoin rejects join types that would duplicate small rows") {
    val li = Tables.load(spark, sf, "lineitem").withColumnRenamed("l_orderkey", "k")
    val ord = Tables.load(spark, sf, "orders").withColumnRenamed("o_orderkey", "k")
    intercept[IllegalArgumentException] {
      graft.operators.Skew.saltedJoin(li, ord, "k", 8, "right_outer")
    }
    intercept[IllegalArgumentException] {
      graft.operators.Skew.saltedJoin(li, ord, "k", 8, "full")
    }
  }

  test("ngramJaccardPairs matches brute force within blocking reach") {
    val blocked = Dedup.ngramJaccardPairs(spark, sf).select("ai", "bi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), floor(col("n_chars") / 32).as("blk"))
    val blkOf = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truthInReach = bruteForcePairs(0.8).select("ai", "bi").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => math.abs(blkOf(a) - blkOf(b)) <= 1 }.toSet
    assert(blocked == truthInReach)
    assert(blocked.nonEmpty)
  }
}
