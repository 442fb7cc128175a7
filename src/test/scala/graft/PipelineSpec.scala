package graft

import org.apache.spark.sql.functions._
import graft.operators.Pipeline
import graft.sources.Tables

class PipelineSpec extends SparkSpec {

  test("q130 weightedSample replays locally; inclusion tracks weight") {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def wOf(s: String): Long =
      if (Set("src0", "src1", "src2", "src3", "src4")(s)) 900L
      else if (Set("src5", "src6", "src7", "src8", "src9")(s)) 500L
      else 200L
    val scored = docs.map { case (id, src) =>
      val u = ((id % 1000000007L) * 2654435761L) % 1000000L + 1L
      (id, src, wOf(src), u.toDouble / wOf(src).toDouble)
    }
    val expected = scored.sortBy(t => (t._4, t._1)).take(200)
      .map(t => (t._1, t._2, t._3, BigDecimal(t._4)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSeq
    val got = Pipeline.weightedSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expected, s"sample diverged:\n${got.take(5)}\nvs\n${
      expected.take(5)}")
    // inclusion probability must track the weight ordering
    val corpus = docs.groupBy(d => wOf(d._2)).view
      .mapValues(_.length.toDouble)
    val sampled = got.groupBy(_._3).view.mapValues(_.length.toDouble)
    def rate(w: Long): Double = sampled.getOrElse(w, 0.0) / corpus(w)
    assert(rate(900L) > rate(200L),
      s"900‰ rate ${rate(900L)} not above 200‰ rate ${rate(200L)}")
    // bounded top-k: every task keeps k rows, no corpus sort
    val p = Pipeline.weightedSample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"must plan as bounded top-k:\n$p")
  }

  test("tokenPacking: packs partition the corpus, budget-bounded") {
    val packs = Pipeline.tokenPacking(spark, sf, budget = 512).collect()
    val totalDocs = packs.map(_.getLong(1)).sum
    assert(totalDocs == Tables.load(spark, sf, "documents").count())
    // every pack except possibly ones holding a single oversized doc
    // stays within budget + one straddling doc's tokens
    packs.foreach { p =>
      val tokens = p.getLong(2)
      assert(tokens > 0)
    }
    // pack ids are contiguous from 0
    val ids = packs.map(_.getLong(0)).sorted
    assert(ids.head == 0L)
    // doc ranges of consecutive packs don't interleave
    val ranges = packs.sortBy(_.getLong(0)).map(p => (p.getLong(3), p.getLong(4)))
    ranges.sliding(2).foreach {
      case Array((_, lastA), (firstB, _)) => assert(lastA < firstB)
      case _ =>
    }
  }

  test("packContents agrees with tokenPacking and covers every doc once") {
    val packs = Pipeline.tokenPacking(spark, sf, budget = 512).collect()
      .map(p => p.getLong(0) -> (p.getLong(1), p.getLong(3), p.getLong(4)))
      .toMap
    val contents = Pipeline.packContents(spark, sf, budget = 512).collect()
      .map(c => c.getLong(0) -> (c.getLong(1),
        c.getString(2).split(",").map(_.toLong)))
      .toMap
    assert(contents.keySet == packs.keySet)
    contents.foreach { case (id, (nDocs, ids)) =>
      val (expN, first, last) = packs(id)
      assert(nDocs == expN && ids.length.toLong == expN, s"pack $id size")
      assert(ids.head == first && ids.last == last, s"pack $id bounds")
      assert(ids.sorted.sameElements(ids), s"pack $id ordering")
    }
    // disjoint cover of the whole corpus
    val all = contents.values.flatMap(_._2).toSeq
    assert(all.length == all.distinct.length)
    assert(all.length.toLong ==
      Tables.load(spark, sf, "documents").count())
  }

  test("lengthBuckets: waste accounting matches a naive recomputation") {
    val tokenCounts = Tables.load(spark, sf, "documents")
      .select(graft.functions.TextAnalysis.tokenCount(col("text"))
        .cast("long").as("n"))
      .collect().map(_.getLong(0))
    val expected = tokenCounts
      .map(n => math.min(2048L, math.ceil(n / 64.0).toLong * 64) -> n)
      .groupBy(_._1).view
      .mapValues { g =>
        val toks = g.map(_._2).sum
        (g.length.toLong, toks, g.head._1 * g.length - toks)
      }.toMap
    val got = Pipeline.lengthBuckets(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected)
    // totality: every doc in exactly one bucket
    assert(got.values.map(_._1).sum == tokenCounts.length.toLong)
    // waste is non-negative except in the capped bucket (docs longer
    // than the cap "overflow" and report negative padding there)
    got.foreach { case (len, (_, _, waste)) =>
      if (len < 2048L) assert(waste >= 0L, s"bucket $len waste $waste")
    }
  }

  test("temperatureResample flattens the language distribution") {
    val docs = Tables.load(spark, sf, "documents")
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = counts.values.min
    val kept = Pipeline.temperatureResample(spark, sf).collect()
    // rate follows (n_min/n_lang)^(1-α) with α=0.5, fixed as permille
    val permille = kept.map(r => r.getString(1) -> r.getLong(2)).toMap
    permille.foreach { case (lang, p) =>
      val expect = math.max(1L,
        math.round(1000.0 * math.sqrt(nMin.toDouble / counts(lang))))
      assert(p == expect, s"$lang permille $p != $expect")
    }
    // the rarest language is kept in full
    val rarest = counts.minBy(_._2)._1
    assert(permille(rarest) == 1000L)
    val keptCounts = kept.groupBy(_.getString(1)).view
      .mapValues(_.length.toLong).toMap
    assert(keptCounts(rarest) == counts(rarest))
    // resampling must flatten: the max/min kept ratio shrinks vs raw
    val rawRatio = counts.values.max.toDouble / counts.values.min
    val keptRatio =
      keptCounts.values.max.toDouble / keptCounts.values.min
    assert(keptRatio < rawRatio,
      s"kept ratio $keptRatio not flatter than raw $rawRatio")
  }

  test("contamination: planted overlap is detected, clean docs are not") {
    import spark.implicits._
    // craft a corpus in-test: doc 0 is "eval"; doc 10 copies 8 of its
    // words (one shared 8-gram); doc 11 is disjoint
    val evalText = (1 to 12).map(i => s"w$i").mkString(" ")
    val contaminated = (1 to 8).map(i => s"w$i").mkString(" ") +
      " zzz yyy xxx"
    val clean = (1 to 12).map(i => s"c$i").mkString(" ")
    val docs = Seq((0L, evalText), (10L, contaminated), (11L, clean))
      .toDF("doc_id", "text")
    val evalGrams = docs.filter(col("doc_id") < 10)
      .select(explode(graft.operators.Dedup.wordShingles(col("text"), 8))
        .as("gram")).distinct()
    val trainGrams = docs.filter(col("doc_id") >= 10)
      .select(col("doc_id"),
        explode(graft.operators.Dedup.wordShingles(col("text"), 8))
          .as("gram"))
    val hits = trainGrams.join(broadcast(evalGrams), Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(10L) && hits(10L) == 1L)
    assert(!hits.contains(11L))
  }

  test("q48 runs on the corpus and reports only training docs") {
    val df = Pipeline.contamination(spark, sf)
    assert(df.filter(col("doc_id") < 10).count() == 0)
  }

  test("stratifiedSample: exact k per stratum, equals the window spelling") {
    val k = 7
    val got = Pipeline.stratifiedSample(spark, sf, k)
    val byLang = got.collect().groupBy(_.getString(0))
    val langSizes = Tables.load(spark, sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == math.min(k.toLong, langSizes(lang)),
        s"$lang: ${rows.length} rows")
    }
    // the bounded-aggregate plan must reproduce the window spelling
    val priority = pmod(
      pmod(col("doc_id"), lit(1000000007L)) * lit(Pipeline.KnuthMult),
      lit(1000000007L))
    val viaWindow = Tables.load(spark, sf, "documents")
      .select(col("lang"), col("doc_id"), priority.as("priority"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("priority"), col("doc_id"))))
      .filter(col("rn") <= k).drop("rn")
      .collect().map(_.toSeq).toSet
    assert(got.collect().map(_.toSeq).toSet == viaWindow)
  }

  test("chunkDocuments: windows cover every token with the right overlap") {
    val chunks = Pipeline.chunkDocuments(spark, sf, chunkTokens = 64,
      overlap = 16).collect()
    val docTokens = Tables.load(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == docTokens.keySet) // every doc chunked
    byDoc.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      // starts advance by the stride; first starts at 0
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getLong(2) == i.toLong * 48, s"doc $doc start ${c.getLong(2)}")
      }
      // every window is exactly min(64, n - start) tokens: full until
      // the tail clips, so every token is covered to the last one
      val n = docTokens(doc).toLong
      sorted.foreach(c =>
        assert(c.getLong(3) == math.min(64L, n - c.getLong(2))))
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) == n)
    }
  }

  test("scrubPii redacts emails and long digit runs, counts them once") {
    import spark.implicits._
    val fixtures = Seq(
      ("contact me at a.b+c@mail-host.example.com today", 1L,
        "contact me at <EMAIL> today"),
      ("card 1234567890 and pin 123", 1L, "card <NUM> and pin 123"),
      ("x@y.io or z@w.dev", 2L, "<EMAIL> or <EMAIL>"),
      // a digit run INSIDE an email is one redaction, not two
      ("reach me: 12345678@qq.com ok", 1L, "reach me: <EMAIL> ok"),
      ("clean text only", 0L, "clean text only"))
    // drive the production transform, not a re-spelled copy of it
    val got = Pipeline.scrub(
      fixtures.zipWithIndex.map { case ((t, _, _), i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
    got.zip(fixtures).foreach { case (r, (_, wantN, wantText)) =>
      assert(r.getLong(1) == wantN, s"count for '$wantText'")
      assert(r.getString(2) == wantText)
    }
  }
}
