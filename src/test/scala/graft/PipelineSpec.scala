package graft

import org.apache.spark.sql.functions._
import graft.operators.Pipeline
import graft.sources.Tables

class PipelineSpec extends SparkSpec {

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
}
