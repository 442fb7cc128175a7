package graft

import graft.operators.{Dedup, Pipeline, TextQueries}
import graft.sources.Tables

/** Round-3 corpus-pipeline additions (q89–q93): contamination rates,
  * the composite quality gate, BPE merge candidates, cluster-size
  * histogram, and per-source caps — each against an independent
  * driver-side recomputation on the sf0.001 fixture (the DuckDB
  * oracle re-proves them at sf0.01).
  */
class CorpusGateSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")
    .select("doc_id", "text", "source")
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def words(text: String): Array[String] = text.split(" ", -1)

  private def grams(text: String, n: Int): Set[String] = {
    val ws = words(text)
    if (ws.length >= n) ws.sliding(n).map(_.mkString(" ")).toSet
    else Set(text)
  }

  // the exact arithmetic of TextAnalysis.qualityScore, replayed in
  // driver-side doubles (same IEEE ops, so equality is exact)
  private def quality(text: String): Double = {
    val ws = words(text)
    val swr = ws.count(w => w == "the" || w == "a").toDouble / ws.length
    val dr = ws.distinct.length.toDouble / ws.length
    val q = 0.4 * math.min(swr * 8, 1.0) +
      0.3 * math.min(ws.length.toDouble / 100, 1.0) + 0.3 * dr
    math.floor(q * 10000 + 0.5) / 10000
  }

  test("q89 contaminationRate matches a naive recomputation") {
    val evalGrams = docs.filter(_._1 < 10).flatMap(d => grams(d._2, 8)).toSet
    val train = docs.filter(_._1 >= 10)
    val expected = train.groupBy(_._3).view.mapValues { g =>
      val n = g.length.toLong
      val hit = g.count(d => grams(d._2, 8).exists(evalGrams)).toLong
      (n, hit,
        BigDecimal(hit.toDouble / n)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = Pipeline.contaminationRate(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (src, (n, hit, rate)) =>
      assert((n, hit) == (expected(src)._1, expected(src)._2),
        s"source $src counts")
      assert(math.abs(rate - expected(src)._3) < 5e-5, s"source $src rate")
    }
    assert(got.values.exists(_._2 > 0), "fixture should have contamination")
  }

  test("q90 qualityGate matches a naive recomputation") {
    val expected = docs.groupBy(_._3).view.mapValues { g =>
      val stats = g.map { d =>
        val ws = words(d._2)
        (ws.length, quality(d._2), ws.distinct.length.toDouble / ws.length)
      }
      (stats.length.toLong,
        stats.count(_._1 < 20).toLong,
        stats.count(_._2 < 0.35).toLong,
        stats.count(_._3 < 0.33).toLong,
        stats.count(s => s._1 >= 20 && s._2 >= 0.35 && s._3 >= 0.33).toLong)
    }.toMap
    val got = Pipeline.qualityGate(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == expected)
    // the gate must actually discriminate on this fixture
    val (kept, total) = (got.values.map(_._5).sum, got.values.map(_._1).sum)
    assert(kept > 0 && kept < total, s"gate kept $kept of $total")
  }

  test("q91 bpeMergeCandidates matches a naive recomputation") {
    val counts = docs.iterator
      .map(d => words(d._2))
      .filter(_.length >= 2)
      .flatMap(ws => ws.sliding(2).map(_.mkString(" ")))
      .foldLeft(Map.empty[String, Long]) { (m, p) =>
        m.updated(p, m.getOrElse(p, 0L) + 1L)
      }
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = TextQueries.bpeMergeCandidates(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("q92 clusterSizes is the union-find histogram of the q25 pairs") {
    val pairs = Dedup.ngramJaccardPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find over the oracle-proven pair list
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.groupBy(find).values
      .groupBy(_.size.toLong).view.mapValues(_.size.toLong).toMap
    val got = Dedup.clusterSizes(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.keys.forall(_ >= 2), "clusters are ≥2 by construction")
  }

  test("q100 trainingMix ≡ the composed naive pipeline") {
    val full = Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // stage 1: gate + first occurrence per text
    def passes(text: String): Boolean = {
      val ws = words(text)
      val dr = ws.distinct.length.toDouble / ws.length
      ws.length >= 20 && quality(text) >= 0.35 && dr >= 0.33
    }
    val admitted = full.filter(d => passes(d._2))
      .groupBy(_._2).values.map(_.minBy(_._1)).toSeq
    // stage 2: per-lang permille rates over the ADMITTED set
    val counts = admitted.groupBy(_._3).view.mapValues(_.size).toMap
    val nMin = counts.values.min
    def permille(lang: String): Long = math.max(1L,
      math.round(1000.0 * math.sqrt(nMin.toDouble / counts(lang))))
    val accepted = admitted.filter(d =>
      ((d._1 % 1000000007L) * 2654435761L) % 1000L < permille(d._3))
      .map(d => (d._1, words(d._2).length.toLong)).sortBy(_._1)
    // stage 3: greedy cumulative packing
    var cum = 0L
    val expected = accepted.map { case (id, nt) =>
      cum += nt; (math.floor((cum - 1).toDouble / 512).toLong, id, nt)
    }.groupBy(_._1).toSeq.map { case (pack, g) =>
      (pack, g.size.toLong, g.map(_._3).sum,
        g.map(_._2).min, g.map(_._2).max)
    }.sortBy(_._1)
    val got = Pipeline.trainingMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.map(_._1) == got.indices.map(_.toLong),
      "pack ids must be contiguous from 0")
  }

  test("q93 sourceCaps keeps the k best-quality docs per source") {
    val k = 10
    val expected = docs.groupBy(_._3).toSeq.flatMap { case (src, g) =>
      g.map(d => (src, d._1, quality(d._2)))
        .sortBy { case (_, id, q) => (-q, id) }
        .take(k)
        .zipWithIndex
        .map { case ((s, id, q), i) => (s, id, q, i + 1) }
    }.sortBy(t => (t._1, t._4))
    val got = Pipeline.sourceCaps(spark, sf, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    assert(got == expected)
  }
}
