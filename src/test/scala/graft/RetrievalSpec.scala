package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextQueries}
import graft.sources.Tables

/** BM25 (q143) and reciprocal-rank fusion (q144): local formula
  * replicas and fusion consistency with the two source rankings.
  */
class RetrievalSpec extends SparkSpec {

  private val Query = Seq("join", "filter", "scan")

  private def localBm25(): Map[Long, (Double, Long)] = {
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)
        .filter(_.nonEmpty)))
    val nd = docs.length.toDouble
    val ntok = docs.map(_._2.length.toLong).sum.toDouble
    val avgdl = ntok / nd
    val dfm = Query.map(t =>
      t -> docs.count(_._2.contains(t)).toDouble).toMap
    docs.flatMap { case (id, ws) =>
      val terms = Query.flatMap { t =>
        val tf = ws.count(_ == t).toDouble
        if (tf == 0) None else {
          val idf = math.log((nd - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0)
          Some(idf * (tf * 2.2 /
            (tf + 1.2 * (0.25 + 0.75 * ws.length / avgdl))))
        }
      }
      if (terms.isEmpty) None
      else Some(id -> ((math.floor(terms.sum * 10000 + 0.5) / 10000,
        terms.size.toLong)))
    }.toMap
  }

  test("bm25: top-20 equals the local formula replica") {
    val got = TextQueries.bm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val local = localBm25()
    val expectTop = local.toSeq
      .sortBy { case (id, (s, _)) => (-s, id) }.take(20)
    assert(got.map(_._1).toSeq == expectTop.map(_._1))
    got.foreach { case (id, s, nt) =>
      assert(math.abs(s - local(id)._1) < 1e-9)
      assert(nt == local(id)._2)
    }
  }

  test("rank fusion: rrf recomputes from the two rankings") {
    val fused = Similarity.rankFusion(spark, sf).collect()
    assert(fused.length == 20)
    val kw = TextQueries.bm25TopK(spark, sf, topK = 50).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val sem = Similarity.cosineTopK(spark, sf, k = 50).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, c) => (-c, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    fused.foreach { r =>
      val id = r.getLong(0)
      val expect = kw.get(id).map(x => 1.0 / (x + 60)).getOrElse(0.0) +
        sem.get(id).map(x => 1.0 / (x + 60)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) -
        math.floor(expect * 1e6 + 0.5) / 1e6) < 1e-9, s"rrf for $id")
      if (!r.isNullAt(1)) assert(kw(id) == r.getInt(1))
      if (!r.isNullAt(2)) assert(sem(id) == r.getInt(2))
    }
    // fused order is rrf desc with doc_id tie-break
    val scores = fused.map(_.getDouble(3))
    assert(scores.map(-_).sameElements(scores.map(-_).sorted))
  }
}
