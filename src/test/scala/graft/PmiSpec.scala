package graft

import org.apache.spark.sql.functions._
import graft.operators.TextQueries
import graft.sources.Tables

/** PMI collocations (q139): local replica of counts and formula. */
class PmiSpec extends SparkSpec {

  test("pmi pairs: replica of counts, ordering, and invariants") {
    val got = TextQueries.pmiPairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.length == 20)
    assert(got.forall { case (x, y, n, _) => x < y && n >= 5 })
    // pmi non-increasing in output order
    assert(got.map(-_._4).sameElements(got.map(-_._4).sorted))
    // local replica
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getString(1).split(" ", -1).filter(_.nonEmpty))
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val pair = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.foreach { ws =>
      ws.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      ws.sliding(2).foreach {
        case Array(a, b) if a != b =>
          val k = if (a < b) (a, b) else (b, a)
          pair(k) = pair.getOrElse(k, 0L) + 1
        case _ =>
      }
    }
    val n = uni.values.sum.toDouble
    val m = pair.values.sum.toDouble
    got.foreach { case (x, y, nxy, pmi) =>
      assert(pair((x, y)) == nxy, s"count mismatch for ($x,$y)")
      val expect = math.floor(math.log(
        nxy * n * n / (m * uni(x) * uni(y))) * 10000 + 0.5) / 10000
      assert(math.abs(pmi - expect) < 1e-9, s"pmi mismatch for ($x,$y)")
    }
  }
}
