package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfStrict: latest strictly-prior row per key, null when none") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (2L, ts("2024-01-01 10:02:00"), 200.0)).toDF("k", "qts", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 09:59:00"), "t0"), // before any quote -> null
      (1L, ts("2024-01-01 10:00:00"), "t1"), // equal ts -> strict -> null
      (1L, ts("2024-01-01 10:04:59"), "t2"), // -> 100.0
      (1L, ts("2024-01-01 10:06:00"), "t3"), // -> 101.0
      (2L, ts("2024-01-01 10:03:00"), "t4"), // -> 200.0
      (3L, ts("2024-01-01 10:03:00"), "t5")) // no key match -> null
      .toDF("k", "tts", "tag")
    val got = AsOfJoin.asOfStrict(trades, quotes, "k", "tts", "qts",
        Map("px" -> "last_px"))
      .select("tag", "last_px").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got("t0") == null)
    assert(got("t1") == null) // strict: same-instant quote invisible
    assert(got("t2") == 100.0)
    assert(got("t3") == 101.0)
    assert(got("t4") == 200.0)
    assert(got("t5") == null)
  }

  test("asOfStrict: null payload values never mix fields across rows") {
    import spark.implicits._
    // purchase A (value=5.0) then B (value=NULL): an event after B must
    // see (B, NULL), not B's id with A's value
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A", Some(5.0)),
      (1L, ts("2024-01-01 10:05:00"), "B", None))
      .toDF("k", "qts", "qid", "qv")
    val trades = Seq((1L, ts("2024-01-01 10:10:00"), "t"))
      .toDF("k", "tts", "tag")
    val r = AsOfJoin.asOfStrict(trades, quotes, "k", "tts", "qts",
      Map("qid" -> "last_id", "qv" -> "last_v")).collect()(0)
    assert(r.getAs[String]("last_id") == "B")
    assert(r.isNullAt(r.fieldIndex("last_v")),
      "stale value from an earlier right row leaked into the match")
  }

  test("asOfStrict: null keys never match (join semantics)") {
    import spark.implicits._
    val quotes = Seq((Option.empty[Long], ts("2024-01-01 09:00:00"), 9.0))
      .toDF("k", "qts", "px")
    val trades = Seq((Option.empty[Long], ts("2024-01-01 10:00:00"), "t"))
      .toDF("k", "tts", "tag")
    val r = AsOfJoin.asOfStrict(trades, quotes, "k", "tts", "qts",
      Map("px" -> "last_px")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("last_px")),
      "null-key rows matched each other")
  }

  test("fixture assumption: purchases carry no duplicate (user_id, ts)") {
    // the q38 oracle uses DuckDB ASOF, which picks an unspecified row
    // on exact-ts ties — the hash compare is sound because the fixture
    // is tie-free (see asOfStrict's scaladoc); keep that checked here
    import org.apache.spark.sql.functions.{col, count, lit}
    val dups = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .count()
    assert(dups == 0L, "duplicate (user_id, ts) purchases would make the q38 oracle tie-ambiguous")
  }

  test("q38: as-of matches a window-free reference computation") {
    // independent oracle: correlated max-prior lookup via a plain join
    // + groupBy (O(n^2/key) — test-scale only)
    val e = graft.sources.Tables.load(spark, sf, "events")
      .select("event_id", "ts", "user_id", "event_type")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"),
        col("event_id").as("pid"))
    val expected = e.join(p, col("user_id") === col("pu") &&
        col("pts") < col("ts"), "left")
      .groupBy("event_id")
      .agg(max(struct(col("pts"), col("pid"))).getField("pid")
        .as("want_prev"))
    val got = graft.operators.AsOfJoin.eventsAsOfPurchases(spark, sf)
      .select(col("event_id"), col("prev_purchase_id"))
    val diff = got.join(expected, "event_id")
      .filter(!(col("prev_purchase_id") <=> col("want_prev")))
    assert(diff.count() == 0, diff.collect().take(5).mkString(","))
  }

  test("as-of join plan: one shuffle on the key, no nested loop") {
    val plan = AsOfJoin.eventsAsOfPurchases(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop sneaked in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Window"), s"expected window formulation:\n$plan")
  }
}
