package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** As-of join — for each left row, the latest right row with the same
  * key strictly earlier in time. Spark has no native ASOF operator;
  * rather than a custom SparkPlan, this is the scalable composition:
  * tag both sides, union, one window over (key, ts) carrying the last
  * seen right payload forward, filter back to left rows.
  *
  * Cost shape: ONE shuffle on the key + a per-partition sort — the
  * same price as a single sort-merge join, with no range-explosion.
  * This is the idiomatic large-scale formulation (a per-key
  * merge-walk), and it holds at 100 TB: the window state is one row's
  * payload, regardless of history length.
  */
object AsOfJoin {

  /** Strict as-of: right rows at exactly the left row's timestamp are
    * NOT matched (they sort after left rows at equal ts via the side
    * tag). `rightPayload` columns are carried as ONE struct, so the
    * matched row's fields always come from a single right row even
    * when some payload values are null; ties among right rows at the
    * same (key, ts) resolve deterministically to the greatest payload
    * struct — so make the struct's FIRST field a unique right-side id
    * (as [[eventsAsOfPurchases]] does with p_id = event_id) and the
    * tie-break is total. Note DuckDB's ASOF picks an unspecified row
    * on exact-ts ties, so an oracle hash-compare needs either this
    * unique-id-first convention mirrored or a tie-free fixture (the
    * driver's events data has no duplicate (user_id, ts) purchases —
    * verified at sf0.01 and sf0.1).
    *
    * @param left        left (probe) frame
    * @param right       right (reference) frame
    * @param key         equi-join key column name (same name both sides)
    * @param leftTs      event-time column in `left`
    * @param rightTs     event-time column in `right`
    * @param rightPayload right columns to carry (renamed as given)
    */
  def asOfStrict(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightPayload: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadOut = rightPayload.values.toSeq

    val payloadStruct = struct(
      rightPayload.map { case (in, out) => col(in).as(out) }.toSeq: _*)
    val payloadType = right.select(payloadStruct.as("_p")).schema("_p").dataType
    // join semantics: a NULL key matches nothing — drop null-key right
    // rows so the window's null partition carries no payload
    val rightNonNullKey = right.filter(col(key).isNotNull)

    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(0))
      .select((Seq(col(key), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == key).map(col) :+
        lit(null).cast(payloadType).as("_payload")): _*)
    val r = rightNonNullKey
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(1))
      .select((Seq(col(key), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payloadStruct.as("_payload")): _*)

    // equal ts: left (_side=0) sorts before right (_side=1), so a right
    // row never matches a left row at the same instant — strict '<'.
    // _payload as the final sort key makes same-instant right-row ties
    // deterministic (left rows have a null payload; side already
    // separates the two cases).
    val w = Window.partitionBy(key)
      .orderBy(col("_ts"), col("_side"), col("_payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r, allowMissingColumns = false)
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 0)
      .select((Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        payloadOut.map(o => col(s"_payload.$o").as(o))): _*)
  }

  /** q38: each event joined to the user's most recent strictly-prior
    * purchase event — the sessionization-style query an events table
    * exists for.
    */
  def eventsAsOfPurchases(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.load(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_id"), col("value").as("p_value"))
    asOfStrict(events, purchases, "user_id", "ts", "ts",
      Map("p_id" -> "prev_purchase_id", "p_value" -> "prev_purchase_value"))
      .select("event_id", "prev_purchase_id", "prev_purchase_value")
      .orderBy("event_id")
  }
}
