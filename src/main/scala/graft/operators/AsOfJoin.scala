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
    * tag). `rightPayload` columns are carried; ties inside the right
    * side resolve by the last of `rightOrder`.
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

    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(0))
      .select((Seq(col(key), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == key).map(col) ++
        payloadOut.map(o => lit(null).as(o))): _*)

    val r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(1))
      .select((Seq(col(key), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map { case (in, out) => col(in).as(out) }.toSeq): _*)

    // equal ts: left (_side=0) sorts before right (_side=1), so a right
    // row never matches a left row at the same instant — strict '<'
    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payloadOut.foldLeft(l.unionByName(r)) { (df, o) =>
      df.withColumn(o, last(col(o), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 0)
      .select((Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        payloadOut.map(col)): _*)
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
