package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference has no streaming
  * (SURVEY.md §2.10); this is the natural extension demanded of an
  * events pipeline: one transform, two run modes. [[hourlyAgg]] is the
  * same logical plan whether its input is a batch or a streaming
  * DataFrame — Spark's batch≡streaming contract, proven by
  * StreamingSpec comparing the two outputs.
  */
object EventStreams {

  /** Nanos→µs timestamp normalization (shared batch/stream); a no-op
    * when the fixture already stores µs timestamps — the encoding
    * branch lives in one place ([[graft.sources.Tables]]) so the two
    * paths can never drift.
    */
  def normalize(raw: DataFrame): DataFrame =
    graft.sources.Tables.normalizeEventTs(raw)

  /** The shared transform: 1-hour tumbling event-time windows with a
    * 2-hour watermark. In append/update output modes the watermark is
    * what keeps per-window state finite — without it a 100 TB/day
    * stream accretes state forever. (The memory-sink demo below runs
    * in complete mode for result comparison, which by definition
    * retains all windows; a production sink would use update mode.)
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding (overlapping) event-time windows: 2-hour windows advancing
    * hourly, so each event contributes to exactly two windows — Spark
    * expands the assignment inside the aggregate (no self-union pass).
    * Identical plan batch or stream; in a stream the watermark bounds
    * state to the windows the clock can still touch (window length +
    * delay), independent of stream length.
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Native session windows: `session_window` merges events within the
    * gap inside the aggregate operator itself — the engine primitive
    * under the gaps-and-islands spelling (OlapQueries.userSessions)
    * and the flatMapGroupsWithState form ([[sessionizeStream]]). Same
    * plan batch or stream; streaming state holds only OPEN sessions
    * (closed ones finalize once the watermark passes their end).
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        unix_micros(col("sw.end")).as("end_us"),
        col("n_events"))

  /** A live session being accumulated by [[sessionizeStream]]. */
  case class SessionState(start: Long, lastUs: Long, nEvents: Long)

  /** A closed session emitted once its inactivity gap elapses. */
  case class ClosedSession(user_id: Long, startUs: Long, endUs: Long,
      n_events: Long)

  /** Custom streaming state (SURVEY.md §2.10 extension):
    * per-user sessionization with flatMapGroupsWithState — the typed
    * arbitrary-state API. A session closes when a later event arrives
    * past the gap OR when the event-time timeout fires (watermark
    * passes lastUs+gap), so an idle user's final session is emitted
    * and their state removed — state stays bounded on a 24/7 stream.
    * Cross-batch late events fold into the open session (never move
    * its end backwards). The batch twin is OlapQueries.userSessions.
    *
    * Input: (user, eventTimeMicros) pairs.
    */
  def sessionizeStream(
      events: org.apache.spark.sql.Dataset[(Long, Long)], gapUs: Long)
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val withEventTime = events.toDF("user", "us")
      .withColumn("_et", timestamp_micros(col("us")))
      .withWatermark("_et", "0 seconds")
      .as[(Long, Long, java.sql.Timestamp)]
    withEventTime.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, s.start, s.lastUs, s.nEvents))
          } else {
            // rows arrive unordered within the batch — sort by time
            val times = rows.map(_._2).toSeq.sorted
            var st = state.getOption.orNull
            val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            times.foreach { t =>
              st match {
                case null => st = SessionState(t, t, 1)
                case s if t <= s.lastUs =>
                  // late event: extend the open session backwards-safe
                  st = SessionState(math.min(s.start, t), s.lastUs,
                    s.nEvents + 1)
                case s if t - s.lastUs > gapUs =>
                  closed += ClosedSession(user, s.start, s.lastUs, s.nEvents)
                  st = SessionState(t, t, 1)
                case s => st = SessionState(s.start, t, s.nEvents + 1)
              }
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp((st.lastUs + gapUs) / 1000 + 1)
            }
            closed.iterator
          }
      }
  }

  /** A key's earliest-seen record, emitted once it is final. */
  case class FirstSeen(key: String, tsUs: Long, id: Long, value: Double)

  /** Streaming exact first-seen dedup — the online form of "keep the
    * earliest record per key" (batch twin:
    * [[graft.operators.OlapQueries.firstEvents]]). Per-key state holds
    * the (event-time, id)-minimal record seen so far; the record is
    * FINAL once the watermark passes its event time (no
    * earlier-timestamped record can still arrive, by the watermark
    * contract), at which point the event-time timeout emits it in
    * append mode and removes the state — so state stays bounded by the
    * number of keys inside the watermark horizon, not the stream
    * length.
    *
    * `delay` is the out-of-order tolerance: stream ≡ batch argmin
    * exactly as long as no record arrives more than `delay` behind the
    * stream's maximum event time — records later than that are dropped
    * by the engine before the state function runs (the standard
    * watermark contract: the tolerance is bought with state lifetime).
    * Records of a key arriving after its first-seen was emitted are
    * later-timestamped by construction and are ignored only while some
    * state still exists; afterwards the key would re-emit — the same
    * contract as Spark's dropDuplicatesWithinWatermark, which a
    * 100 TB/day pipeline pairs with a daily exact-dedup compaction.
    *
    * Input: (key, eventTimeMicros, id, value).
    */
  def firstSeenStream(records: org.apache.spark.sql.Dataset[
      (String, Long, Long, Double)],
      delay: String = "1 hour")
      : org.apache.spark.sql.Dataset[FirstSeen] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = records.sparkSession
    import spark.implicits._
    val withEventTime = records.toDF("key", "us", "id", "value")
      .withColumn("_et", timestamp_micros(col("us")))
      .withWatermark("_et", delay)
      .as[(String, Long, Long, Double, java.sql.Timestamp)]
    withEventTime.groupByKey(_._1)
      .flatMapGroupsWithState[FirstSeen, FirstSeen](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, Long, Long, Double, java.sql.Timestamp)],
         state: GroupState[FirstSeen]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(s)
          } else {
            val candidates =
              rows.map(r => FirstSeen(key, r._2, r._3, r._4)) ++
                state.getOption.iterator
            val best = candidates.minBy(r => (r.tsUs, r.id))
            state.update(best)
            // final once the watermark passes best.tsUs; clamp to stay
            // ahead of the current watermark (a late-but-admitted row
            // may carry an event time the watermark already passed)
            state.setTimeoutTimestamp(
              math.max(best.tsUs / 1000 + 1,
                state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Stream-static enrichment join: each micro-batch of events joined
    * against a STATIC dimension frame (broadcast — the dim re-reads per
    * micro-batch, so at scale pin it small or cached). Stateless: no
    * watermark, no state store; append mode streams it unchanged. This
    * is the online half of the reference's categorical lookup —
    * the same `enrich` call runs on a batch frame (StreamingSpec
    * proves stream ≡ batch), which is Spark's unified-plan contract.
    */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("event_type"), "left")

  /** Stream-stream interval join (§2.10's last missing shape): each
    * purchase paired with the same user's clicks in the trailing
    * `windowMinutes`. The equality key (user_id) makes it a
    * state-store hash join, and the time-range predicate plus BOTH
    * sides' watermarks is what lets the engine evict state — a click
    * older than watermark−window can never match a future purchase, so
    * per-side state is bounded by `delay`+window of stream time, not
    * stream length. On batch inputs the watermarks are no-ops and the
    * identical plan is the pair form of
    * [[graft.operators.OlapQueries.purchaseAttribution]] —
    * StreamingSpec proves stream ≡ batch.
    */
  def attributionPairs(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 60, delay: String = "2 hours"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
      col("ts").as("c_ts"), col("event_id").as("click_id"))
      .withWatermark("c_ts", delay)
    val p = purchases.select(col("user_id"), col("ts").as("p_ts"),
      col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", delay)
    p.join(c, col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") -
          expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        unix_micros(col("p_ts")).as("p_ts_us"),
        unix_micros(col("c_ts")).as("c_ts_us"),
        round(col("value"), 4).as("value"))
  }

  /** Streaming run over the events parquet (file source), memory sink.
    * `maxFilesPerTrigger=1` makes the file feed arrive as discrete
    * micro-batches. Returns the started query; callers drive it with
    * processAllAvailable().
    *
    * `glob` matches leaf FILES under sfDir — the default fits the
    * testdata's single-file layout; a part-file directory layout
    * (the scale shape) needs e.g. "events.parquet/part-*".
    */
  def startHourlyStream(spark: SparkSession, sfDir: String,
      queryName: String, glob: String = "events.parquet"): StreamingQuery = {
    // the file source wants a directory; glob-filter to the one table.
    // The stream needs its schema up front — sniff the fixture's ts
    // encoding from one batch footer read of the same files.
    val raw = spark.readStream
      .schema(graft.sources.Tables.eventsOnDiskSchema(
        spark, s"$sfDir/$glob"))
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", glob)
      .parquet(sfDir)
    hourlyAgg(normalize(raw))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
  }
}
