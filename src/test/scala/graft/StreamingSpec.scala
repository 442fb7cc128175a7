package graft

import graft.operators.OlapQueries
import graft.sources.Tables
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {

  test("streaming hourly agg equals the batch twin") {
    val q = EventStreams.startHourlyStream(spark, sf, "hourly_stream_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_stream_test")
      val batch = EventStreams.hourlyAgg(Tables.load(spark, sf, "events"))
      val s = streamed.collect().map(_.toSeq).toSet
      val b = batch.collect().map(_.toSeq).toSet
      assert(s == b, s"stream/batch divergence: ${s.diff(b)} | ${b.diff(s)}")
      assert(s.nonEmpty)
    } finally q.stop()
  }

  test("streaming sliding-window agg equals the batch twin") {
    val raw = spark.readStream.schema(Tables.eventsOnDiskSchema(spark, sf + "/events.parquet"))
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet").parquet(sf)
    val q = EventStreams.slidingAgg(EventStreams.normalize(raw))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sliding_stream_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sliding_stream_test")
        .collect().map(_.toSeq).toSet
      val batch = EventStreams.slidingAgg(Tables.load(spark, sf, "events"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"stream/batch divergence: ${streamed.diff(batch)} | ${batch.diff(streamed)}")
      assert(streamed.nonEmpty)
      // every event lands in exactly two windows
      val nAssigned = spark.table("sliding_stream_test")
        .agg(org.apache.spark.sql.functions.sum("n")).collect().head.getLong(0)
      assert(nAssigned == 2 * Tables.load(spark, sf, "events").count())
    } finally q.stop()
  }

  test("native session_window agg equals the batch twin") {
    val raw = spark.readStream.schema(Tables.eventsOnDiskSchema(spark, sf + "/events.parquet"))
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events.parquet").parquet(sf)
    val q = EventStreams.sessionAgg(EventStreams.normalize(raw))
      .writeStream.outputMode("complete")
      .format("memory").queryName("session_stream_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("session_stream_test")
        .collect().map(_.toSeq).toSet
      val batch = EventStreams.sessionAgg(Tables.load(spark, sf, "events"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"stream/batch divergence: ${streamed.diff(batch).take(3)} | ${batch.diff(streamed).take(3)}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup: dropDuplicatesWithinWatermark on event ids") {
    val raw = spark.readStream.schema(Tables.eventsOnDiskSchema(spark, sf + "/events.parquet"))
      .option("pathGlobFilter", "events.parquet").parquet(sf)
    val deduped = EventStreams.normalize(raw)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream_test").start()
    try {
      q.processAllAvailable()
      val n = spark.table("dedup_stream_test").count()
      // source has unique event_ids -> dedup is the identity here; the
      // operator's state machinery is what's being exercised
      assert(n == Tables.load(spark, sf, "events").count())
    } finally q.stop()
  }

  test("stream-static enrichment join ≡ batch join (stateless, append mode)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dim = Seq(("click", "engagement"), ("view", "engagement"),
      ("purchase", "revenue")).toDF("event_type", "category")
    val raw = spark.readStream.schema(Tables.eventsOnDiskSchema(spark, sf + "/events.parquet"))
      .option("pathGlobFilter", "events.parquet").parquet(sf)
    val enriched = EventStreams.enrich(
        EventStreams.normalize(raw), dim)
      .select("event_id", "event_type", "category")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_stream_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_stream_test")
        .collect().map(_.toSeq).toSet
      val batch = EventStreams.enrich(Tables.load(spark, sf, "events"), dim)
        .select("event_id", "event_type", "category")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      // left join: unmapped types survive with a null category
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("freq_topk sketch is valid streaming state (stream ≡ batch)") {
    import org.apache.spark.sql.functions.col
    // a mergeable TypedImperativeAggregate doubles as incremental
    // stream state. Stream ≡ batch EXACTLY only in the no-eviction
    // regime (distinct event_types ≤ capacity — true for this fixture,
    // asserted below); with eviction, Misra–Gries counters are
    // update-order dependent and stream/batch may legally differ
    // within the sketch's error bound.
    val raw = spark.readStream.schema(Tables.eventsOnDiskSchema(spark, sf + "/events.parquet"))
      .option("pathGlobFilter", "events.parquet").parquet(sf)
    val q = raw
      .agg(graft.functions.FreqFunctions.freq_topk(col("event_type"), 8)
        .as("hh"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hh_stream_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hh_stream_test")
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      val batch = Tables.load(spark, sf, "events")
        .agg(graft.functions.FreqFunctions.freq_topk(col("event_type"), 8)
          .as("hh"))
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      // no-eviction precondition for exact equality
      assert(Tables.load(spark, sf, "events")
        .select("event_type").distinct().count() <= 8)
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("quantile sketch is valid streaming state (stream ≡ batch, " +
      "exactly, at any micro-batching)") {
    import org.apache.spark.sql.functions.{col, expr}
    // unlike Misra–Gries, the bottom-k pair sketch is a pure
    // DISTINCT-SET operation (insert/merge keep the k smallest
    // (priority, value) pairs), so its state is update-order
    // INDEPENDENT: stream ≡ batch bit-for-bit with no eviction
    // caveat — the property that lets a streaming ingest maintain
    // the same quantile summaries the batch MV stores (q189)
    val pri = "pmod(event_id, 1000000007) * 2654435761 % 1000000007"
    val v = "cast(cast(value as decimal(18,2)) * 100 as bigint)"
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("event_type")
        .agg(graft.functions.QskFunctions.quantile_sketch_est(
          expr(pri), expr(v), 64, 0.9).as("p90_cents"))
    val raw = spark.readStream
      .schema(Tables.eventsOnDiskSchema(spark, sf + "/events.parquet"))
      .option("pathGlobFilter", "events.parquet")
      .option("maxFilesPerTrigger", 1).parquet(sf)
    val q = agg(raw).writeStream.outputMode("complete")
      .format("memory").queryName("qsk_stream_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("qsk_stream_test")
        .orderBy("event_type").collect().toSeq
      val batch = agg(Tables.load(spark, sf, "events"))
        .orderBy("event_type").collect().toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("mixture sampling runs unchanged on a stream (stateless predicate)") {
    // the accept test is pure arithmetic on doc_id — no state, no RNG,
    // so the same operator body is streaming-safe and admits exactly
    // the batch row set
    val raw = spark.readStream.schema(Tables.documents)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val sampled = raw
      .withColumn("bucket",
        pmod(pmod(col("doc_id"), lit(1000000007L))
          * lit(graft.operators.Pipeline.KnuthMult), lit(1000L)))
      .filter(col("bucket") < lit(200L))
      .select("doc_id")
    val q = sampled.writeStream.outputMode("append")
      .format("memory").queryName("mixture_stream_test").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("mixture_stream_test")
        .collect().map(_.getLong(0)).toSet
      val batch = Tables.load(spark, sf, "documents")
        .withColumn("bucket",
          pmod(pmod(col("doc_id"), lit(1000000007L))
            * lit(graft.operators.Pipeline.KnuthMult), lit(1000L)))
        .filter(col("bucket") < lit(200L))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("partitioned write + partition-pruned read (scale layout)") {
    val tmp = java.nio.file.Files.createTempDirectory("partby").toString
    Tables.load(spark, sf, "events")
      .write.partitionBy("event_type").mode("overwrite")
      .parquet(s"$tmp/events_by_type")
    val pruned = spark.read.parquet(s"$tmp/events_by_type")
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition filter not applied:\n$plan")
    assert(pruned.count() ==
      Tables.load(spark, sf, "events")
        .filter(org.apache.spark.sql.functions.col("event_type") === "click")
        .count())
  }

  test("streamed edge batches merge into labels ≡ one-shot batch resolve") {
    // the daily-reingest pipeline AS A STREAM: each micro-batch of new
    // near-dup edges folds into the persisted labels table through
    // mergeComponents (batch-sized condensed merge), never re-reading
    // prior history — after three generations the labels equal a
    // from-scratch resolve of everything
    import spark.implicits._
    import graft.operators.ConnectedComponents
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val gen1 = (1L until 30L).map(i => (i, i + 1))
    val gen2 = Seq((30L, 100L), (100L, 101L), (200L, 201L))
    val gen3 = Seq((101L, 200L), (300L, 301L))
    @volatile var labels: org.apache.spark.sql.DataFrame = null
    val q = mem.toDS().toDF("a", "b").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // localCheckpoint pins the result past the micro-batch (the
        // production shape persists the labels table between days)
        labels =
          (if (labels == null) ConnectedComponents.components(batch)
           else ConnectedComponents.mergeComponents(labels, batch))
            .localCheckpoint(true)
        ()
      }
      .start()
    try {
      mem.addData(gen1: _*); q.processAllAvailable()
      mem.addData(gen2: _*); q.processAllAvailable()
      mem.addData(gen3: _*); q.processAllAvailable()
    } finally q.stop()
    val got = labels.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val scratch = ConnectedComponents
      .components((gen1 ++ gen2 ++ gen3).toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == scratch)
    // the merges really crossed generations: gen3 bridged 100s to 1
    assert(got(201L) == 1L && got(301L) == 300L)
  }

  test("a streaming ingest keeps the dashboard ROUTED between MV " +
      "refreshes: micro-batch file appends serve via delta compensation") {
    // the full warehouse loop: a foreachBatch ingest appends parquet
    // files to a summarized table while a dashboard aggregate keeps
    // running — between refreshes the router answers from
    // merge(summary, partial-agg(appended files)), always the
    // post-ingest truth; a refresh folds the backlog and the read
    // returns to summary-only
    import spark.implicits._
    import graft.plans.{Summaries, SummaryRewrite}
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_mv")
      .toFile
    val srcPath = new java.io.File(dir, "facts").getAbsolutePath
    val name = "spec_stream_delta"
    Seq(("A", 1.0), ("B", 2.0), ("A", 3.0))
      .toDF("k", "v").write.parquet(srcPath)
    Summaries.create(spark.read.parquet(srcPath), name,
      grain = Seq("k"), sums = Seq("sv" -> "cast(v as decimal(18,2))"))
    val q = () => spark.read.parquet(srcPath).groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,2)")).as("sv"))
      .orderBy("k")
    def scans() = {
      val df = q(); df.collect()
      allPlanNodes(df.queryExecution.executedPlan).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toUri.getPath)
      }.flatten
    }
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Double)]
    val ingest = mem.toDS().toDF("k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(srcPath)
        Summaries.invalidate(name) // the ingest's metadata-refresh hook
        ()
      }
      .start()
    try {
      mem.addData(("B", 4.0), ("C", 5.0)); ingest.processAllAvailable()
      val p1 = scans()
      assert(p1.exists(_.contains("graft_summaries")),
        s"mid-stream read should stay routed (compensated): $p1")
      assert(q().collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
        == Seq(("A", 2L), ("B", 2L), ("C", 1L)),
        "compensated answer must include the streamed batch")
      mem.addData(("A", 6.0)); ingest.processAllAvailable()
      assert(q().collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
        == Seq(("A", 3L), ("B", 2L), ("C", 1L)),
        "second micro-batch joins the delta set")
      // the nightly refresh is ONE CALL: the engine folds the exact
      // file set it has been compensating for
      assert(Summaries.refreshDelta(name).nonEmpty)
      val p2 = scans()
      assert(p2.nonEmpty && p2.forall(_.contains("graft_summaries")),
        s"post-refresh read should be summary-only: $p2")
      assert(q().collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
        == Seq(("A", 3L), ("B", 2L), ("C", 1L)))
    } finally {
      ingest.stop()
      Summaries.drop(name)
      java.nio.file.Files.walk(dir.toPath).iterator().asScala.toSeq
        .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("streamed document batches through mergeAndAbsorb ≡ one-shot near-dup pairs") {
    // the multi-day near-dup protocol AS A STREAM: each micro-batch of
    // ingested documents is flagged against the persisted prefix index
    // and absorbed into it (pinned-df ordering), never re-shingling
    // prior history — the accumulated pair set equals a one-shot
    // brute force over everything that ever arrived
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val gen1 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"))
    val gen2 = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta kappa"),
      (11L, "one two three four five six seven eight"))
    val gen3 = Seq(
      (20L, "one two three four five six seven nine"))
    val found = scala.collection.mutable.Set.empty[(Long, Long)]
    @volatile var state: Dedup.NearDupState = null
    val q = mem.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val pairs =
          if (state == null) {
            state = Dedup.nearDupState(batch, threshold = 0.5)
            Dedup.selfPairs(state)
          } else {
            val (p, next) = Dedup.mergeAndAbsorb(state, batch)
            state = next
            p
          }
        found ++= pairs.select("ai", "bi").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        ()
      }
      .start()
    try {
      mem.addData(gen1: _*); q.processAllAvailable()
      mem.addData(gen2: _*); q.processAllAvailable()
      mem.addData(gen3: _*); q.processAllAvailable()
    } finally q.stop()
    val all = (gen1 ++ gen2 ++ gen3).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.wordShingles(col("text")).as("sh"))
    val truth = all.as("a").join(all.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ai"), col("b.doc_id").as("bi"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("j"))
      .filter(col("j") >= 0.5)
      .select("ai", "bi").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.toSet == truth,
      s"missed ${truth -- found}, extra ${found.toSet -- truth}")
    // pairs really spanned generations: 10 matched gen-1 docs, 20
    // matched a gen-2 doc
    assert(truth.exists(p => p._2 == 10L) && truth.contains((11L, 20L)))
  }

  test("flatMapGroupsWithState sessionization closes sessions at gaps") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val hourUs = 3600L * 1000000
    // user 7: events at 1h, 1.2h | gap | 3h, 3.1h | gap | 6h (open).
    // Times start at 1h: an event at exactly the initial watermark
    // (epoch 0) would be dropped by the event-time-timeout contract.
    mem.addData((7L, 1 * hourUs), (7L, (1.2 * hourUs).toLong))
    mem.addData((7L, 3 * hourUs), (7L, (3.1 * hourUs).toLong))
    mem.addData((7L, 6 * hourUs))
    val q = EventStreams.sessionizeStream(mem.toDS(), gapUs = hourUs / 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessionize_test").start()
    try {
      q.processAllAvailable()
      val closed = spark.table("sessionize_test")
        .as[EventStreams.ClosedSession].collect().sortBy(_.startUs)
      assert(closed.length == 2) // third session still open
      assert(closed(0).n_events == 2 && closed(0).startUs == 1 * hourUs)
      assert(closed(1).n_events == 2 && closed(1).startUs == 3 * hourUs)
      // another user's far-future event advances the watermark past the
      // open session's gap -> event-time timeout closes it (state freed)
      mem.addData((8L, 10 * hourUs))
      q.processAllAvailable()
      mem.addData((8L, 11 * hourUs)) // next batch evaluates timeouts
      q.processAllAvailable()
      val after = spark.table("sessionize_test")
        .as[EventStreams.ClosedSession].collect().filter(_.user_id == 7L)
        .sortBy(_.startUs)
      assert(after.length == 3, s"idle session never timed out: ${after.toSeq}")
      assert(after(2).startUs == 6 * hourUs && after(2).n_events == 1)
    } finally q.stop()
  }

  test("firstSeenStream ≡ batch argmin (q61 twin) across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // real corpus rows: (user/event_type key, event-time µs, id, value)
    val rows = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (s"${r.getLong(0)}/${r.getString(1)}", r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long, Double)]
    // delay must cover the fixture's full event-time spread: the rows
    // are split arbitrarily, so batch 2 carries records far behind
    // batch 1's max event time — a shorter delay would drop them as
    // late (the documented watermark contract)
    val dayUs = 86400L * 1000000
    val delayDays = 400L
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val q = EventStreams.firstSeenStream(mem.toDS(), s"$delayDays days")
      .writeStream.outputMode("append")
      .format("memory").queryName("first_seen_test").start()
    try {
      // two REAL micro-batches (addData after start + drain, not
      // before start, which would coalesce into one): batch 2's keys
      // find existing state, so the cross-batch min-merge branch runs
      mem.addData(b1.toSeq)
      q.processAllAvailable()
      mem.addData(b2.toSeq)
      q.processAllAvailable()
      // sentinel far past every event + delay pushes the watermark
      // over every key's minimum -> all first-seen states finalize
      val flushTs = rows.map(_._2).max + (delayDays + 1) * dayUs
      mem.addData(("~flush", flushTs, -1L, 0.0))
      q.processAllAvailable()
      mem.addData(("~flush", flushTs + 1, -2L, 0.0)) // timeouts evaluate
      q.processAllAvailable()
      val streamed = spark.table("first_seen_test")
        .as[EventStreams.FirstSeen].collect()
        .filter(_.key != "~flush")
        .map(f => (f.key, f.tsUs, f.id, f.value)).toSet
      val batch = rows.groupBy(_._1).map { case (_, rs) =>
        rs.minBy(r => (r._2, r._3))
      }.toSet
      assert(streamed == batch,
        s"missing ${batch -- streamed}, extra ${streamed -- batch}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream attribution interval join ≡ batch, ≡ q81 counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_micros, unix_micros}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val clicks = ev.filter(_._4 == "click").map(r => (r._1, r._2, r._3, r._5))
    val purchases = ev.filter(_._4 == "purchase")
      .map(r => (r._1, r._2, r._3, r._5))
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.toDF("user_id", "event_id", "us", "value")
        .withColumn("ts", timestamp_micros(col("us")))
    // delay covers the fixture's full event-time spread — the split
    // into micro-batches is arbitrary, so late-vs-watermark rows would
    // otherwise be dropped (same contract note as firstSeenStream)
    val delay = "4000 days"
    val cMem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, Double)]
    val pMem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, Double)]
    val joined = EventStreams.attributionPairs(
      withTs(cMem.toDS().toDF()), withTs(pMem.toDS().toDF()), delay = delay)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attr_stream_test").start()
    try {
      val (c1, c2) = clicks.splitAt(clicks.length / 2)
      val (p1, p2) = purchases.splitAt(purchases.length / 2)
      cMem.addData(c1.toSeq); pMem.addData(p1.toSeq)
      q.processAllAvailable()
      cMem.addData(c2.toSeq); pMem.addData(p2.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("attr_stream_test").collect()
        .map(_.toSeq).toSet
      val batch = EventStreams.attributionPairs(
        withTs(clicks.toSeq.toDF()), withTs(purchases.toSeq.toDF()),
        delay = delay).collect().map(_.toSeq).toSet
      assert(streamed == batch,
        s"missing ${batch -- streamed}, extra ${streamed -- batch}")
      assert(streamed.nonEmpty)
      // the pair counts are exactly q81's per-purchase click counts
      val pairCounts = streamed.toSeq.groupBy(r => (r(0), r(1)))
        .view.mapValues(_.size.toLong).toMap
      OlapQueries.purchaseAttribution(spark, sf).collect().foreach { r =>
        val n = pairCounts.getOrElse((r.getLong(0), r.getLong(1)), 0L)
        assert(n == r.getLong(4),
          s"purchase ${r.getLong(1)}: stream pairs $n vs q81 ${r.getLong(4)}")
      }
    } finally q.stop()
  }

  test("q20 batch query equals the shared streaming transform") {
    val viaOlap = OlapQueries.hourlyEventStats(spark, sf)
      .collect().map(_.toSeq).toSet
    val viaShared = EventStreams.hourlyAgg(Tables.load(spark, sf, "events"))
      .collect().map(_.toSeq).toSet
    assert(viaOlap == viaShared)
  }
}
