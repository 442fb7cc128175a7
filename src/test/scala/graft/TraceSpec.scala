package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.plans.TraceCapture

class TraceSpec extends SparkSpec {

  test("trace capture appends per-operator metrics for each execution") {
    val dir = Files.createTempDirectory("graft-trace")
    val path = dir.resolve("timeline.jsonl").toString
    val listener = TraceCapture.install(spark, path)
    try {
      spark.read.parquet(s"$sf/nation.parquet")
        .groupBy("n_regionkey").count()
        .write.format("noop").mode("overwrite").save()
      // QueryExecutionListener delivery is async — poll for the line
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var lines = Seq.empty[String]
      while (lines.isEmpty && System.nanoTime() < deadline) {
        if (Files.exists(Paths.get(path)))
          lines = Files.readAllLines(Paths.get(path)).asScala.toSeq
        if (lines.isEmpty) Thread.sleep(50)
      }
      assert(lines.nonEmpty, "no trace line written within 10s")
      val line = lines.last
      assert(line.contains("\"event\":\"query\""), line)
      assert(line.contains("\"wall_ms\":"), line)
      // the aggregate's operator metrics must be present — that's the
      // profiler half Bench's wall clock can't see
      assert(line.contains("HashAggregate") || line.contains("Aggregate"), line)
      assert(line.contains("numOutputRows") || line.contains("metrics"), line)
    } finally {
      TraceCapture.uninstall(spark, listener)
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }

  test("chrome-trace export drives the reference's flagship analysis") {
    // deterministic fixture lines in the listener's own JSONL shape
    val lines = Seq(
      """{"event":"query","name":"q_alpha","wall_ms":120,"ts_ms":1000120,""" +
        """"operators":[{"op":"HashAggregate","depth":0,"metrics":""" +
        """{"numOutputRows":5}},{"op":"Scan parquet","depth":1,""" +
        """"metrics":{"numOutputRows":6000}}]}""",
      """{"event":"query","name":"q_beta","wall_ms":40,"ts_ms":1000160,""" +
        """"operators":[{"op":"Filter","depth":0,"metrics":""" +
        """{"numOutputRows":100}}]}""",
      """{"event":"query_failed","name":"q_bad","error":"Boom"}""",
      "not json at all")
    val chrome = TraceCapture.chromeTraceJson(lines.iterator)
    val dir = Files.createTempDirectory("graft-chrome")
    val f = dir.resolve("timeline_merged.json")
    Files.writeString(f, chrome)
    try {
      // the reference's notebook path verbatim: JSON load with schema
      // AUTODETECTION (S4), lateral UNNEST of traceEvents (J1), then
      // the cell-8 aggregate over durations (A1+O1+O2)
      val traces = spark.read.option("multiLine", "true").json(f.toString)
      assert(traces.schema.fieldNames.contains("traceEvents"))
      val flat = traces
        .select(posexplode(col("traceEvents")).as(Seq("index", "ev")))
        .select(col("index"), col("ev.ph").as("ph"), col("ev.name").as("name"),
          col("ev.ts").as("ts"), col("ev.dur").as("dur"))
      assert(flat.count() == 2L, "one event per successful query")
      val top = flat.groupBy("name")
        .agg(sum("dur").as("total_dur"), avg("dur").as("avg_dur"))
        .orderBy(desc("total_dur")).limit(20).collect()
      assert(top.head.getString(0) == "q_alpha" &&
        top.head.getLong(1) == 120000L, "µs duration of the slow query")
      assert(top(1).getString(0) == "q_beta" && top(1).getLong(1) == 40000L)
      // complete events: start ts = (ts_ms - wall_ms) µs, X phase
      val alpha = flat.filter(col("name") === "q_alpha").collect().head
      assert(alpha.getString(1) == "X")
      assert(alpha.getLong(3) == 1000000000L)
    } finally {
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }
}
