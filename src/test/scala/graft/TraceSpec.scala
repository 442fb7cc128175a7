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
}
