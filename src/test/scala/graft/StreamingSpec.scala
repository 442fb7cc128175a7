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

  test("q20 batch query equals the shared streaming transform") {
    val viaOlap = OlapQueries.hourlyEventStats(spark, sf)
      .collect().map(_.toSeq).toSet
    val viaShared = EventStreams.hourlyAgg(Tables.load(spark, sf, "events"))
      .collect().map(_.toSeq).toSet
    assert(viaOlap == viaShared)
  }
}
