package graft

import org.scalatest.funsuite.AnyFunSuite

/** The mechanical bytes-regression rule: a synthetic previous
  * BENCHFULL artifact against synthetic current readings — the flag
  * must fire on >2× shuffle moves (both directions) and on spill
  * appearing where there was none, and stay silent on noise-sized
  * movers and unchanged plans.
  */
class BenchBytesSpec extends AnyFunSuite {

  private val M = 1L << 20

  private def prevArtifact(entries: (String, (Long, Long, Long))*): String =
    s"""{"sf":"x","moved_vs_prev":{"q9":1.4},"bytes":{""" +
      entries.map { case (n, (r, w, s)) =>
        s""""$n":{"shuffle_read":$r,"shuffle_write":$w,"spill":$s}"""
      }.mkString(",") + "}}"

  test("flags a >2x shuffle jump, a >2x drop, and new spill") {
    val prev = prevArtifact(
      "q1_jump" -> (10 * M, 10 * M, 0L),
      "q2_drop" -> (40 * M, 40 * M, 0L),
      "q3_spill" -> (5 * M, 5 * M, 0L),
      "q4_flat" -> (8 * M, 8 * M, 0L),
      "q5_tiny" -> (1000L, 1000L, 0L),
      "q6_gone" -> (9 * M, 9 * M, 0L))
    val cur = Map(
      "q1_jump" -> (50 * M, 50 * M, 0L), // 5x up
      "q2_drop" -> (10 * M, 10 * M, 0L), // 4x down — a plan change too
      "q3_spill" -> (5 * M, 5 * M, 123L), // spill appeared
      "q4_flat" -> (8 * M, 9 * M, 0L), // within 2x: silent
      "q5_tiny" -> (9000L, 9000L, 0L)) // 4.5x but < 1 MiB: noise-exempt
    val flags = Bench.byteMovers(prev, cur).toMap
    assert(flags.keySet == Set("q1_jump", "q2_drop", "q3_spill"),
      s"got $flags")
    assert(flags("q1_jump").contains("5.00x"))
    assert(flags("q3_spill").contains("new spill 123B"))
    // largest |log ratio| first: the 5x jump beats the 4x drop
    val ordered = Bench.byteMovers(prev, cur).map(_._1)
    assert(ordered.indexOf("q1_jump") < ordered.indexOf("q2_drop"))
  }

  test("no previous bytes object, or an unreadable one, flags nothing") {
    assert(Bench.byteMovers("""{"sf":"x"}""",
      Map("q1" -> (10 * M, 10 * M, 0L))).isEmpty)
    assert(Bench.byteMovers("", Map.empty).isEmpty)
  }

  test("a bytes_moved field in the previous artifact is not mistaken " +
      "for the bytes object") {
    // the marker must skip "bytes_moved":{...} and land on "bytes":{...}
    val prev = s"""{"bytes_moved_n":1,"bytes_moved":{"q7":"shuffle"},""" +
      s""""bytes":{"q1":{"shuffle_read":${10 * M},""" +
      s""""shuffle_write":${10 * M},"spill":0}}}"""
    val flags = Bench.byteMovers(prev,
      Map("q1" -> (50 * M, 50 * M, 0L)))
    assert(flags.map(_._1) == Seq("q1"))
  }
}
