package graft

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.RecordStream

/** The `recordstream` DataSource V2 connector (SURVEY.md §2.1 S2 in
  * its genuine form): TFRecord-compatible framing (length +
  * masked crc32c), gzip codec, one file per write task / one
  * partition per read file, column pruning, reported statistics, and
  * loud failure on corruption.
  */
class RecordStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-rs-$tag").toString

  private def messages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x =>
      Option(x.getMessage).toSeq ++ messages(x.getCause))

  private def writePayloads(dir: String, n: Int, parts: Int,
      compression: String = "gzip"): Unit =
    (0 until n).map(i => s"rec-$i").toDF("s")
      .repartition(parts)
      .select(encode(col("s"), "UTF-8").as("value"))
      .write.format("recordstream")
      .option("compression", compression)
      .mode("append").save(dir)

  test("roundtrip: payloads survive, offsets are contiguous per file") {
    val dir = tmpDir("rt")
    writePayloads(dir, 100, parts = 4)
    val back = spark.read.format("recordstream").load(dir)
    assert(back.schema.fieldNames.toSeq == Seq("path", "offset", "value"))
    val got = back.select(decode(col("value"), "UTF-8").as("s"))
      .as[String].collect().toSet
    assert(got == (0 until 100).map(i => s"rec-$i").toSet)
    val perFile = back.groupBy("path")
      .agg(count(lit(1)).as("n"), min("offset").as("lo"),
        max("offset").as("hi"))
      .collect()
    assert(perFile.length == 4, "one file per write partition")
    perFile.foreach { r =>
      assert(r.getLong(2) == 0L, "offsets start at 0")
      assert(r.getLong(3) == r.getLong(1) - 1, "offsets are contiguous")
    }
  }

  test("uncompressed roundtrip; file naming reflects the codec") {
    val dir = tmpDir("plain")
    writePayloads(dir, 10, parts = 1, compression = "none")
    // ignore Hadoop LocalFileSystem's hidden .crc sidecars
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith("."))
    assert(files.nonEmpty &&
      files.forall(f => f.endsWith(".records") && !f.endsWith(".gz")))
    val n = spark.read.format("recordstream").load(dir).count()
    assert(n == 10L)
    val gzDir = tmpDir("gz")
    writePayloads(gzDir, 10, parts = 1)
    val gzFiles = new java.io.File(gzDir).listFiles().map(_.getName)
      .filterNot(_.startsWith("."))
    assert(gzFiles.nonEmpty && gzFiles.forall(_.endsWith(".records.gz")))
  }

  test("overwrite truncates prior contents, append accumulates") {
    val dir = tmpDir("ow")
    writePayloads(dir, 10, parts = 2)
    writePayloads(dir, 10, parts = 2) // append: 20 rows now
    assert(spark.read.format("recordstream").load(dir).count() == 20L)
    (100 until 105).map(i => s"new-$i").toDF("s")
      .repartition(1)
      .select(encode(col("s"), "UTF-8").as("value"))
      .write.format("recordstream").mode("overwrite").save(dir)
    val back = spark.read.format("recordstream").load(dir)
      .select(decode(col("value"), "UTF-8").as("s")).as[String].collect()
    assert(back.toSet == (100 until 105).map(i => s"new-$i").toSet)
  }

  test("corrupted payload fails loudly, not silently") {
    val dir = tmpDir("crc")
    val f = Paths.get(dir, "part-00000.records").toString
    val out = new DataOutputStream(new FileOutputStream(f))
    RecordStream.writeRecord(out, "hello world".getBytes("UTF-8"))
    out.close()
    // flip one payload byte (position: 8 len + 4 crc + 3rd byte)
    val bytes = Files.readAllBytes(Paths.get(f))
    bytes(14) = (bytes(14) ^ 0x01).toByte
    Files.write(Paths.get(f), bytes)
    val e = intercept[Exception] {
      spark.read.format("recordstream").load(dir).collect()
    }
    assert(messages(e).exists(_.contains("corrupt record payload")),
      s"expected checksum failure, got: $e")
  }

  test("truncated stream fails loudly") {
    val dir = tmpDir("trunc")
    val f = Paths.get(dir, "part-00000.records").toString
    val out = new DataOutputStream(new FileOutputStream(f))
    RecordStream.writeRecord(out, ("x" * 100).getBytes("UTF-8"))
    out.close()
    val bytes = Files.readAllBytes(Paths.get(f))
    Files.write(Paths.get(f), bytes.dropRight(60)) // cut mid-payload
    val e = intercept[Exception] {
      spark.read.format("recordstream").load(dir).collect()
    }
    assert(messages(e).exists(m =>
      m.contains("truncated record") || m.contains("corrupt record")),
      s"expected truncation failure, got: $e")
  }

  test("frame layout is TFRecord-compatible: LE length, LE masked crc32c") {
    // independent byte-level spelling of the published TFRecord frame —
    // a round-trip test alone cannot catch an endianness regression
    // because writer and reader would share it
    val payload = "hello tfrecord".getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    RecordStream.writeRecord(out, payload)
    out.close()
    val b = bos.toByteArray
    val bb = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def mask(crc: Int): Int = ((crc >>> 15) | (crc << 17)) + 0xa282ead8
    def crc32c(bytes: Array[Byte]): Int = {
      val c = new java.util.zip.CRC32C
      c.update(bytes)
      c.getValue.toInt
    }
    assert(b.length == 8 + 4 + payload.length + 4)
    assert(bb.getLong(0) == payload.length.toLong, "LE uint64 length")
    assert(bb.getInt(8) == mask(crc32c(b.slice(0, 8))), "LE length crc")
    assert(b.slice(12, 12 + payload.length).sameElements(payload))
    assert(bb.getInt(12 + payload.length) == mask(crc32c(payload)),
      "LE payload crc")
  }

  test("gz stats scale by spark.sql.sources.fileCompressionFactor") {
    val dir = tmpDir("statsf")
    writePayloads(dir, 50, parts = 1)
    val onDisk = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .map(_.length()).sum
    spark.conf.set("spark.sql.sources.fileCompressionFactor", "3.0")
    try {
      val size = spark.read.format("recordstream").load(dir)
        .queryExecution.optimizedPlan.stats.sizeInBytes
      assert(size == BigInt((onDisk * 3.0).toLong),
        s"gz size $size should be 3x on-disk $onDisk")
    } finally
      spark.conf.set("spark.sql.sources.fileCompressionFactor", "1.0")
  }

  test("column pruning reaches the scan; value-only never builds paths") {
    val dir = tmpDir("prune")
    writePayloads(dir, 20, parts = 2)
    val df = spark.read.format("recordstream").load(dir).select("value")
    val leaves = df.queryExecution.executedPlan.collectLeaves()
    assert(leaves.nonEmpty)
    assert(leaves.head.output.map(_.name) == Seq("value"),
      s"scan must prune to the required columns:\n${df.queryExecution}")
  }

  test("the scan reports on-disk statistics to the planner") {
    val dir = tmpDir("stats")
    writePayloads(dir, 50, parts = 2)
    val onDisk = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .map(_.length()).sum
    val rel = spark.read.format("recordstream").load(dir)
    val size = rel.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(size == BigInt(onDisk),
      s"planner stats $size must equal on-disk bytes $onDisk")
  }

  test("micro-batch streaming read picks up appended files (stream ≡ batch)") {
    val dir = tmpDir("stream")
    writePayloads(dir, 5, parts = 1)
    val q = spark.readStream.format("recordstream").load(dir)
      .select(decode(col("value"), "UTF-8").as("s"))
      .writeStream.outputMode("append").format("memory")
      .queryName("recordstream_stream_test").start()
    try {
      q.processAllAvailable()
      assert(spark.table("recordstream_stream_test").count() == 5L)
      // append a second generation of files — the next micro-batch
      // must read ONLY the new ones (offset = seen-file set)
      (100 until 107).map(i => s"rec-$i").toDF("s").repartition(1)
        .select(encode(col("s"), "UTF-8").as("value"))
        .write.format("recordstream").mode("append").save(dir)
      q.processAllAvailable()
      val got = spark.table("recordstream_stream_test")
        .as[String].collect().toSet
      val batch = spark.read.format("recordstream").load(dir)
        .select(decode(col("value"), "UTF-8").as("s"))
        .as[String].collect().toSet
      assert(got == batch && got.size == 12, s"stream $got vs batch $batch")
    } finally q.stop()
  }

  test("streaming offsets round-trip arbitrary file names") {
    import graft.sources.RecordFilesOffset
    val o = RecordFilesOffset(Seq("""a,"b".records""", "plain.records",
      "unié.records"))
    val back = RecordFilesOffset.fromJson(o.json())
    assert(back.names.toSet == o.names.toSet)
    assert(RecordFilesOffset.fromJson(
      RecordFilesOffset(Nil).json()).names.isEmpty)
  }

  test("q108 recordstream aggregate equals the parquet-side aggregate") {
    val viaRecords = operators.CoreQueries.recordStreamAgg(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val direct = graft.sources.Tables.load(spark, sf, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("sum_ids"),
        sum(length(col("text"))).as("sum_chars"))
      .orderBy("lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(viaRecords.toSeq == direct.toSeq)
  }
}
