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
    // ignore Hadoop LocalFileSystem's hidden .crc sidecars and the
    // "_"-prefixed manifest (metadata, not data — the source's own
    // visible-file contract)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(f => f.startsWith(".") || f.startsWith("_"))
    assert(files.nonEmpty &&
      files.forall(f => f.endsWith(".records") && !f.endsWith(".gz")))
    val n = spark.read.format("recordstream").load(dir).count()
    assert(n == 10L)
    val gzDir = tmpDir("gz")
    writePayloads(gzDir, 10, parts = 1)
    val gzFiles = new java.io.File(gzDir).listFiles().map(_.getName)
      .filterNot(f => f.startsWith(".") || f.startsWith("_"))
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
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_"))
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
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_"))
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

  test("manifest pruning: a point lookup plans a minority of files") {
    val dir = tmpDir("skip")
    // 12 files, payloads disjoint by construction (repartition hashes
    // rows arbitrarily but every payload lands in exactly one file)
    writePayloads(dir, 600, parts = 12)
    val target = encode(lit("rec-123"), "UTF-8")
    val unpruned = spark.read.format("recordstream").load(dir)
      .select(decode(col("value"), "UTF-8").as("s"))
      .as[String].collect().filter(_ == "rec-123").toSeq
    val lookup = spark.read.format("recordstream").load(dir)
      .filter(col("value") === target)
    // PLANNER metric: one read partition per surviving file — the
    // bloom probe must keep ~1 file (FPR at 600 keys in 2^17 bits is
    // ~0, but allow a couple) out of 12
    val planned = lookup.rdd.getNumPartitions
    assert(planned >= 1 && planned <= 3,
      s"point lookup planned $planned of 12 files")
    // the plan ADVERTISES the pruning (explain shows the pushed
    // filter and the pruned file count)
    val plan = lookup.queryExecution.executedPlan.toString
    assert(plan.contains("pruned:"),
      s"scan description must report pruning:\n$plan")
    // pruned ≡ unpruned results
    val got = lookup.select(decode(col("value"), "UTF-8").as("s"))
      .as[String].collect().toSeq
    assert(got == unpruned && got == Seq("rec-123"))
    // a MISSING key prunes everything (bloom has no false negatives,
    // so zero survivors is a correct plan, and the scan returns empty)
    val miss = spark.read.format("recordstream").load(dir)
      .filter(col("value") === encode(lit("no-such-record"), "UTF-8"))
    assert(miss.count() == 0L)
    // IN-lists prune too, to the union of candidate files
    val inq = spark.read.format("recordstream").load(dir)
      .filter(col("value").isin(
        encode(lit("rec-7"), "UTF-8"), encode(lit("rec-400"), "UTF-8")))
    assert(inq.rdd.getNumPartitions <= 4)
    assert(inq.select(decode(col("value"), "UTF-8").as("s"))
      .as[String].collect().toSet == Set("rec-7", "rec-400"))
  }

  test("manifest pruning: uncovered files always survive (no manifest, no skips)") {
    val dir = tmpDir("nomanifest")
    // hand-written file, no manifest sidecar — the pre-manifest shape
    val f = Paths.get(dir, "part-00000.records").toString
    val out = new DataOutputStream(new FileOutputStream(f))
    RecordStream.writeRecord(out, "legacy-a".getBytes("UTF-8"))
    RecordStream.writeRecord(out, "legacy-b".getBytes("UTF-8"))
    out.close()
    val lookup = spark.read.format("recordstream").load(dir)
      .filter(col("value") === encode(lit("legacy-b"), "UTF-8"))
    assert(lookup.rdd.getNumPartitions == 1,
      "uncovered files must not be pruned")
    assert(lookup.select(decode(col("value"), "UTF-8").as("s"))
      .as[String].collect().toSeq == Seq("legacy-b"))
    // overwrite drops stale manifests along with the data files
    writePayloads(dir, 4, parts = 2)
    (0 until 4).map(i => s"fresh-$i").toDF("s").repartition(2)
      .select(encode(col("s"), "UTF-8").as("value"))
      .write.format("recordstream").mode("overwrite").save(dir)
    val manifests = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("_manifest-"))
    assert(manifests.length == 1,
      s"overwrite must leave exactly the new manifest: ${manifests.toSeq}")
  }

  test("path equality prunes directly to the named file(s)") {
    val dir = tmpDir("pathprune")
    writePayloads(dir, 200, parts = 8)
    val full = spark.read.format("recordstream").load(dir)
    val somePath = full.select("path").head().getString(0)
    val one = spark.read.format("recordstream").load(dir)
      .filter(col("path") === somePath)
    assert(one.rdd.getNumPartitions == 1,
      "path equality must plan exactly the named file")
    // rows equal the residual-filtered full read
    assert(one.count() ==
      full.filter(col("path") === somePath).cache().count())
    val two = full.select("path").distinct().collect().map(_.getString(0))
      .sorted.take(2)
    val pair = spark.read.format("recordstream").load(dir)
      .filter(col("path").isin(two: _*))
    assert(pair.rdd.getNumPartitions == 2)
    // a path outside the directory plans zero files
    val none = spark.read.format("recordstream").load(dir)
      .filter(col("path") === "file:/no/such/file.records")
    assert(none.count() == 0L)
  }

  test("a torn manifest sidecar reads as absent coverage, never a failed scan") {
    val dir = tmpDir("tornmanifest")
    writePayloads(dir, 100, parts = 4)
    // simulate a crash mid-manifest-write: truncate the sidecar
    val manifest = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_manifest-")).head
    val bytes = Files.readAllBytes(manifest.toPath)
    Files.write(manifest.toPath, bytes.take(bytes.length / 2))
    val lookup = spark.read.format("recordstream").load(dir)
      .filter(col("value") === encode(lit("rec-42"), "UTF-8"))
    // no pruning possible (coverage unreadable) — but the scan WORKS
    assert(lookup.rdd.getNumPartitions == 4)
    assert(lookup.select(decode(col("value"), "UTF-8").as("s"))
      .as[String].collect().toSeq == Seq("rec-42"))
  }

  test("manifest bloom property: no false negatives for any payload set") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import graft.functions.BloomKernel
    import graft.sources.{RecordManifest, RecordStream}
    val gen = Gen.listOf(Gen.listOf(Gen.choose(Byte.MinValue,
      Byte.MaxValue)).map(_.toArray))
    val prop = forAll(gen) { payloads =>
      val bits = new Array[Long]((RecordManifest.NumBits + 63) / 64)
      payloads.foreach(p => BloomKernel.set(bits, RecordManifest.NumBits,
        RecordManifest.NumHashes, RecordStream.payloadKey(p)))
      val entry = RecordManifest.FileEntry(payloads.length.toLong,
        BloomKernel.serialize(bits, RecordManifest.NumBits,
          RecordManifest.NumHashes))
      // every written payload MUST probe positive (pruning a file that
      // holds the key would silently drop data)
      payloads.forall(p => RecordManifest.mightContain(entry,
        Seq(RecordStream.payloadKey(p))))
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100),
      prop)
    assert(res.passed, res.status.toString)
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

  test("S2 scan economics: the gzip frame decode dominates the row " +
      "materialization the DSv2 reader adds (the measured case for " +
      "keeping a row reader — PROFILE.md round-12)") {
    // ONE file so both paths are sequential and comparable: the
    // decode-only loop is the reader minus InternalRow construction;
    // the full path adds row materialization PLUS Spark scheduling
    // and the aggregate, so (full − decode) UPPER-BOUNDS what a
    // columnar reader could ever save.
    val dir = tmpDir("econ")
    spark.range(600000)
      .select(encode(concat(
        sha2(col("id").cast("string"), 256),
        sha2(col("id").cast("string"), 512)), "UTF-8").as("value"))
      .coalesce(1)
      .write.format("recordstream").option("compression", "gzip")
      .mode("append").save(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val parts = graft.sources.RecordStream
      .listVisibleFiles(dir, conf).values.toSeq
    assert(parts.length == 1)
    def decodeOnly(): Long = {
      var total = 0L
      parts.foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p.path)
        val in = graft.sources.RecordStream.openRead(
          hp.getFileSystem(conf).open(hp), p.path.endsWith(".gz"))
        try {
          var rec = graft.sources.RecordStream.readRecord(in, p.path)
          while (rec.isDefined) {
            total += rec.get.length
            rec = graft.sources.RecordStream.readRecord(in, p.path)
          }
        } finally in.close()
      }
      total
    }
    def fullScan(): Long =
      spark.read.format("recordstream").load(dir)
        .agg(sum(length(col("value"))).as("b"))
        .collect()(0).getLong(0)
    def time[A](b: => A): (A, Double) = {
      val s = System.nanoTime(); val r = b
      (r, (System.nanoTime() - s) / 1e6)
    }
    // warm both paths (JIT, codegen cache, page cache), then measure
    assert(decodeOnly() == fullScan())
    val (db, decodeMs) = time(decodeOnly())
    val (fb, fullMs) = time(fullScan())
    assert(db == fb && db > 100L * 1000 * 1000,
      s"payload bytes disagree or fixture too small: $db vs $fb")
    val share = decodeMs / math.max(fullMs, decodeMs)
    info(f"decode-only $decodeMs%.0f ms; full DSv2 scan $fullMs%.0f ms" +
      f" over ${db / 1024 / 1024} MB — decode share ≥ ${share * 100}%.0f%%" +
      " of the end-to-end scan (row materialization + scheduling +" +
      " agg is the remainder)")
    // not a timing flake-trap: only the sanity direction is asserted
    // (decode is a strict subset of the full path's work)
    assert(decodeMs > 0 && fullMs > 0)
  }
}
