package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{MediaRow, Multimodal}

class MultimodalSpec extends SparkSpec {

  test("mediaTable: schema contract (id, type tag, binary, metadata)") {
    val df = Multimodal.mediaTable(spark, sf).toDF()
    assert(df.schema.fieldNames.toSeq ==
      Seq("media_id", "media_type", "payload", "declared_bytes"))
    assert(df.schema("payload").dataType.typeName == "binary")
    val types = df.select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("extractFeatures: one row per item, normalized stub features") {
    val media = Multimodal.mediaTable(spark, sf)
    val feats = Multimodal.extractFeatures(media, batchSize = 16)
    assert(feats.count() == media.count())
    val r = feats.head()
    assert(r.feat.length == Multimodal.StubCodec.FeatureDim)
    assert(math.abs(r.feat.sum - 1f) < 1e-5) // histogram normalized
    assert(r.n_bytes > 0)
  }

  test("extractFeatures is batch-size invariant and deterministic") {
    val media = Multimodal.mediaTable(spark, sf)
    def run(bs: Int) = Multimodal.extractFeatures(media, bs)
      .collect().map(f => f.media_id -> f.feat.toSeq).toMap
    assert(run(1) == run(1000))
  }

  test("sampleFrames: stride-spaced chunk rows for video payloads") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      MediaRow(1L, "video", Array.fill[Byte](256)(7), 256L),
      MediaRow(2L, "image", Array.fill[Byte](256)(7), 256L),
      MediaRow(3L, "video", Array.fill[Byte](10)(7), 10L), // < 1 chunk
      MediaRow(4L, "video", Array.empty[Byte], 0L)))       // empty
    val frames = Multimodal.sampleFrames(media, frameBytes = 32, stride = 4)
    val rows = frames.collect()
    assert(rows.forall(_.getLong(0) == 1L),
      "image / sub-chunk / empty payloads must produce no rows")
    // 256/32 = 8 chunks, stride 4 -> chunk indices 0 and 4 (stream
    // positions, not sample ordinals)
    assert(rows.map(_.getInt(1)).toSeq.sorted == Seq(0, 4))
    assert(rows.forall(_.getInt(2) == 32))
  }

  test("PpmCodec round-trips and rejects malformed payloads") {
    import graft.multimodal.Multimodal.PpmCodec
    val rgb = Array.tabulate(8 * 8 * 3)(i => ((i * 37 + 11) % 256).toByte)
    val img = PpmCodec.encode(8, 8, rgb)
    val d = PpmCodec.decode(img).get
    assert(d.width == 8 && d.height == 8)
    def mean(ch: Int) =
      rgb.indices.filter(_ % 3 == ch).map(rgb(_) & 0xFF).sum / 64.0
    assert(d.meanR == mean(0) && d.meanG == mean(1) && d.meanB == mean(2))
    // comment-tolerant header (the netpbm spec allows # lines)
    val commented = "P6\n# a comment\n8 8\n255\n".getBytes("US-ASCII") ++ rgb
    assert(PpmCodec.decode(commented).contains(d))
    // malformed: wrong magic, truncated raster, absurd dims, bad maxval
    assert(PpmCodec.decode("P5\n8 8\n255\n".getBytes ++ rgb).isEmpty)
    assert(PpmCodec.decode(img.dropRight(1)).isEmpty)
    assert(PpmCodec.decode("P6\n99999999 8\n255\n".getBytes ++ rgb).isEmpty)
    assert(PpmCodec.decode("P6\n8 8\n65535\n".getBytes ++ rgb).isEmpty)
    assert(PpmCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("decodeImages: real parse agrees with the synthesis arithmetic") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 % 3 == 0)
    val expected = docs.map { case (id, text) =>
      val raster = text.take(192).padTo(192, ' ').map(_.toInt)
      def mean(ch: Int) = {
        val v = raster.indices.filter(_ % 3 == ch).map(raster(_)).sum / 64.0
        BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      (id, 8, 8, mean(0), mean(1), mean(2))
    }.sortBy(_._1)
    val got = graft.multimodal.Multimodal.decodeImages(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected.toSeq)
    assert(got.nonEmpty)
  }

  test("PpmCodec.resizeNearest samples the exact nearest-neighbor pixels") {
    import graft.multimodal.Multimodal.PpmCodec
    val rgb = Array.tabulate(8 * 8 * 3)(i => ((i * 37 + 11) % 256).toByte)
    val img = PpmCodec.encode(8, 8, rgb)
    // identity resize is byte-for-byte the original raster
    val same = PpmCodec.resizeNearest(img, 8, 8).get
    assert(PpmCodec.decode(same) == PpmCodec.decode(img))
    // 4×4: target (y, x) samples source (2y, 2x) — replicate by hand
    val down = PpmCodec.resizeNearest(img, 4, 4).get
    val d = PpmCodec.decode(down).get
    assert(d.width == 4 && d.height == 4)
    def mean(ch: Int) = (for (y <- 0 until 4; x <- 0 until 4)
      yield rgb(((2 * y) * 8 + 2 * x) * 3 + ch) & 0xFF).sum / 16.0
    assert(d.meanR == mean(0) && d.meanG == mean(1) && d.meanB == mean(2))
    // upscale repeats pixels (nearest-neighbor), means preserved
    val up = PpmCodec.decode(PpmCodec.resizeNearest(img, 16, 16).get).get
    assert(up.width == 16 && up.height == 16)
    // malformed inputs refuse like decode
    assert(PpmCodec.resizeNearest(img.dropRight(1), 4, 4).isEmpty)
    assert(PpmCodec.resizeNearest("P5\n8 8\n255\n".getBytes ++ rgb,
      4, 4).isEmpty)
    assert(PpmCodec.resizeNearest(img, 0, 4).isEmpty)
  }

  test("WavCodec round-trips and rejects malformed payloads") {
    import graft.multimodal.Multimodal.WavCodec
    val samples = Array.tabulate(100)(i =>
      ((i * 997 + 13) % 65536 - 32768).toShort)
    val wav = WavCodec.encode(16000, samples)
    val d = WavCodec.decode(wav).get
    assert(d.sampleRate == 16000 && d.nSamples == 100)
    assert(d.sumSamples == samples.map(_.toLong).sum)
    assert(d.peakAbs == samples.map(s => math.abs(s.toInt)).max)
    // chunk-walk tolerance: an unknown (odd-sized, hence padded) LIST
    // chunk between fmt and data must be skipped, not tripped over
    val header = wav.take(36) // RIFF..fmt chunk
    val data = wav.drop(36)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // size 3 + pad
    val withList = header ++ listChunk ++ data
    assert(WavCodec.decode(withList).contains(d))
    // malformed classes: wrong magic, truncated data chunk, non-PCM
    // format tag, stereo/8-bit (not the mono-16 contract), no data
    assert(WavCodec.decode("RIFX".getBytes ++ wav.drop(4)).isEmpty)
    assert(WavCodec.decode(wav.dropRight(1)).isEmpty)
    val nonPcm = wav.clone(); nonPcm(20) = 3 // format tag -> IEEE float
    assert(WavCodec.decode(nonPcm).isEmpty)
    val eightBit = wav.clone(); eightBit(34) = 8
    assert(WavCodec.decode(eightBit).isEmpty)
    assert(WavCodec.decode(wav.take(36)).isEmpty) // fmt but no data
    assert(WavCodec.decode(Array.empty[Byte]).isEmpty)
    // zero samples is a VALID wav (n = 0, sums 0)
    val empty = WavCodec.decode(WavCodec.encode(8000, Array.empty)).get
    assert(empty.nSamples == 0 && empty.sumSamples == 0L &&
      empty.peakAbs == 0)
  }

  test("wavDecimate keeps exactly every k-th sample; malformed refuse") {
    import graft.multimodal.Multimodal.{WavCodec, wavDecimate}
    val samples = Array.tabulate(101)(i =>
      ((i * 911 + 5) % 65536 - 32768).toShort)
    val wav = WavCodec.encode(16000, samples)
    val d2 = WavCodec.decode(wavDecimate(wav, 2).get).get
    val kept = samples.indices.filter(_ % 2 == 0).map(samples(_))
    assert(d2.sampleRate == 8000 && d2.nSamples == 51)
    assert(d2.sumSamples == kept.map(_.toLong).sum)
    assert(d2.peakAbs == kept.map(s => math.abs(s.toInt)).max)
    // factor 1 is the identity
    assert(WavCodec.decode(wavDecimate(wav, 1).get)
      .contains(WavCodec.decode(wav).get))
    // factor beyond the clip keeps just sample 0
    val d200 = WavCodec.decode(wavDecimate(wav, 200).get).get
    assert(d200.nSamples == 1 && d200.sumSamples == samples(0).toLong)
    assert(wavDecimate(wav.dropRight(1), 2).isEmpty)
    assert(wavDecimate(wav, 0).isEmpty)
  }

  test("audioFeatures: real RIFF parse agrees with the synthesis arithmetic") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(d => d._1 % 3 == 1 && d._2.nonEmpty)
    val expected = docs.map { case (id, text) =>
      val s = text.take(256).map(c => (c.toInt & 0xFF) * 256 - 32768)
      (id, 8000L + (id % 3) * 4000L, s.length.toLong,
        s.map(_.toLong).sum, s.map(v => math.abs(v).toLong).max)
    }.sortBy(_._1).toSeq
    val got = graft.multimodal.Multimodal.audioFeatures(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("WavCodec property: encode→decode recovers exact features for any samples") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import graft.multimodal.Multimodal.WavCodec
    val gen = for {
      rate <- Gen.choose(1, 192000)
      n <- Gen.choose(0, 300)
      samples <- Gen.listOfN(n, Gen.choose(Short.MinValue, Short.MaxValue))
    } yield (rate, samples.map(_.toShort).toArray)
    val prop = forAll(gen) { case (rate, samples) =>
      val d = WavCodec.decode(WavCodec.encode(rate, samples))
      d.contains(WavCodec.Decoded(rate, samples.length,
        samples.map(_.toLong).sum,
        if (samples.isEmpty) 0
        else samples.map(s => math.abs(s.toInt)).max))
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("audioFrameFeatures: framing, energy, DC-removed crossings vs a driver replica") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(d => d._1 % 3 == 1 && d._2.nonEmpty)
    val expected = docs.flatMap { case (id, text) =>
      val s = text.take(256).map(c => (c.toInt & 0xFF) * 256 - 32768)
      s.grouped(64).filter(_.length == 64).zipWithIndex.map {
        case (frame, f) =>
          val sum = frame.map(_.toLong).sum
          val neg = frame.map(v => v.toLong * 64 < sum)
          (id, f.toLong,
            frame.map(v => v.toLong * v).sum,
            neg.sliding(2).count(w => w(0) != w(1)).toLong)
      }
    }.sortBy(e => (e._1, e._2)).toSeq
    val got = Multimodal.audioFrameFeatures(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // the DC-removed feature must be non-degenerate on this corpus
    // (raw sign flips would be constant 0 — every synthesis sample is
    // negative)
    assert(got.exists(_._4 > 0))
  }

  test("imageHistograms: bin counts vs a driver replica; channels sum to the raster") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._1 % 3 == 0)
    val expected = docs.flatMap { case (id, text) =>
      val p = text.take(192).padTo(192, ' ')
      p.zipWithIndex
        .groupBy { case (c, i) => (i % 3, (c.toInt & 0xFF) / 64) }
        .map { case ((ch, bin), xs) =>
          (id, ch.toLong, bin.toLong, xs.length.toLong) }
    }.sortBy(e => (e._1, e._2, e._3)).toSeq
    val got = Multimodal.imageHistograms(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // per (image, channel) the bins partition the 64 pixels
    got.groupBy(e => (e._1, e._2)).foreach { case (_, bins) =>
      assert(bins.map(_._4).sum == 64L)
    }
  }

  test("imageHistograms: a binSize that does not divide 256 still bins every pixel") {
    // 48 → ceil(256/48) = 6 bins; pixel 255 lands in bin 5, in range
    val got = Multimodal.imageHistograms(spark, sf, binSize = 48)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    assert(got.forall(e => e._3 >= 0 && e._3 < 6), "bin out of range")
    got.groupBy(e => (e._1, e._2)).foreach { case (_, bins) =>
      assert(bins.map(_._4).sum == 64L) // every pixel binned
    }
  }

  test("frameDigests: sha-256 of the exact sampled slices, stride arithmetic") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(d => d._1 % 3 == 2 && d._2.length >= 32)
    val expected = docs.flatMap { case (id, text) =>
      val nChunks = text.length / 32
      (0 until nChunks by 4).map { ci =>
        val slice = text.substring(ci * 32, ci * 32 + 32)
          .getBytes("UTF-8")
        val hex = java.security.MessageDigest.getInstance("SHA-256")
          .digest(slice).map("%02x".format(_)).mkString
        (id, ci.toLong, hex)
      }
    }.sortBy(e => (e._1, e._2)).toSeq
    val got = Multimodal.frameDigests(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("payload pruning: metadata-only projection skips the binary column") {
    val plan = Multimodal.mediaTable(spark, sf).toDF()
      .select("media_id", "declared_bytes")
      .queryExecution.executedPlan.toString
    assert(plan.contains("doc_id") && !plan.contains("text"),
      s"binary source column not pruned:\n$plan")
  }
}
