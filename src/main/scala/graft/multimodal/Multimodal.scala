package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** A media row: opaque binary payload + typed metadata. At 100 TB the
  * payload column lives in parquet binary chunks next to its metadata
  * — scan tasks prune to metadata-only reads unless the payload is
  * actually consumed.
  */
case class MediaRow(
    media_id: Long,
    media_type: String, // "image" | "audio" | "video"
    payload: Array[Byte],
    declared_bytes: Long)

/** Stub-decoded per-item features. `feat` stands in for the output of
  * a real decoder (pixel stats, mel bands, ...).
  */
case class MediaFeatures(
    media_id: Long,
    media_type: String,
    n_bytes: Int,
    feat: Array[Float])

/** Multimodal column plumbing: treat image/audio/video as opaque
  * `binary` columns with typed metadata, and run decode /
  * feature-extract as a batched per-partition pass — the Scala twin of
  * a Pandas-UDF `mapInPandas` stage (same batch shape, same schema
  * contract). The decode itself is a STUB (this container has no image
  * or audio codecs): [[StubCodec.decodeFeatures]] is a deterministic
  * fake with the real signature, so the Spark-side plumbing — schema,
  * batching, partitioning — is fully real and tested, and a production
  * codec drops in by replacing one function.
  */
object Multimodal {

  /** STUB decoder — deterministic fake standing in for e.g. JPEG
    * decode + pooling. Replace with a real codec when the runtime has
    * one; everything downstream is agnostic to this body.
    */
  object StubCodec {
    val FeatureDim = 8

    def decodeFeatures(payload: Array[Byte]): Array[Float] = {
      // fake "decode": byte histogram folded to FeatureDim buckets —
      // stable across runs, sensitive to content, cheap.
      val acc = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        acc((payload(i) & 0xFF) % FeatureDim) += 1f
        i += 1
      }
      val n = math.max(1, payload.length).toFloat
      acc.map(_ / n)
    }
  }

  /** A REAL image codec — netpbm P6 (binary PPM), implemented in pure
    * JVM bytes so no native libraries are required: magic check,
    * whitespace/comment-tolerant header scan (width, height, maxval),
    * then channel means over the RGB raster. PPM is a genuine
    * interchange format (netpbm/ImageMagick read the same bytes);
    * this is the "decode" step of the multimodal pipeline made real
    * where heavier codecs (JPEG/PNG) would need libs this container
    * lacks. Malformed payloads (wrong magic, truncated raster,
    * oversized dims) return None rather than throwing — a decode
    * pass over a dirty corpus must skip, not die.
    */
  object PpmCodec {
    val MaxDim = 1 << 14

    case class Decoded(width: Int, height: Int,
        meanR: Double, meanG: Double, meanB: Double)

    def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3, "raster size mismatch")
      s"P6\n$width $height\n255\n".getBytes("US-ASCII") ++ rgb
    }

    /** (width, height, rasterOffset) from a well-formed P6 header with
      * a complete raster — THE header parse, shared by [[decode]] and
      * [[resizeNearest]] so a tolerance fix applies to both: magic
      * check, whitespace/comment-tolerant integer scan (width, height,
      * maxval — 255 only), one separator byte, raster length check.
      * None on any malformation.
      */
    private[multimodal] def header(payload: Array[Byte])
        : Option[(Int, Int, Int)] = {
      var i = 0
      def skipSpaceAndComments(): Unit = {
        var go = true
        while (go && i < payload.length) {
          val c = payload(i)
          if (c == '#') { while (i < payload.length && payload(i) != '\n') i += 1 }
          else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
          else go = false
        }
      }
      def int(): Int = {
        skipSpaceAndComments()
        var v = 0; var any = false
        while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
          v = v * 10 + (payload(i) - '0'); i += 1; any = true
          if (v > MaxDim * MaxDim) return -1
        }
        if (any) v else -1
      }
      if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6')
        return None
      i = 2
      val (w, h, maxval) = (int(), int(), int())
      if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim || maxval != 255)
        return None
      i += 1 // exactly one whitespace byte separates header and raster
      if (payload.length - i < w.toLong * h * 3) return None
      Some((w, h, i))
    }

    def decode(payload: Array[Byte]): Option[Decoded] =
      header(payload).map { case (w, h, raster) =>
        var (r, g, b) = (0L, 0L, 0L)
        var p = raster
        val end = raster + w * h * 3
        while (p < end) {
          r += payload(p) & 0xFF
          g += payload(p + 1) & 0xFF
          b += payload(p + 2) & 0xFF
          p += 3
        }
        val n = (w.toLong * h).toDouble
        Decoded(w, h, r / n, g / n, b / n)
      }

    /** REAL nearest-neighbor RESIZE — the multimodal pipeline's third
      * named op (decode / feature-extract / RESIZE / frame-sample):
      * parse the header with the same tolerant scan as [[decode]],
      * sample source pixel (⌊i·h/h2⌋, ⌊j·w/w2⌋) for each target
      * pixel, re-encode as a valid P6. The index arithmetic is exact
      * integer division, so an oracle can replay the sampled-pixel
      * positions verbatim. Malformed inputs return None like decode.
      */
    def resizeNearest(payload: Array[Byte], w2: Int,
        h2: Int): Option[Array[Byte]] = {
      if (w2 <= 0 || h2 <= 0 || w2 > MaxDim || h2 > MaxDim) return None
      header(payload).map { case (w, h, raster) =>
        val out = new Array[Byte](w2 * h2 * 3)
        var y = 0
        while (y < h2) {
          val sy = (y.toLong * h / h2).toInt
          var x = 0
          while (x < w2) {
            val sx = (x.toLong * w / w2).toInt
            val src = raster + (sy * w + sx) * 3
            val dst = (y * w2 + x) * 3
            out(dst) = payload(src)
            out(dst + 1) = payload(src + 1)
            out(dst + 2) = payload(src + 2)
            x += 1
          }
          y += 1
        }
        encode(w2, h2, out)
      }
    }
  }

  /** A REAL audio codec — RIFF/WAVE PCM, pure JVM bytes: RIFF magic,
    * a tolerant CHUNK WALK (fmt need not be first; unknown chunks like
    * LIST/INFO skip by their declared size, odd sizes pad per spec),
    * then 16-bit little-endian PCM samples from the data chunk. WAV is
    * a genuine interchange format (sox/ffmpeg read the same bytes) —
    * the audio sibling of [[PpmCodec]], making the "decode" step real
    * where heavier codecs (MP3/FLAC) would need libs this container
    * lacks. Features are INTEGER-exact (count, sum, peak absolute
    * amplitude) so an oracle can replay them with no float jitter.
    * Malformed payloads (wrong magic, non-PCM, truncated data,
    * 8/24-bit) return None — a decode pass over a dirty corpus must
    * skip, not die.
    */
  object WavCodec {
    case class Decoded(sampleRate: Int, nSamples: Int,
        sumSamples: Long, peakAbs: Int)

    /** Mono 16-bit PCM encode — the synthesis half (and the spec's
      * roundtrip witness).
      */
    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII"))
      bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII"))
      bb.putInt(16) // PCM fmt chunk length
      bb.putShort(1) // format tag: PCM
      bb.putShort(1) // channels: mono
      bb.putInt(sampleRate)
      bb.putInt(sampleRate * 2) // byte rate
      bb.putShort(2) // block align
      bb.putShort(16) // bits per sample
      bb.put("data".getBytes("US-ASCII"))
      bb.putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    private[multimodal] def leShort(payload: Array[Byte], at: Int): Int =
      (payload(at) & 0xFF) | ((payload(at + 1) & 0xFF) << 8)

    /** (sampleRate, dataOffset, nSamples) from the RIFF chunk walk —
      * THE layout parse, shared by [[decode]] and
      * [[Multimodal.wavDecimate]] so a header-tolerance fix applies to
      * both: RIFF/WAVE magic, chunks walked by declared size (fmt
      * need not be first; unknown chunks like LIST/INFO skip; odd
      * sizes pad per spec), mono 16-bit PCM fmt required, truncated
      * chunks rejected (a data chunk promising more bytes than exist
      * is the classic corrupt-file shape). None on any malformation.
      */
    private[multimodal] def pcm16MonoLayout(payload: Array[Byte])
        : Option[(Int, Int, Int)] = {
      def ascii(at: Int, s: String): Boolean =
        (0 until s.length).forall(k => payload(at + k) == s.charAt(k))
      def leInt(at: Int): Int =
        (payload(at) & 0xFF) | ((payload(at + 1) & 0xFF) << 8) |
          ((payload(at + 2) & 0xFF) << 16) | ((payload(at + 3) & 0xFF) << 24)
      if (payload.length < 12 || !ascii(0, "RIFF") || !ascii(8, "WAVE"))
        return None
      var pos = 12
      var fmtPcm16Mono = false
      var rate = -1
      var data = -1 // data chunk payload offset
      var dataLen = -1
      while (pos + 8 <= payload.length) {
        val size = leInt(pos + 4)
        if (size < 0) return None
        val body = pos + 8
        if (body + size > payload.length) return None
        if (ascii(pos, "fmt ") && size >= 16) {
          fmtPcm16Mono = leShort(payload, body) == 1 &&
            leShort(payload, body + 2) == 1 &&
            leShort(payload, body + 14) == 16
          rate = leInt(body + 4)
        } else if (ascii(pos, "data")) {
          data = body
          dataLen = size
        }
        pos = body + size + (size & 1) // RIFF pads odd chunks
      }
      if (!fmtPcm16Mono || rate <= 0 || data < 0) None
      else Some((rate, data, dataLen / 2))
    }

    def decode(payload: Array[Byte]): Option[Decoded] =
      pcm16MonoLayout(payload).map { case (rate, data, n) =>
        var i = data
        var sum = 0L
        var peak = 0
        val end = data + n * 2
        while (i < end) {
          val s = (leShort(payload, i) << 16) >> 16 // sign-extend
          sum += s
          val a = math.abs(s)
          if (a > peak) peak = a
          i += 2
        }
        Decoded(rate, n, sum, peak)
      }
  }

  /** REAL audio DECIMATION — the resample sibling of
    * [[PpmCodec.resizeNearest]]: the same tolerant RIFF chunk walk as
    * [[WavCodec.decode]], keep every `factor`-th sample, re-encode as
    * a valid mono PCM wav at rate/factor. (Plain decimation, no
    * anti-alias filter — the sampling positions are exact integer
    * arithmetic, which is what makes the op oracle-replayable; a
    * production resampler swaps in a filter kernel at this same seam.)
    */
  def wavDecimate(payload: Array[Byte], factor: Int): Option[Array[Byte]] = {
    if (factor <= 0) return None
    WavCodec.pcm16MonoLayout(payload).map { case (rate, data, n) =>
      val kept = new Array[Short]((n + factor - 1) / factor)
      var j = 0
      var i = 0
      while (i < n) {
        val at = data + i * 2
        kept(j) = ((WavCodec.leShort(payload, at) << 16) >> 16).toShort
        j += 1
        i += factor
      }
      WavCodec.encode(math.max(1, rate / factor), kept)
    }
  }

  /** q161: decimate-then-decode over [[audioTable]] — every clip
    * downsamples 2× through [[wavDecimate]] (REAL chunk walk, sample
    * selection, re-encode) and the resampled bytes decode back
    * through [[WavCodec.decode]]; integer-exact features as in q34.
    * The oracle replays the kept-sample positions (every other text
    * char) straight from the synthesis.
    */
  def resampleAudio(spark: SparkSession, sfDir: String,
      factor: Int = 2): DataFrame = {
    import spark.implicits._
    audioTable(spark, sfDir)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(64).flatMap(_.iterator.flatMap { case (id, bytes) =>
          wavDecimate(bytes, factor)
            .flatMap(WavCodec.decode)
            .map(d => (id, d.sampleRate.toLong, d.nSamples.toLong,
              d.sumSamples, d.peakAbs.toLong))
        })
      }
      .toDF("media_id", "sample_rate", "n_samples", "sum_samples",
        "peak_abs")
      .orderBy("media_id")
  }

  /** The media table, synthesized from documents (text bytes play the
    * payload role — the testdata ships no real media). Demonstrates
    * the schema contract: id + type tag + binary + declared metadata.
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"),
        col("n_chars").as("declared_bytes"))
      .as[MediaRow]
  }

  /** Batched feature extraction: mapPartitions with `batchSize`-row
    * groups — the execution shape of an Arrow-batched Python UDF,
    * kept in the JVM. One pass, no shuffle; partition count (not
    * batch size) controls parallelism.
    */
  def extractFeatures(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real decoder would amortize setup per batch here
        batch.iterator.map { m =>
          MediaFeatures(m.media_id, m.media_type, m.payload.length,
            StubCodec.decodeFeatures(m.payload))
        }
      }
    }
  }

  /** Frame sampling for "video" payloads: every `stride`-th full
    * `frameBytes`-sized chunk of the byte stream as one frame row.
    * `chunk_idx` is the chunk's position in the stream (byte offset =
    * chunk_idx × frameBytes), not the sample ordinal; payloads shorter
    * than one full chunk produce no rows.
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 32,
      stride: Int = 4): DataFrame = {
    val video = media.filter(col("media_type") === "video" &&
      length(col("payload")) >= frameBytes)
    val lastChunk = (length(col("payload")) / frameBytes).cast("int") - 1
    video.select(
        col("media_id"),
        explode(transform(
          sequence(lit(0), lastChunk, lit(stride)),
          off => struct(off.as("chunk_idx"),
            substring(col("payload"), off * frameBytes + 1,
              lit(frameBytes)).as("frame"))))
          .as("f"))
      .select(col("media_id"), col("f.chunk_idx").as("chunk_idx"),
        length(col("f.frame")).as("frame_bytes"))
  }

  /** An image corpus with VALID P6 payloads: each "image" doc's text
    * bytes (padded/truncated to an 8×8 RGB raster) wrapped in a real
    * PPM header. Deterministic construction, so the decode pass is
    * oracle-replayable: DuckDB recomputes the channel means straight
    * from the text arithmetic while Spark's side actually parses the
    * image bytes — if the parser misread the header or mis-strode the
    * raster, every mean would shift and the hash compare would fail.
    */
  def imageTable(spark: SparkSession, sfDir: String,
      width: Int = 8, height: Int = 8): DataFrame = {
    val rasterLen = width * height * 3
    val header = lit(s"P6\n$width $height\n255\n".getBytes("US-ASCII"))
    Tables.load(spark, sfDir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id").as("media_id"),
        concat(header,
          rpad(substring(col("text"), 1, rasterLen), rasterLen, " ")
            .cast("binary")).as("payload"))
  }

  /** Batched REAL decode over [[imageTable]]: per-image dimensions and
    * channel means from [[PpmCodec.decode]] — same mapPartitions batch
    * shape as [[extractFeatures]], undecodable payloads skipped.
    */
  def decodeImages(spark: SparkSession, sfDir: String): DataFrame = {
    val images = imageTable(spark, sfDir)
    import spark.implicits._
    images.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(64).flatMap(_.iterator.flatMap { case (id, bytes) =>
          PpmCodec.decode(bytes).map(d =>
            (id, d.width, d.height, d.meanR, d.meanG, d.meanB))
        })
      }
      .toDF("media_id", "width", "height", "mean_r", "mean_g", "mean_b")
      .select(col("media_id"), col("width"), col("height"),
        round(col("mean_r"), 4).as("mean_r"),
        round(col("mean_g"), 4).as("mean_g"),
        round(col("mean_b"), 4).as("mean_b"))
      .orderBy("media_id")
  }

  /** An audio corpus with VALID RIFF/WAVE payloads: each "audio" doc's
    * first `maxSamples` text chars become mono 16-bit PCM samples via
    * the affine map s = ascii·256 − 32768, at a doc-derived sample
    * rate — deterministic synthesis, so the decode pass is
    * oracle-replayable: DuckDB recomputes (n, Σs, peak|s|) straight
    * from the text arithmetic while Spark's side actually parses the
    * RIFF bytes — a mis-walked chunk, wrong endianness, or bad sign
    * extension shifts every feature and fails the hash compare.
    */
  def audioTable(spark: SparkSession, sfDir: String,
      maxSamples: Int = 256): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 1 &&
        length(col("text")) >= 1)
      .select(col("doc_id"),
        substring(col("text"), 1, maxSamples).as("t"))
      .as[(Long, String)]
      .map { case (id, t) =>
        val samples = t.toCharArray.map(c =>
          ((c.toInt & 0xFF) * 256 - 32768).toShort)
        val rate = (8000L + (id % 3L) * 4000L).toInt
        (id, WavCodec.encode(rate, samples))
      }.toDF("media_id", "payload")
  }

  /** q34: batched REAL audio decode over [[audioTable]] — per-clip
    * sample rate, sample count, amplitude sum, and peak amplitude from
    * [[WavCodec.decode]]; same mapPartitions batch shape as
    * [[extractFeatures]], undecodable payloads skipped. All-BIGINT
    * output (integer-exact features — no float jitter between engines).
    */
  def audioFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    audioTable(spark, sfDir)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(64).flatMap(_.iterator.flatMap { case (id, bytes) =>
          WavCodec.decode(bytes).map(d =>
            (id, d.sampleRate.toLong, d.nSamples.toLong, d.sumSamples,
              d.peakAbs.toLong))
        })
      }
      .toDF("media_id", "sample_rate", "n_samples", "sum_samples",
        "peak_abs")
      .orderBy("media_id")
  }

  /** q160: resize-then-decode over [[imageTable]] — each 8×8 image
    * downsamples to 4×4 through [[PpmCodec.resizeNearest]] (REAL
    * header parse, pixel sampling, re-encode) and the resized bytes
    * decode back through [[PpmCodec.decode]]; the report is the
    * resized dims + channel means. The oracle replays the
    * nearest-neighbor index arithmetic straight from the synthesis
    * text — a mis-sampled pixel, mis-strided raster, or corrupted
    * re-encode shifts the means and fails the hash.
    */
  def resizeImages(spark: SparkSession, sfDir: String,
      outW: Int = 4, outH: Int = 4): DataFrame = {
    val images = imageTable(spark, sfDir)
    import spark.implicits._
    images.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(64).flatMap(_.iterator.flatMap { case (id, bytes) =>
          PpmCodec.resizeNearest(bytes, outW, outH)
            .flatMap(PpmCodec.decode)
            .map(d => (id, d.width, d.height, d.meanR, d.meanG, d.meanB))
        })
      }
      .toDF("media_id", "width", "height", "mean_r", "mean_g", "mean_b")
      .select(col("media_id"), col("width"), col("height"),
        round(col("mean_r"), 4).as("mean_r"),
        round(col("mean_g"), 4).as("mean_g"),
        round(col("mean_b"), 4).as("mean_b"))
      .orderBy("media_id")
  }

  /** q163: FRAMED audio features over [[audioTable]] — the first real
    * step of audio featurization (a mel/MFCC front end starts from
    * exactly these frames): decode via the shared RIFF layout walk,
    * split the PCM stream into complete `frameLen`-sample frames, and
    * emit per-frame INTEGER-exact features — energy Σs² (a long: peak
    * 32768²·64 ≈ 2⁴⁰) and the zero-crossing count of the DC-REMOVED
    * frame (the classic voiced/unvoiced discriminator; practical
    * front ends subtract the frame mean first, and here that also
    * keeps the feature integer-exact AND non-degenerate: the raw
    * synthesis samples are all one sign, so raw sign flips would
    * count a constant 0). "Below the mean" is the exact integer
    * comparison s·N < Σs — no float mean materializes, so the oracle
    * replays the comparison verbatim. A trailing partial frame is
    * dropped (standard framing semantics), which the oracle mirrors
    * with its full-frame filter. Scale shape: one mapPartitions decode
    * pass, rows fan out ≤ nSamples/frameLen per clip, no shuffle
    * before the (presentation-only) sort.
    */
  def audioFrameFeatures(spark: SparkSession, sfDir: String,
      frameLen: Int = 64): DataFrame = {
    import spark.implicits._
    audioTable(spark, sfDir)
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(64).flatMap(_.iterator.flatMap { case (id, bytes) =>
          WavCodec.pcm16MonoLayout(bytes).iterator.flatMap {
            case (_, data, n) =>
              (0 until n / frameLen).iterator.map { f =>
                def sampleAt(k: Int): Int = {
                  val at = data + (f * frameLen + k) * 2
                  (WavCodec.leShort(bytes, at) << 16) >> 16
                }
                var energy = 0L
                var sum = 0L
                var k = 0
                while (k < frameLen) {
                  val s = sampleAt(k)
                  energy += s.toLong * s
                  sum += s
                  k += 1
                }
                var crossings = 0L
                var prevNeg = false
                k = 0
                while (k < frameLen) {
                  val neg = sampleAt(k).toLong * frameLen < sum
                  if (k > 0 && neg != prevNeg) crossings += 1
                  prevNeg = neg
                  k += 1
                }
                (id, f.toLong, energy, crossings)
              }
          }
        })
      }
      .toDF("media_id", "frame_idx", "energy", "zero_crossings")
      .orderBy("media_id", "frame_idx")
  }

  /** q164: per-channel HISTOGRAMS over [[imageTable]] — the image-side
    * quality filter primitive (near-black / blown-out / low-contrast
    * detection reads exactly these bins): parse the P6 header with the
    * shared scan, stride the raster once, count each channel's values
    * into 256/`binSize` bins. Counts are integers, so the oracle
    * replays them from the synthesis text; only non-empty bins emit
    * (matching a GROUP BY replay). Scale shape: one mapPartitions
    * decode pass, ≤ 3·(256/binSize) rows per image, no shuffle.
    */
  def imageHistograms(spark: SparkSession, sfDir: String,
      binSize: Int = 64): DataFrame = {
    // ceil, not truncate: for a binSize that does not divide 256 the
    // last (partial) bin must still exist — pixel 255 at binSize 48
    // lands in bin 5 of ceil(256/48) = 6, not past the array
    require(binSize >= 1 && binSize <= 256, s"binSize $binSize not in [1, 256]")
    import spark.implicits._
    imageTable(spark, sfDir)
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(64).flatMap(_.iterator.flatMap { case (id, bytes) =>
          PpmCodec.header(bytes).iterator.flatMap { case (w, h, raster) =>
            val nBins = (256 + binSize - 1) / binSize
            val counts = Array.ofDim[Long](3, nBins)
            var p = raster
            val end = raster + w * h * 3
            var c = 0
            while (p < end) {
              counts(c)((bytes(p) & 0xFF) / binSize) += 1
              c = (c + 1) % 3
              p += 1
            }
            for {
              ch <- (0 until 3).iterator
              b <- (0 until nBins).iterator
              if counts(ch)(b) > 0
            } yield (id, ch.toLong, b.toLong, counts(ch)(b))
          }
        })
      }
      .toDF("media_id", "channel", "bin", "n")
      .orderBy("media_id", "channel", "bin")
  }

  /** q165: frame SAMPLING with content digests — [[sampleFrames]]'s
    * stride arithmetic (every `stride`-th complete `frameBytes`-sized
    * chunk of each "video" payload) made oracle-checkable by digesting
    * the sampled bytes: both engines agree on sha-256 of the slice
    * byte-for-byte, so a mis-strided offset or off-by-one slice fails
    * the hash compare. Fully declarative (sequence + transform +
    * explode — no mapPartitions): frame sampling is pure offset
    * arithmetic, and keeping it in Catalyst keeps it codegen'd and
    * pushdown-friendly at scale.
    */
  def frameDigests(spark: SparkSession, sfDir: String,
      frameBytes: Int = 32, stride: Int = 4): DataFrame = {
    val video = mediaTable(spark, sfDir).toDF()
      .filter(col("media_type") === "video" &&
        length(col("payload")) >= frameBytes)
    val lastChunk = (length(col("payload")) / frameBytes).cast("int") - 1
    video.select(
        col("media_id"),
        explode(transform(
          sequence(lit(0), lastChunk, lit(stride)),
          off => struct(off.cast("long").as("chunk_idx"),
            sha2(substring(col("payload"), off * frameBytes + 1,
              lit(frameBytes)), 256).as("digest"))))
          .as("f"))
      .select(col("media_id"), col("f.chunk_idx").as("chunk_idx"),
        col("f.digest").as("digest"))
      .orderBy("media_id", "chunk_idx")
  }

  /** Oracle-checkable metadata pass: payload length + content digest —
    * the part of the multimodal pipeline both engines can agree on
    * byte-for-byte.
    */
  def mediaStats(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir).toDF()
      .select(col("media_id"), col("media_type"),
        length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("digest"),
        (length(col("payload")) === col("declared_bytes"))
          .as("meta_consistent"))
      .orderBy("media_id")
}
