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
