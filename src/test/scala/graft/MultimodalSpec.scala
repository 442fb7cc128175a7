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

  test("payload pruning: metadata-only projection skips the binary column") {
    val plan = Multimodal.mediaTable(spark, sf).toDF()
      .select("media_id", "declared_bytes")
      .queryExecution.executedPlan.toString
    assert(plan.contains("doc_id") && !plan.contains("text"),
      s"binary source column not pruned:\n$plan")
  }
}
