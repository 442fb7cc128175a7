package graft.streaming

import org.apache.spark.sql.Dataset

/** A document admitted by the streaming corpus gate. */
case class AdmittedDoc(docId: Long, contentHash: String, quality: Double)

/** Streaming corpus admission — the online form of
  * [[graft.operators.Pipeline.corpusAdmission]]: a crawl stream is
  * quality-gated statelessly, then content-deduped by the first-seen
  * state primitive ([[EventStreams.firstSeenStream]]), with doc_id as
  * the arrival clock. Composition is the point: ingest = scan-fused
  * gate + the one stateful primitive the engine already proves, so
  * the admitted stream equals the batch twin's rows once the
  * watermark closes (StreamingSpec drives both).
  */
object CorpusStreams {

  /** records: (contentHash, arrivalUs, docId, quality) — arrivalUs is
    * the crawl's arrival clock (strictly positive: event-time 0 sits
    * on the engine's initial watermark and would be dropped as late).
    * Gate rejections never touch state; survivors dedup per content
    * hash, keeping the earliest (arrivalUs, docId) — exactly the
    * batch argmin when arrival order follows docId.
    */
  def admissionStream(records: Dataset[(String, Long, Long, Double)],
      minQuality: Double = 0.35,
      delay: String = "1 hour"): Dataset[AdmittedDoc] = {
    val spark = records.sparkSession
    import spark.implicits._
    val gated = records.filter(_._4 >= minQuality)
    EventStreams.firstSeenStream(gated, delay)
      .map(f => AdmittedDoc(f.id, f.key, f.value))
  }
}
