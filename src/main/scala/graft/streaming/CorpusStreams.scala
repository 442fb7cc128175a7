package graft.streaming

import org.apache.spark.sql.Dataset

/** A document admitted by the streaming corpus gate. */
case class AdmittedDoc(docId: Long, contentHash: String, quality: Double)

/** Streaming corpus admission — the online form of
  * [[graft.operators.Pipeline.corpusAdmission]]: a crawl stream is
  * quality-gated statelessly on the SAME three signals as the batch
  * twin (token count, composite quality, distinct ratio), then
  * content-deduped by the first-seen state primitive
  * ([[EventStreams.firstSeenStream]]). Composition is the point:
  * ingest = scan-fused gate + the one stateful primitive the engine
  * already proves, so the admitted stream equals the batch twin's
  * rows once the watermark closes (RetentionAdmissionSpec drives
  * both over the same corpus, gate unfiltered, and compares).
  */
object CorpusStreams {

  /** records: (contentHash, arrivalUs, docId, nTokens, quality,
    * distinctRatio) — arrivalUs is the crawl's arrival clock
    * (strictly positive: event-time 0 sits on the engine's initial
    * watermark and would be dropped as late); the three gate signals
    * are computed upstream by the same column kernels the batch path
    * fuses into its scan. Gate rejections never touch state;
    * survivors dedup per content hash, keeping the earliest
    * (arrivalUs, docId) — exactly the batch argmin when arrival
    * order follows docId.
    */
  def admissionStream(
      records: Dataset[(String, Long, Long, Int, Double, Double)],
      minTokens: Int = 20, minQuality: Double = 0.35,
      minDistinct: Double = 0.33,
      delay: String = "1 hour"): Dataset[AdmittedDoc] = {
    val spark = records.sparkSession
    import spark.implicits._
    val gated = records
      .filter(r => r._4 >= minTokens && r._5 >= minQuality &&
        r._6 >= minDistinct)
      .map(r => (r._1, r._2, r._3, r._5))
    EventStreams.firstSeenStream(gated, delay)
      .map(f => AdmittedDoc(f.id, f.key, f.value))
  }
}
