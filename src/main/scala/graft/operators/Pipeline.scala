package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis
import graft.sources.Tables

/** Training-data pipeline assembly operators: sequence packing and
  * benchmark decontamination — the steps between a cleaned corpus and
  * a training run.
  */
object Pipeline {

  /** Token-budget sequence packing, cumulative-window form: documents
    * (in doc_id order) are assigned to the budget window their running
    * token count ends in. A pack can exceed `budget` by at most its
    * last (straddling) document's tokens — this is the parallelizable
    * approximation of greedy packing (exact greedy resets at each
    * boundary, which is a sequential fold, not a window). The global
    * running sum mirrors the reference's sequential batching semantics
    * (trainer.py:222), computed as a sharded two-pass prefix sum
    * ([[PrefixSum]]) — no single-partition window. shardWidth=4096
    * exercises the multi-shard path even at test SF; production sizing
    * is ~2^20 keys/shard.
    */
  def tokenPacking(spark: SparkSession, sfDir: String,
      budget: Int = 512): DataFrame = {
    val toks = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    PrefixSum.withGlobalCumSum(toks, "doc_id", col("n_tokens"), "cum",
        shardWidth = 4096)
      // pack id: which budget-window the cumulative count lands in
      .withColumn("pack_id", floor((col("cum") - 1) / budget))
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("pack_id")
  }

  /** The pack manifest's contents half: which documents land in each
    * pack, in order — what a sequence-building job consumes downstream
    * of [[tokenPacking]]'s stats. Same sharded-prefix-sum plan; the
    * per-pack list is bounded by the token budget (a pack holds at
    * most `budget` docs), so the collect_list state is O(budget) per
    * group at any corpus size. Doc ids render as a comma-joined string
    * (numeric sort, then format) so the oracle compares text, not
    * engine-specific array encodings.
    */
  def packContents(spark: SparkSession, sfDir: String,
      budget: Int = 512): DataFrame = {
    val toks = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    PrefixSum.withGlobalCumSum(toks, "doc_id", col("n_tokens"), "cum",
        shardWidth = 4096)
      .withColumn("pack_id", floor((col("cum") - 1) / budget))
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"),
        array_join(
          transform(sort_array(collect_list(col("doc_id"))),
            _.cast("string")), ",").as("doc_ids"))
      .orderBy("pack_id")
  }

  /** Sequence-length bucketing — the batch-efficiency report a padded
    * training loader needs: documents grouped into `step`-token
    * buckets capped at `cap` (the sequence length), each bucket
    * reporting its doc count, real tokens, and padding waste
    * (bucket_len × docs − tokens). One scan, one NDV-bounded
    * aggregate (≤ cap/step + 1 groups at any corpus size); the waste
    * column is what a curriculum of bucket-homogeneous batches
    * eliminates versus padding everything to `cap`.
    */
  def lengthBuckets(spark: SparkSession, sfDir: String,
      step: Int = 64, cap: Int = 2048): DataFrame =
    Tables.load(spark, sfDir, "documents")
      .select(TextAnalysis.tokenCount(col("text")).cast("long")
        .as("n_tokens"))
      .withColumn("bucket_len",
        least(lit(cap.toLong),
          (ceil(col("n_tokens") / step.toDouble) * step).cast("long")))
      .groupBy("bucket_len")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"))
      .withColumn("pad_waste",
        col("bucket_len") * col("n_docs") - col("sum_tokens"))
      .orderBy("bucket_len")

  /** Benchmark decontamination: flag training documents sharing any
    * word 8-gram with the held-out set (here: doc_id < `evalCount`
    * plays the benchmark). The eval side's distinct grams are tiny →
    * broadcast; the training side explodes grams and inner-joins, so
    * the cost is one scan of the corpus however large it is. Returns
    * one row per contaminated training doc with its overlap count.
    */
  def contamination(spark: SparkSession, sfDir: String,
      evalCount: Long = 10, n: Int = 8): DataFrame =
    contaminationPlan(spark, sfDir, evalCount, n, (train, _) => train)

  /** The shared decontamination plan: eval-side distinct grams, a
    * train-side gram explosion run through `prefilter(trainGrams,
    * evalGrams)`, then the exact verify join + per-doc count. Grams
    * are compared as 64-bit hashes (single-pass kernel) — same overlap
    * counts as string grams w.h.p.; the oracle replays the string
    * form. [[contamination]] passes the identity prefilter;
    * [[bloomContamination]] inserts the sketch probe — one body, so
    * the two spellings cannot drift.
    */
  private def contaminationPlan(spark: SparkSession, sfDir: String,
      evalCount: Long, n: Int,
      prefilter: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val gramHashes = graft.functions.VectorMath
      .word_ngram_hashes(col("text"), n)
    val evalGrams = docs.filter(col("doc_id") < evalCount)
      .select(explode(gramHashes).as("gram"))
      .distinct()
    val trainGrams = docs.filter(col("doc_id") >= evalCount)
      .select(col("doc_id"), explode(gramHashes).as("gram"))
    prefilter(trainGrams, evalGrams)
      .join(broadcast(evalGrams), Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_grams"))
      .orderBy("doc_id")
  }

  /** [[contamination]] re-planned through a Bloom-filter prefilter —
    * the shape decontamination takes when the held-out set is too big
    * to ship as a broadcast hash relation. The eval side aggregates
    * into a fixed-size bitset ([[graft.functions.BloomAgg]]: merge is
    * bitwise OR, so it tree-reduces and the shuffle moves numBits/8
    * bytes per partial whatever the gram count); the collected sketch
    * becomes a literal probe fused into the training-side SCAN
    * ([[graft.functions.BloomMightContain]], codegen'd), so the
    * exploded grams that survive to the exact-verify join are only the
    * bloom hits — at production contamination rates (≪1%) the join
    * input shrinks by the FPR, ~1e-5 here, instead of shuffling every
    * gram. The verify join makes the answer EXACT (bloom false
    * positives are discarded), so q48's oracle applies verbatim.
    */
  def bloomContamination(spark: SparkSession, sfDir: String,
      evalCount: Long = 10, n: Int = 8): DataFrame =
    contaminationPlan(spark, sfDir, evalCount, n, { (train, evalGrams) =>
      import graft.functions.BloomFunctions.{bloom_agg, bloom_might_contain}
      // one tiny aggregate job → the query parameter (like
      // queryVector); at scale this is the precomputed per-benchmark
      // sketch artifact
      val sketch = evalGrams.agg(bloom_agg(col("gram")).as("b"))
        .collect()(0).getAs[Array[Byte]](0)
      train.filter(bloom_might_contain(sketch, col("gram")))
    })

  /** Per-source contamination report: the fraction of each source's
    * training documents sharing any word `n`-gram with the held-out
    * set — the go/no-go summary a decontamination audit ends with
    * (per-doc detail is [[contamination]]). The contaminated-doc set
    * rides the same broadcast-gram plan; the per-source rate is then
    * one aggregate over the corpus scan with a LEFT join against that
    * (tiny) doc list, so the whole report costs the q48 pass plus one
    * narrow join however large the corpus is.
    */
  def contaminationRate(spark: SparkSession, sfDir: String,
      evalCount: Long = 10, n: Int = 8): DataFrame = {
    val contaminated = contaminationPlan(spark, sfDir, evalCount, n,
        (train, _) => train)
      .select(col("doc_id"), lit(1L).as("hit"))
    Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") >= evalCount)
      .select("doc_id", "source")
      .join(contaminated, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .withColumn("rate",
        round(col("n_contaminated").cast("double") / col("n_docs"), 4))
      .orderBy("source")
  }

  /** Composite quality gate — the keep/drop decision of a heuristic
    * pre-training filter, reported per source with per-reason reject
    * counts (reasons overlap, so they are tallied independently; a doc
    * is kept iff it clears every bar). All three signals are
    * engine-portable column arithmetic fused into ONE corpus scan —
    * one map-side-combined aggregate, no joins, no windows; the gate
    * thresholds arrive as literals so re-tuning the filter is a
    * constant change, not a new pipeline.
    */
  def qualityGate(spark: SparkSession, sfDir: String,
      minTokens: Int = 20, minQuality: Double = 0.35,
      minDistinct: Double = 0.33): DataFrame = {
    val nt = TextAnalysis.tokenCount(col("text"))
    val q = TextAnalysis.qualityScore(col("text"), TextQueries.Stopwords)
    val dr = TextAnalysis.distinctRatio(col("text"))
    def tally(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    Tables.load(spark, sfDir, "documents")
      .select(col("source"), nt.as("nt"), q.as("q"), dr.as("dr"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        tally(col("nt") < minTokens).as("n_too_short"),
        tally(col("q") < minQuality).as("n_low_quality"),
        tally(col("dr") < minDistinct).as("n_repetitive"),
        tally(col("nt") >= minTokens && col("q") >= minQuality &&
          col("dr") >= minDistinct).as("n_kept"))
      .orderBy("source")
  }

  /** Per-source document caps — "no source dominates the mix": keep at
    * most `k` documents per source, ranked by quality (doc_id breaks
    * ties). Same bounded-aggregate shape as [[stratifiedSample]]: the
    * [[graft.functions.TopKRows]] aggregate reduces every map task's
    * slice to ≤ k rows per source BEFORE the exchange, so the shuffle
    * carries O(k · sources) rows and no corpus-wide window sort ever
    * runs — the production form of per-domain caps at 100 TB.
    */
  def sourceCaps(spark: SparkSession, sfDir: String,
      k: Int = 10): DataFrame = {
    val q = TextAnalysis.qualityScore(col("text"), TextQueries.Stopwords)
    Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"), q.as("quality"))
      .groupBy("source")
      .agg(graft.functions.TopKFunctions.topk_rows(
        col("quality"), col("doc_id"),
        struct(col("doc_id"), col("quality")), k).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), col("col.doc_id").as("doc_id"),
        col("col.quality").as("quality"),
        (col("pos") + 1).cast("int").as("rk"))
      .orderBy("source", "rk")
  }

  /** Manifest MERGE — the upsert step of incremental corpus
    * maintenance: reconcile the existing corpus manifest (sources
    * src0–src9) with a new batch (src10+) by content hash, tagging
    * every content row `keep` (existing only), `insert` (batch only),
    * or `update` (both — the batch re-observed known content). One
    * full-outer hash join on unhex(sha2(text)): both sides shuffle
    * the raw 32-byte binary digest (not its 64-char hex rendering)
    * with pre-aggregated counts, never document bodies — the same
    * MERGE-on-key shape a Delta/Iceberg upsert compiles to, so at
    * 100 TB the cost is two manifest-sized exchanges however large
    * the corpus text is.
    */
  def mergeManifest(spark: SparkSession, sfDir: String): DataFrame = {
    val existingSrcs = (0 to 9).map(i => s"src$i")
    val docs = Tables.load(spark, sfDir, "documents")
    def side(pred: org.apache.spark.sql.Column, idAlias: String,
        nAlias: String) =
      docs.filter(pred)
        .groupBy(unhex(sha2(col("text"), 256)).as("content_hash"))
        .agg(min("doc_id").as(idAlias), count(lit(1)).as(nAlias))
    val existing = side(col("source").isin(existingSrcs: _*),
      "old_id", "old_copies")
    val batch = side(!col("source").isin(existingSrcs: _*),
      "new_id", "new_copies")
    existing.join(batch, Seq("content_hash"), "full_outer")
      .select(
        coalesce(col("old_id"), col("new_id")).as("canonical_id"),
        when(col("new_id").isNull, "keep")
          .when(col("old_id").isNull, "insert")
          .otherwise("update").as("action"),
        (coalesce(col("old_copies"), lit(0L)) +
          coalesce(col("new_copies"), lit(0L))).as("n_copies"))
      .orderBy("canonical_id")
  }

  /** Corpus admission — the gate + dedup composition an ingest
    * pipeline runs per crawl: documents that clear the
    * [[qualityGate]] bars AND are the first occurrence (min doc_id)
    * of their content hash among gated docs. One scan-fused filter,
    * one argmin aggregate on sha2(text) — hashes shuffle, bodies
    * don't. The streaming twin
    * ([[graft.streaming.CorpusStreams.admissionStream]]) admits the
    * same rows online via the first-seen state primitive;
    * RetentionAdmissionSpec proves stream ≡ batch.
    */
  def corpusAdmission(spark: SparkSession, sfDir: String,
      minTokens: Int = 20, minQuality: Double = 0.35,
      minDistinct: Double = 0.33): DataFrame = {
    val nt = TextAnalysis.tokenCount(col("text"))
    val q = TextAnalysis.qualityScore(col("text"), TextQueries.Stopwords)
    val dr = TextAnalysis.distinctRatio(col("text"))
    Tables.load(spark, sfDir, "documents")
      .filter(nt >= minTokens && q >= minQuality && dr >= minDistinct)
      .groupBy(unhex(sha2(col("text"), 256)).as("content_hash"))
      .agg(min(struct(col("doc_id"), col("lang"), col("source"),
        col("n_chars"))).as("f"))
      .select(col("f.doc_id").as("doc_id"), col("f.lang").as("lang"),
        col("f.source").as("source"), col("f.n_chars").as("n_chars"))
      .orderBy("doc_id")
  }

  /** The training-mix capstone — the whole assembly line from raw
    * crawl to packed sequences as ONE fused plan, composing only
    * stages already oracle-proven alone:
    *
    *  1. admission (q99): scan-fused quality gate + first-occurrence
    *     argmin on the binary content hash;
    *  2. temperature resampling (q79): per-language keep rates from
    *     the ADMITTED set (an NDV-sized broadcast), accept test as
    *     stateless arithmetic on doc_id;
    *  3. token packing (q47): sharded two-pass prefix sum over the
    *     survivors — no single-partition window.
    *
    * Everything between the corpus scan and the pack manifest
    * shuffles digests, NDV-sized tables, or per-shard partials —
    * never text — so the composition inherits each stage's 100 TB
    * shape. Every stage is engine-portable arithmetic, so the oracle
    * replays the entire pipeline as one CTE chain and hash-compares
    * the final manifest.
    */
  def trainingMix(spark: SparkSession, sfDir: String,
      minTokens: Int = 20, minQuality: Double = 0.35,
      minDistinct: Double = 0.33, budget: Int = 512): DataFrame = {
    val nt = TextAnalysis.tokenCount(col("text"))
    val q = TextAnalysis.qualityScore(col("text"), TextQueries.Stopwords)
    val dr = TextAnalysis.distinctRatio(col("text"))
    // persisted (doc-grain, 3 narrow columns): the rate aggregate and
    // BOTH PrefixSum passes read this frame — unpersisted, the
    // text-kernel admission scan (sha2 + tokenize + quality) re-ran
    // once per subtree copy, up to 6× per execution (the
    // perplexityBuckets discipline; measured 1.69 s → the scan is the
    // query's whole cost at any scale)
    val admitted = Tables.load(spark, sfDir, "documents")
      .filter(nt >= minTokens && q >= minQuality && dr >= minDistinct)
      .groupBy(unhex(sha2(col("text"), 256)).as("content_hash"))
      .agg(min(struct(col("doc_id"), col("lang"),
        nt.cast("long").as("n_tokens"))).as("f"))
      .select(col("f.doc_id").as("doc_id"), col("f.lang").as("lang"),
        col("f.n_tokens").as("n_tokens"))
      .persist()
    val counts = admitted.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("n_docs")).as("n_min"))))
      .select(col("lang"), greatest(lit(1L),
        round(lit(1000.0) *
          sqrt(col("n_min").cast("double") / col("n_docs")), 0)
          .cast("long")).as("keep_permille"))
    val accepted = admitted.join(broadcast(rates), "lang")
      .filter(mixtureBucket(col("doc_id")) < col("keep_permille"))
      .select("doc_id", "n_tokens")
    val packed = PrefixSum.withGlobalCumSum(accepted, "doc_id",
        col("n_tokens"), "cum", shardWidth = 4096)
      .withColumn("pack_id", floor((col("cum") - 1) / budget))
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("pack_id")
    // registered AFTER withGlobalCumSum: its internal pass-1 collect
    // already read the cache — the NEXT consumer is the returned
    // frame's own action, which releases it (lazy-return hygiene)
    graft.plans.CacheRelease.afterFirstUse(admitted)
    packed
  }

  /** Deterministic mixture sampling — the "data mixing" step of
    * training-set assembly: each source is downsampled to a target
    * weight by a pure-arithmetic accept test,
    * `((doc_id mod 1e9+7) * KnuthMult) mod 1000 < permille(source)`.
    * Stateless
    * scan filter: no shuffle, no RNG state, any engine (and any rerun)
    * admits the identical row set — at 100 TB this is a predicate
    * fused into the scan, and re-weighting a mixture is a metadata
    * change, not a new sampling pass.
    */
  def mixtureSample(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
    val permille = mixturePermille(col("source"))
    docs
      .withColumn("bucket", mixtureBucket(col("doc_id")))
      .filter(col("bucket") < permille)
      .select(col("doc_id"), col("source"), col("lang"),
        permille.as("target_permille"))
      .orderBy("doc_id")
  }

  /** Weighted sample of EXACT size k via priority (sequential
    * Poisson) sampling: each doc draws priority u/w — u the portable
    * integer hash of its id scaled to [0, 1e6), w its source's
    * mixture weight — and the k smallest priorities win, so inclusion
    * probability scales with weight but the output size is fixed
    * (unlike the rate-based [[mixtureSample]], which is expected-size).
    * One bounded top-k (TakeOrderedAndProject: every task keeps k
    * rows, the driver merges — no corpus sort) over one scan. The
    * priority arithmetic is integer hashing plus ONE IEEE division —
    * bit-identical in any engine, no libm anywhere — so the sample is
    * exactly reproducible cross-engine, ties broken by doc_id.
    */
  def weightedSample(spark: SparkSession, sfDir: String,
      k: Int = 200): DataFrame = {
    // +1 maps u to [1, 1e6]: u = 0 would give priority 0.0, a
    // guaranteed slot regardless of weight (sequential Poisson needs
    // u in (0, 1])
    val u = knuthBucket(col("doc_id"), 1000000L) + lit(1L)
    val w = mixturePermille(col("source"))
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), w.as("weight_permille"),
        (u.cast("double") / w.cast("double")).as("priority"))
      .orderBy(asc("priority"), asc("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("source"), col("weight_permille"),
        round(col("priority"), 4).as("priority"))
  }

  /** Knuth's 2^32/φ multiplicative-hash constant — decorrelates the
    * accept test from sequential doc_ids.
    */
  val KnuthMult = 2654435761L

  /** The shared Knuth-multiplicative hash bucket: reduce mod 1e9+7
    * BEFORE the multiply — the reduced id stays ≤ ~1e9, so the product
    * ≤ ~2.7e18 < Long.Max — no ANSI overflow at any corpus size (a raw
    * doc_id · 2^32/φ overflows past id ≈ 3.5e9). Every hash-derived
    * accept test / priority in this file MUST route through this one
    * helper (moduli differ; the overflow discipline must not).
    */
  private def knuthBucket(docId: org.apache.spark.sql.Column,
      modulus: Long) =
    pmod(pmod(docId, lit(1000000007L)) * lit(KnuthMult), lit(modulus))

  /** The mixture accept bucket, shared by [[mixtureSample]] and
    * [[corpusManifest]] (and replayed by both oracles).
    */
  private def mixtureBucket(docId: org.apache.spark.sql.Column) =
    knuthBucket(docId, 1000L)

  /** Target mixture: heavy sources kept at 90%, mid at 50%, tail at
    * 20% — the CASE both engines replay verbatim.
    */
  private def mixturePermille(source: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions.{lit, when}
    when(source.isin("src0", "src1", "src2", "src3", "src4"), lit(900L))
      .when(source.isin("src5", "src6", "src7", "src8", "src9"), lit(500L))
      .otherwise(lit(200L))
  }

  /** Temperature-balanced language resampling (the mC4 / XLM-R
    * recipe): languages are kept at rate (n_min/n_lang)^(1-α), so at
    * α=0.5 a language 4× the smallest is downsampled 2× — flattening
    * the language distribution toward uniform without touching the
    * rarest one. The per-language counts are an NDV-sized aggregate
    * (one map-side-combined scan of the lang column only); the rate
    * table is broadcast back onto the corpus, and the accept test is
    * the same deterministic Knuth-hash bucket as [[mixtureSample]] —
    * a scan-fused predicate, no RNG state, identically replayable by
    * any engine. Rates are fixed as integer permille (IEEE sqrt +
    * round are bit-identical across engines) so the hash compare is
    * exact. At 100 TB: a full-corpus re-balance is one pruned column
    * scan plus a broadcast of |languages| rows.
    */
  def temperatureResample(spark: SparkSession, sfDir: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha == 0.5,
      "rate permille is sqrt-based; other α need a pow() oracle twin")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"))
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("n_docs")).as("n_min"))))
      .select(col("lang"), greatest(lit(1L),
        round(lit(1000.0) *
          sqrt(col("n_min").cast("double") / col("n_docs")), 0)
          .cast("long")).as("keep_permille"))
    docs.join(broadcast(rates), "lang")
      .filter(mixtureBucket(col("doc_id")) < col("keep_permille"))
      .select(col("doc_id"), col("lang"), col("keep_permille"))
      .orderBy("doc_id")
  }

  /** Deterministic stratified sample: the EXACT `k` documents per
    * language with the smallest arithmetic-hash priority — the
    * "balanced per-stratum subset" step (per-language eval sets,
    * calibration corpora), complementing [[mixtureSample]]'s
    * rate-based mixing. Planned through the bounded
    * [[graft.functions.TopKRows]] aggregate: each map task reduces its
    * slice to ≤ k rows per language BEFORE the exchange — the shuffle
    * carries O(k·strata) rows and no window ever sorts the corpus.
    * The priority is the same Knuth-multiplicative arithmetic as the
    * mixture bucket (no engine-specific hash), so any engine replays
    * the identical sample and re-drawing with a different k is a
    * metadata change.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String,
      k: Int = 25): DataFrame = {
    val priority = knuthBucket(col("doc_id"), 1000000007L)
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), priority.as("priority"))
      .groupBy("lang")
      .agg(graft.functions.TopKFunctions.topk_rows(
        -col("priority").cast("double"), col("doc_id"),
        struct(col("doc_id"), col("priority")), k).as("top"))
      .select(col("lang"), explode(col("top")).as("r"))
      .select(col("lang"), col("r.doc_id").as("doc_id"),
        col("r.priority").as("priority"))
      .orderBy("lang", "priority", "doc_id")
  }

  /** Deterministic round-robin interleave across sources — the epoch
    * mixing step (the reference's interleave role, trainer.py's
    * parallel-split reads composed into one order): documents of each
    * source are ranked by the portable Knuth-hash priority, and the
    * global epoch position is rank·nSources + sourceIndex, so sources
    * alternate 1:1:…:1 until each runs out and any engine (or re-run)
    * emits the identical order. One shuffle (the per-source rank
    * window) plus a broadcast of the tiny source-index dim; the epoch
    * position is pure arithmetic — no global sort materializes the
    * epoch, consumers range-read by `interleave_pos`. (An exhausted
    * source simply leaves gaps in the position sequence — order, not
    * density, is the contract.)
    */
  def interleaveBySource(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sfDir, "documents")
    // tiny dim: one row per source, dense index by sorted name (the
    // same collect-a-parameter pattern as Similarity.queryVector)
    val srcIdx = docs.select("source").distinct()
      .collect().map(_.getString(0)).sorted.zipWithIndex
    val nSrc = srcIdx.length
    val idxDf = spark.createDataFrame(
      srcIdx.toSeq.map { case (s, i) => (s, i.toLong) })
      .toDF("source", "src_idx")
    val priority = knuthBucket(col("doc_id"), 1000000007L)
    docs
      .select(col("doc_id"), col("source"), priority.as("priority"))
      .join(broadcast(idxDf), Seq("source"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source")
          .orderBy(col("priority"), col("doc_id"))) - 1)
      .select(col("doc_id"), col("source"),
        (col("rn").cast("long") * nSrc + col("src_idx"))
          .as("interleave_pos"))
      .orderBy("interleave_pos")
  }

  /** Sliding-window document chunking: each document becomes
    * ceil-ish(n/stride) overlapping windows of `chunkTokens` tokens
    * (stride = chunkTokens − overlap) — the split-long-docs step
    * between curation and packing. Pure per-row array arithmetic
    * (sequence + slice), so it fuses into the scan with no shuffle at
    * all; chunk identity is carried as the rolling-hash fingerprint of
    * the chunk text rather than the text itself, which keeps the audit
    * row narrow at any corpus size.
    */
  def chunkDocuments(spark: SparkSession, sfDir: String,
      chunkTokens: Int = 64, overlap: Int = 16): DataFrame =
    Present.smallSorted(
      chunk(Tables.load(spark, sfDir, "documents"), chunkTokens, overlap),
      "doc_id", "chunk_id")

  /** [[chunkDocuments]]'s transform over any (doc_id, text, …) frame;
    * `passthrough` columns ride along onto every chunk row. This is
    * the composable form the end-to-end manifest pipeline uses.
    */
  private[graft] def chunk(docs: DataFrame, chunkTokens: Int = 64,
      overlap: Int = 16, passthrough: Seq[String] = Nil): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "0 <= overlap < chunk")
    val stride = chunkTokens - overlap
    val starts = sequence(lit(0), size(col("ws")) - 1, lit(stride))
    val extra = passthrough.map(col)
    docs
      .select(col("doc_id") +: TextAnalysis.tokens(col("text")).as("ws")
        +: extra: _*)
      .select(col("doc_id") +: col("ws")
        +: posexplode(starts).as(Seq("chunk_id", "start_tok")) +: extra: _*)
      .select(col("doc_id") +: col("chunk_id").cast("long").as("chunk_id")
        +: col("start_tok").cast("long").as("start_tok")
        +: slice(col("ws"), col("start_tok") + 1, lit(chunkTokens)).as("chunk")
        +: extra: _*)
      .select(col("doc_id") +: col("chunk_id") +: col("start_tok")
        +: size(col("chunk")).cast("long").as("n_tokens")
        +: TextAnalysis.fingerprint(concat_ws(" ", col("chunk"))).as("fp")
        +: extra: _*)
  }

  /** End-to-end corpus-preparation manifest — the whole pipeline as
    * ONE declarative plan: mixture-sample the sources, scrub PII from
    * the kept documents, chunk the SCRUBBED text into training
    * windows, and emit the shard manifest (doc, chunk, token count,
    * fingerprint, source). Catalyst fuses sampling, scrubbing, and
    * chunking into a single scan stage — no shuffle until the
    * presentation sort — which is the point of composing operators as
    * column expressions rather than materialized steps: at 100 TB the
    * corpus is read once.
    */
  def corpusManifest(spark: SparkSession, sfDir: String): DataFrame =
    // presentation sort for the audit/bench manifest (thousands of
    // rows at test SF); a production 100 TB run writes
    // [[manifestUnsorted]] partition-parallel with no global order
    Present.smallSorted(manifestUnsorted(spark, sfDir),
      "doc_id", "chunk_id")

  /** [[corpusManifest]] without the presentation sort — the form a
    * full-scale manifest write uses (one scan, zero exchanges).
    */
  private[graft] def manifestUnsorted(spark: SparkSession,
      sfDir: String): DataFrame = {
    val kept = Tables.load(spark, sfDir, "documents")
      .filter(mixtureBucket(col("doc_id")) < mixturePermille(col("source")))
    val scrubbed = scrub(kept, passthrough = Seq("source"))
      .select(col("doc_id"), col("scrubbed").as("text"), col("source"))
    chunk(scrubbed, passthrough = Seq("source"))
  }

  /** PII scrubbing: mask email addresses and long digit runs — the
    * redaction pass a corpus takes before training. Two global regex
    * rewrites fused into the scan (no shuffle); `n_redactions` counts
    * actual redactions (digit runs are counted AFTER email masking, so
    * a number inside an address isn't double-counted).
    */
  def scrubPii(spark: SparkSession, sfDir: String): DataFrame =
    Present.smallSorted(
      scrub(Tables.load(spark, sfDir, "documents")), "doc_id")

  /** [[scrubPii]]'s transform over any (doc_id, text) frame — the form
    * the unit tests drive directly. At 100 TB the scrubbed corpus
    * writes unsorted; the sorted wrapper above is bench/audit
    * presentation.
    */
  private[graft] def scrub(docs: DataFrame,
      passthrough: Seq[String] = Nil): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val digits = "[0-9]{6,}"
    val emailMasked = regexp_replace(col("text"), email, "<EMAIL>")
    docs.select(col("doc_id")
      +: (regexp_count(col("text"), lit(email)) +
        regexp_count(emailMasked, lit(digits))).cast("long")
        .as("n_redactions")
      +: regexp_replace(emailMasked, digits, "<NUM>").as("scrubbed")
      +: passthrough.map(col): _*)
  }

  /** Per-language quality-quartile filter: keep documents whose
    * composite quality score reaches their language's 75th percentile
    * — "top-quality slice per language", the standard curation step
    * after scoring. The per-language cuts are a 5-row aggregate
    * broadcast back onto the scoring scan: one corpus scan + one
    * broadcast hash join, no window over the corpus. The cut is
    * floor-rounded to 4dp on both sides (the same IEEE-stable rounding
    * the score itself uses) so the >= boundary can't flip between
    * engines.
    */
  def qualityQuartile(spark: SparkSession, sfDir: String): DataFrame = {
    // persisted: both the percentile aggregate and the join branch read
    // the scores — without the cache the scoring scan runs twice
    val scored = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScore(col("text"), TextQueries.Stopwords)
          .as("quality"))
      .persist()
    val cuts = scored.groupBy("lang")
      .agg((floor(expr("percentile(quality, 0.75)") * 10000 + 0.5) / 10000)
        .as("lang_q75"))
    scored.join(broadcast(cuts), Seq("lang"))
      .filter(col("quality") >= col("lang_q75"))
      .select(col("doc_id"), col("lang"), col("quality"), col("lang_q75"))
      .orderBy("doc_id")
  }
}
