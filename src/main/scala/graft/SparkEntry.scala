package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator family from SURVEY.md §2,
  * re-expressed Spark-first; [[oracleSql]] carries the DuckDB twin for
  * the driver's hash-compare. Column names/aliases match exactly
  * between the two, and every floating aggregate is rounded on both
  * sides so double-summation order (Spark partial aggs vs DuckDB
  * sequential) can't flip low bits.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's headline analysis (notebook cells 7+8,
    * README.md:176-222): group event durations, sum/avg/min/max, order
    * by total desc, top 20 — here over the `events` table (FIXTURES.md
    * maps `value` by `event_type` ≙ `dur` by `arg_name`).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.eventsTopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_events_topk" -> (Queries.eventsTopK _),
    "q02_scan_prune_filter" -> (operators.CoreQueries.scanPruneFilter _),
    "q03_fill_defaults" -> (operators.CoreQueries.fillDefaults _),
    "q04_json_extract" -> (operators.CoreQueries.jsonExtract _),
    "q05_nest_unnest" -> (operators.CoreQueries.nestUnnest _),
    "q06_distinct_counts" -> (operators.CoreQueries.distinctCounts _),
    "q07_table_counts" -> (operators.CoreQueries.tableCounts _),
    "q08_feature_bucket" -> (operators.CoreQueries.featureBucket _),
    "q09_normalize" -> (operators.CoreQueries.normalize _),
    "q10_shuffle" -> (operators.CoreQueries.deterministicShuffle _),
    "q11_repeat_epochs" -> (operators.CoreQueries.repeatEpochs _),
    "q12_batch_stats" -> (operators.CoreQueries.batchStats _),
    "q13_star_join_revenue" -> (operators.OlapQueries.starJoinRevenue _),
    "q14_top_parts" -> (operators.OlapQueries.topPartsByRevenue _),
    "q15_event_windows" -> (operators.OlapQueries.eventWindows _),
    "q16_set_ops" -> (operators.OlapQueries.setOps _),
    "q17_rollup" -> (operators.OlapQueries.rollupQuantities _),
    "q18_semi_anti" -> (operators.OlapQueries.semiAntiCustomers _),
    "q19_top_orders_per_customer" -> (operators.OlapQueries.topOrdersPerCustomer _),
    "q20_hourly_events" -> (operators.OlapQueries.hourlyEventStats _),
    // PORTABLE HLL vocab table: the sketch runs on the replayable
    // integer hash family, so the DuckDB oracle rebuilds registers
    // AND estimate (hash-checked — formerly the suite's last
    // rows-only entry); accuracy stays property-tested vs exact.
    "q21_vocab_sizes" -> (plans.CardinalityEstimator.vocabTable _),
    "q22_exact_dedup" -> (operators.Dedup.exactDedup _),
    // fully oracle-replayed since r08: portable polynomial shingle
    // hashes + the affine MinHash family + fold band keys (the
    // q132/KMV discipline), so DuckDB rebuilds signatures, candidate
    // sets AND verification; recall vs brute force stays unit-tested
    // (DedupSpec).
    "q23_minhash_pairs" -> ((s: SparkSession, d: String) =>
      operators.Dedup.minhashPairs(s, d)),
    "q24_simhash_pairs" -> ((s: SparkSession, d: String) =>
      operators.Dedup.simhashPairs(s, d)),
    "q25_ngram_jaccard_pairs" -> ((s: SparkSession, d: String) =>
      operators.Dedup.ngramJaccardPairs(s, d)),
    "q26_cosine_topk" -> ((s: SparkSession, d: String) =>
      operators.Similarity.cosineTopK(s, d)),
    // since r11 this routes through the grid-blocked exact self-join
    // (Similarity.blockedEmbeddingPairs) — bit-identical to the
    // brute-force form (SimilaritySpec proves blocked ≡ brute force
    // pair-for-pair), but the plan is an equality shuffle join on the
    // block-pair cell: O(n·B) shuffle rows, B(B+1)/2 distributable
    // tasks, no BNLJ, no O(n²) row explosion. The brute-force
    // spelling (Similarity.embeddingPairs) survives as the spec-side
    // audit twin only; it is no longer in the benched suite.
    "q27_embedding_pairs" -> ((s: SparkSession, d: String) =>
      operators.Similarity.blockedEmbeddingPairs(s, d, threshold = 0.4)),
    // fully oracle-replayed since r08: the IVF index is the
    // deterministic Lloyd fit (q120 trajectory discipline — first-k
    // init, 6 dp iterate rounding, (dist, cid) argmin tie-break), the
    // probe ranking rounds centroid cosine to 6 dp with a cell-id
    // tie-break, so cells, probes AND the top-k replay in SQL; recall
    // vs the exact top-k stays unit-tested (SimilaritySpec).
    // since r11 the probe reads the PERSISTED index (cell-partitioned
    // parquet, built once at write time like q186's bucketing): the
    // cell predicate is enforced by PartitionFilters — non-probed
    // cells pruned from directory metadata, zero data IO
    // (plan-asserted in SimilaritySpec); answers are bit-identical to
    // the in-memory form (deterministic fit), so the oracle is
    // unchanged
    "q28_ivf_topk" -> ((s: SparkSession, d: String) =>
      operators.Similarity.ivfTopKIndexed(s, d)),
    // distributed twin of q27: grid-blocked exact self-join (equality
    // shuffle joins on the block-pair cell, each pair computed once —
    // no BNLJ, no full-corpus broadcast). Exact, so q27's oracle
    // applies verbatim. LSH (Similarity.lshPairs) stays the τ≥0.8
    // tool; at this corpus's τ=0.4 the background reaches 0.3999 and
    // angular LSH cannot separate — see SCALE.md.
    "q50_embedding_pairs_blocked" -> ((s: SparkSession, d: String) =>
      operators.Similarity.blockedEmbeddingPairs(s, d, threshold = 0.4)),
    "q29_token_stats" -> (operators.TextQueries.tokenStats _),
    "q30_quality_scores" -> (operators.TextQueries.qualityScores _),
    // heuristic language ID — the stopword-profile argmax is pure
    // arithmetic over whitespace tokens, so the oracle replays the
    // DECISIONS verbatim (accuracy on real multilingual text is
    // additionally unit-tested on fixtures; corpus text carries no
    // language signal, which is irrelevant to decision equality)
    "q31_langid" -> (operators.TextQueries.langIdQuery _),
    "q32_fingerprints" -> (operators.TextQueries.fingerprints _),
    "q33_media_stats" -> (multimodal.Multimodal.mediaStats _),
    "q35_percentiles" -> (operators.OlapQueries.quantityPercentiles _),
    "q38_asof_join" -> (operators.AsOfJoin.eventsAsOfPurchases _),
    "q39_user_sessions" -> (operators.OlapQueries.userSessions _),
    "q40_shipping_priority" -> (operators.OlapQueries.shippingPriority _),
    "q41_systematic_sample" -> (operators.OlapQueries.systematicSample _),
    // cluster resolution DECISIONS over the oracle-replayable exact
    // pair set (recursive-CTE transitive-closure oracle); the LSH-pair
    // variant (Dedup.dedupDecisions) stays spec-covered in DedupSpec.
    "q42_dedup_decisions" -> (operators.Dedup.dedupDecisionsExact _),
    "q43_grouping_sets" -> (operators.SqlQueries.groupingSets _),
    "q46_kept_corpus" -> (operators.Dedup.keptCorpus _),
    "q47_token_packing" -> ((s: SparkSession, d: String) =>
      operators.Pipeline.tokenPacking(s, d)),
    "q48_contamination" -> ((s: SparkSession, d: String) =>
      operators.Pipeline.contamination(s, d)),
    "q49_heavy_hitters" -> (plans.CardinalityEstimator.heavyHitters _),
    "q51_quality_quartile" -> (operators.Pipeline.qualityQuartile _),
    "q52_mixture_sample" -> (operators.Pipeline.mixtureSample _),
    // q19 re-planned through the bounded topk_rows aggregate — same
    // rows, same oracle; the plan is the point (no window sort, map-
    // side top-k before the shuffle)
    "q53_topk_agg" -> (operators.OlapQueries.topOrdersPerCustomerAgg _),
    "q54_hashed_tf" -> ((s: SparkSession, d: String) =>
      operators.TextQueries.hashedTf(s, d)),
    "q55_quantized_topk" -> ((s: SparkSession, d: String) =>
      operators.Similarity.quantizedTopK(s, d)),
    "q56_doc_chunks" -> ((s: SparkSession, d: String) =>
      operators.Pipeline.chunkDocuments(s, d)),
    "q57_pii_scrub" -> (operators.Pipeline.scrubPii _),
    // the whole corpus-prep pipeline (sample -> scrub -> chunk) as one
    // fused plan — composition is the point; each stage is separately
    // oracle-proven by q52/q57/q56
    "q58_corpus_manifest" -> (operators.Pipeline.corpusManifest _),
    // range join via grid-cell bucketing (equality join + exact
    // verify) — the oracle replays the naive BETWEEN join
    "q59_range_join" -> (operators.RangeJoin.eventValueBands _),
    // PPJoin-family prefix filter: df-ordered prefixes over an
    // inverted index — blocking-free exact Jaccard pairs (the scale
    // path with no length-reach limit; oracle is the naive O(n²) form)
    "q60_prefix_jaccard_pairs" -> ((s: SparkSession, d: String) =>
      operators.Dedup.prefixJaccardPairs(s, d)),
    // batch twin of the streaming first-seen dedup (EventStreams.
    // firstSeenStream; StreamingSpec proves stream ≡ batch) —
    // deterministic argmin via lexicographic struct-min
    "q61_first_events" -> (operators.OlapQueries.firstEvents _),
    // q48 re-planned through the mergeable Bloom sketch: scan-fused
    // probe prefilter + exact verify join — same exact answer, so the
    // oracle is q48's verbatim
    "q62_bloom_contamination" -> ((s: SparkSession, d: String) =>
      operators.Pipeline.bloomContamination(s, d)),
    // exact-k-per-stratum sampling via the bounded topk_rows aggregate
    // (map-side ≤k rows per language; portable arithmetic priority)
    "q63_stratified_sample" -> ((s: SparkSession, d: String) =>
      operators.Pipeline.stratifiedSample(s, d)),
    "q64_unigram_lm" -> (operators.TextQueries.unigramLogProb _),
    // cume_dist without a corpus-wide window: per-value counts →
    // sharded prefix sum over the NDV-sized frame → broadcast join
    // back; the oracle IS the window spelling, so the rewrite is
    // hash-proven equivalent
    "q65_length_cdf" -> (operators.TextQueries.lengthCdf _),
    "q66_repetition_stats" -> (operators.TextQueries.repetitionStats _),
    "q67_incremental_dedup" -> (operators.Dedup.incrementalDedup _),
    "q68_time_window_avg" -> (operators.OlapQueries.timeWindowAvg _),
    "q69_pivot_events" -> (operators.OlapQueries.pivotEventCounts _),
    // span-level (substring) dedup: 128-bit hashed span keys shuffle,
    // the oracle groups on the raw span text
    "q70_dup_spans" -> ((s: SparkSession, d: String) =>
      operators.Dedup.dupSpans(s, d)),
    "q71_hashed_tfidf" -> ((s: SparkSession, d: String) =>
      operators.TextQueries.hashedTfIdf(s, d)),
    // vector centroid per label: mergeable O(dim) aggregate state, the
    // (labels × dim) result exploded only AFTER aggregation
    "q72_label_centroids" -> (operators.Similarity.labelCentroids _),
    "q73_interleave" -> (operators.Pipeline.interleaveBySource _),
    // batch k-NN join: broadcast probe batch × one corpus scan, per-
    // query top-k through the bounded topk_rows aggregate (shuffle =
    // O(k·queries) rows, no window sort)
    "q74_knn_join" -> ((s: SparkSession, d: String) =>
      operators.Similarity.knnJoin(s, d)),
    // StringIndexer fit: dense frequency-ranked term ids with NO
    // corpus-wide window — (freq, first-letter) sub-shards + collected
    // offsets; the oracle IS the global-window spelling
    "q75_vocab_index" -> (operators.TextQueries.vocabIndex _),
    // StringIndexer transform: docs rewritten as (doc_id, pos, term_id)
    // under the broadcast q75 vocabulary
    "q76_token_ids" -> (operators.TextQueries.encodeTokens _),
    // SemDeDup: corpus surviving embedding-space near-dup removal —
    // blocked exact pairs -> connected components -> keep min id; the
    // oracle replays the component rule as a recursive-CTE closure
    "q77_semantic_kept" -> ((s: SparkSession, d: String) =>
      operators.Similarity.semanticKept(s, d)),
    // TPC-H Q5 shape: six-table join with the cross-branch
    // c_nationkey = s_nationkey predicate; dims broadcast, facts shuffle
    "q78_local_supplier_volume" -> (operators.OlapQueries.localSupplierVolume _),
    // temperature-balanced language resampling (the mC4/XLM-R recipe):
    // NDV-sized rate table broadcast onto one corpus scan; the accept
    // test is the deterministic Knuth bucket, fused into the scan
    "q79_temperature_resample" -> ((s: SparkSession, d: String) =>
      operators.Pipeline.temperatureResample(s, d)),
    // Z-order layout manifest: Morton key as pure column arithmetic +
    // per-bucket min/max boxes — the data-skipping stats a clustered
    // write carries; each bucket's box provably spans < 2^9 per dim
    "q80_zorder_manifest" -> ((s: SparkSession, d: String) =>
      operators.Layout.zorderManifest(s, d)),
    // click→purchase attribution: user-equality join with the time
    // bound as a post-join predicate (no nested loop); batch twin of
    // the stream-stream interval join in EventStreams
    "q81_attribution" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.purchaseAttribution(s, d)),
    // TPC-H Q17 shape via a partitioned window: one lineitem scan and
    // one shuffle where decorrelated subqueries scan the fact twice
    "q82_small_qty_revenue" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.smallQuantityRevenue(s, d)),
    // conversion funnel: conditional argmin per stage in one scan
    "q83_funnel" -> (operators.OlapQueries.eventFunnel _),
    // TPC-H Q18 shape: HAVING aggregate on the fact key, tiny survivor
    // set joins back — map-side combine keeps the shuffle narrow
    "q84_large_orders" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.largeOrders(s, d)),
    // TPC-H Q14 shape: conditional aggregate over one broadcast join
    "q85_promo_revenue" -> (operators.OlapQueries.promoRevenue _),
    // TPC-H Q19 shape: OR-of-ANDs residual inside one broadcast join
    "q86_disjunctive_revenue" -> (operators.OlapQueries.disjunctiveRevenue _),
    // TPC-H Q22 shape: scalar-subquery broadcast + left-anti join
    "q87_idle_rich_customers" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.idleRichCustomers(s, d)),
    // TPC-H Q4 shape: EXISTS as a left-semi join with a residual
    "q88_priority_waiting" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.priorityWaitingOrders(s, d)),
    // per-source contamination rates: q48's broadcast-gram plan + one
    // narrow left join — the decontamination audit's summary table
    "q89_contamination_rate" -> ((s: SparkSession, d: String) =>
      operators.Pipeline.contaminationRate(s, d)),
    // composite quality gate: three portable signals, per-reason
    // reject tallies, one map-side-combined aggregate over one scan
    "q90_quality_gate" -> ((s: SparkSession, d: String) =>
      operators.Pipeline.qualityGate(s, d)),
    // one pair-merge iteration of BPE-style tokenizer training: top
    // adjacent-pair counts via explode + partial-agg + rank-limit
    "q91_bpe_merges" -> ((s: SparkSession, d: String) =>
      operators.TextQueries.bpeMergeCandidates(s, d)),
    // dedup audit: cluster-size histogram of the exact-Jaccard pair
    // graph; oracle replays components as a recursive CTE
    "q92_cluster_sizes" -> (operators.Dedup.clusterSizes _),
    // per-source caps: quality-ranked keep-k through the bounded
    // topk_rows aggregate — no corpus-wide window sort
    "q93_source_caps" -> ((s: SparkSession, d: String) =>
      operators.Pipeline.sourceCaps(s, d)),
    // manifest MERGE: full-outer join on content hash — the
    // Delta/Iceberg-shaped upsert of incremental corpus maintenance
    "q94_merge_manifest" -> (operators.Pipeline.mergeManifest _),
    // the ranking-window surface (ntile/percent_rank/cume_dist/lead/
    // first/nth) fused into one WindowExec pass
    "q95_window_suite" -> (operators.OlapQueries.windowSuite _),
    // q35 re-planned without collect_list state: fixed-point counts +
    // sharded prefix sum + broadcast rank probes — same oracle
    "q96_percentiles_distributed" ->
      (operators.Percentiles.quantityPercentilesDistributed _),
    // TPC-H Q1 verbatim: eight map-side-combinable aggregates over one
    // pushed-down fact scan
    "q97_pricing_summary" -> (operators.OlapQueries.pricingSummary _),
    // retention triangle: first-month argmin + distinct activity +
    // one user-keyed join; month math is post-join arithmetic
    "q98_cohort_retention" -> (operators.OlapQueries.cohortRetention _),
    // ingest gate + first-occurrence dedup in one argmin aggregate;
    // the streaming twin admits the same rows (RetentionAdmissionSpec)
    "q99_corpus_admission" -> ((s: SparkSession, d: String) =>
      operators.Pipeline.corpusAdmission(s, d)),
    // the capstone composition: admission → temperature resample →
    // token packing as one fused plan; the oracle replays the whole
    // line as a CTE chain
    "q100_training_mix" -> ((s: SparkSession, d: String) =>
      operators.Pipeline.trainingMix(s, d)),
    // REAL image decode (pure-JVM netpbm P6 codec) over valid PPM
    // payloads; the oracle replays the synthesis arithmetic, so a
    // header-parse or raster-stride bug breaks the hash compare
    "q101_image_decode" -> (multimodal.Multimodal.decodeImages _),
    // TPC-H Q7/Q8/Q9/Q10/Q13/Q15 shapes — one fact shuffle each, every
    // dim broadcast; verbatim SQL oracles
    "q102_volume_shipping" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.volumeShipping(s, d)),
    "q103_market_share" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.marketShare(s, d)),
    "q104_product_profit" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.productProfit(s, d)),
    "q105_returned_items" -> (operators.OlapQueries.returnedItems _),
    "q106_order_distribution" ->
      (operators.OlapQueries.orderCountDistribution _),
    "q107_top_supplier" -> (operators.OlapQueries.topSupplier _),
    // S2's genuine form: TFRecord-framed gzipped record files through
    // the recordstream DSv2 connector, write → read → parse → agg; the
    // oracle aggregates the parquet original, so the hash compare
    // proves the record framing lossless
    "q108_recordstream" -> (operators.CoreQueries.recordStreamAgg _),
    // overlapping windows through the SAME transform the stream runs
    // (StreamingSpec proves stream ≡ batch); the oracle replays the
    // 2-windows-per-event assignment as a self-union
    "q109_sliding_windows" -> (operators.OlapQueries.slidingEventStats _),
    // q47's contents half: which docs land in each pack, in order
    "q110_pack_contents" -> ((s: SparkSession, d: String) =>
      operators.Pipeline.packContents(s, d)),
    // TPC-H Q2 shape: groupwise-min join-back, all ties surface
    "q111_cheapest_shipment" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.cheapestShipment(s, d)),
    // the native session_window primitive under q39's windowed spelling
    "q112_session_windows" -> (operators.OlapQueries.sessionWindowStats _),
    // Markov transition counts over per-user event sequences
    "q113_event_transitions" -> (operators.OlapQueries.eventTransitions _),
    // sequence-length bucketing: the padded-batch efficiency report
    "q114_length_buckets" -> ((s: SparkSession, d: String) =>
      operators.Pipeline.lengthBuckets(s, d)),
    // WITH RECURSIVE date spine + gap-filled monthly aggregates
    "q115_monthly_spine" -> (operators.SqlQueries.monthlySpine _),
    // LATERAL correlated LIMIT-1 subquery, decorrelated by Catalyst
    "q116_top_order_lateral" -> (operators.SqlQueries.topOrderLateral _),
    // TPC-H Q6 verbatim: pushed-down conjunctive filter, one global sum
    "q117_forecast_revenue" -> (operators.OlapQueries.forecastRevenue _),
    // TPC-H Q12 shape: late-shipment priority counts per line status
    "q118_late_line_priority" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.lateLinePriority(s, d)),
    // TPC-H Q21 shape: EXISTS/NOT EXISTS as one two-level aggregate
    "q119_waiting_supplier" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.waitingSupplier(s, d)),
    // explicit Lloyd k-means, every iterate oracle-replayable
    "q120_lloyd_clusters" -> ((s: SparkSession, d: String) =>
      operators.Similarity.lloydClusters(s, d)),
    // TPC-H Q16 shape: distinct-supplier breadth per part attribute
    "q121_part_supplier_counts" -> (operators.OlapQueries.partSupplierCounts _),
    // embedding near-dup components, per-member oracle via recursive CTE
    "q123_embedding_clusters" -> ((s: SparkSession, d: String) =>
      operators.Similarity.embeddingClusters(s, d)),
    // logistic-regression batch GD, every iterate oracle-replayable
    "q124_logreg_gd" -> ((s: SparkSession, d: String) =>
      operators.Estimators.logregGd(s, d)),
    // PCA power iteration: covariance-free distributed matvec
    "q125_pca_projection" -> ((s: SparkSession, d: String) =>
      operators.Similarity.pcaPowerIteration(s, d)),
    // Naive Bayes language ID: pivoted broadcast model, one apply pass
    "q126_naive_bayes" -> (operators.TextQueries.naiveBayesLang _),
    // SCD2: change-log → validity intervals, one shared window pass
    "q127_scd2_intervals" -> (operators.OlapQueries.scd2Intervals _),
    // Count-Min sketch with engine-portable hashes, audited vs exact
    "q128_countmin" -> ((s: SparkSession, d: String) =>
      operators.TextQueries.countMinEstimates(s, d)),
    // closed-form per-key OLS: fit = two aggregates, never iterate
    "q129_revenue_trend" -> (operators.OlapQueries.revenueTrend _),
    // exact-k weighted sample: priority = hash/weight, bounded top-k
    "q130_weighted_sample" -> ((s: SparkSession, d: String) =>
      operators.Pipeline.weightedSample(s, d)),
    // TPC-H Q11 shape: nation-scoped part-value shares over one cached
    // NDV-sized aggregate — completes the 22-query TPC-H shape sweep
    "q131_important_parts" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.importantPartValues(s, d)),
    // KMV NDV sketch, audited vs exact: the sketch state (k smallest
    // distinct portable hashes) is itself oracle-replayable
    "q132_kmv_vocab" -> ((s: SparkSession, d: String) =>
      plans.CardinalityEstimator.kmvVocabTable(s, d)),
    // bottom-k quantile sketch: bounded per-group sample off one scan,
    // selection (and estimates) exactly SQL-replayable
    "q133_sample_quantiles" -> ((s: SparkSession, d: String) =>
      operators.Percentiles.sampleQuantiles(s, d)),
    // PageRank on the customer↔supplier trade graph: O(|V|) model
    // state kept distributed, one shuffle per damped iteration, every
    // iterate rounded to 6 dp so unrolled CTEs replay the trajectory
    "q134_trade_rank" -> ((s: SparkSession, d: String) =>
      operators.PageRank.tradeRank(s, d)),
    // self-join size (F2) from a 1-in-64 hash sample of the KEY
    // domain, audited against the exact Σc² — integer arithmetic
    // end-to-end, so estimate AND error replay in SQL
    "q135_join_card" -> ((s: SparkSession, d: String) =>
      plans.CardinalityEstimator.joinCardEstimate(s, d)),
    // KMV set algebra: union/intersection/Jaccard of two key domains
    // from bottom-k sketch state (Beyer et al. SIGMOD'07), audited
    "q136_kmv_setops" -> ((s: SparkSession, d: String) =>
      plans.CardinalityEstimator.kmvSetAlgebra(s, d)),
    // time-series densification + LOCF on a generated (segment × day)
    // spine; fact reduces to spine grain map-side, windows bounded by
    // |days| per partition — never corpus-sized
    "q137_locf_fill" -> (operators.OlapQueries.locfFill _),
    // Pearson matrix from one melted scan of EXACT decimal moments;
    // the double formula runs on six exact scalars per pair
    "q138_corr_matrix" -> (operators.OlapQueries.corrMatrix _),
    // PMI collocations: doc-bounded adjacency windows, NDV-sized count
    // shuffles, min-count pruning before the unigram join-back
    "q139_pmi_pairs" -> ((s: SparkSession, d: String) =>
      operators.TextQueries.pmiPairs(s, d)),
    // bipartite 4-cycle census: wedge self-join keyed on the customer,
    // map-side-combined supplier-pair counts, exact integer C(c,2)
    "q140_butterflies" -> ((s: SparkSession, d: String) =>
      operators.PageRank.butterflyCount(s, d)),
    // chi-square independence on a generated (type × hour) spine —
    // empty cells contribute their expected mass; counts exact longs
    "q141_chi_square" -> (operators.OlapQueries.chiSquare _),
    // Shannon entropy of low-NDV columns, melted into ONE scan;
    // p·ln p over exact counts, NDV-sized shuffles
    "q142_column_entropy" -> ((s: SparkSession, d: String) =>
      plans.CardinalityEstimator.columnEntropy(s, d)),
    // Okapi BM25 for a fixed term set: one tokenization pass feeds
    // lengths and tfs; df and corpus totals broadcast; scoring prunes
    // to matching docs before any join
    "q143_bm25_topk" -> ((s: SparkSession, d: String) =>
      operators.TextQueries.bm25TopK(s, d)),
    // reciprocal-rank fusion of keyword (BM25) and semantic (cosine)
    // retrieval — parameter-sized rank windows, full-outer merge
    "q144_rank_fusion" -> ((s: SparkSession, d: String) =>
      operators.Similarity.rankFusion(s, d)),
    // Welch's t between two cohorts: metric quantized to permille ints
    // so every moment is an exact long; t/df in doubles on 6 scalars
    "q145_welch_ttest" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.welchTTest(s, d)),
    // Tukey IQR fences per group over exact fixed-point percentiles;
    // NDV-sized fence frame broadcast back onto one conditional agg
    "q146_iqr_outliers" -> (operators.OlapQueries.iqrOutliers _),
    // market-basket lift: basket self-join keyed on the order, pair
    // counts map-side combined, min-support pruning before margins
    "q147_copurchase_lift" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.copurchaseLift(s, d)),
    // reliability diagram of the q124 model: broadcast decile
    // cutpoints, no corpus-wide ntile window
    "q148_model_calibration" -> ((s: SparkSession, d: String) =>
      operators.Estimators.calibrationDeciles(s, d)),
    // revenue concentration: rank-weighted Gini over the NDV-sized
    // customer frame, global rank via the sharded prefix sum
    "q149_gini_revenue" -> (operators.OlapQueries.giniRevenue _),
    // funnel latency: first-touch conditional mins in one aggregate,
    // exact integer-µs deltas, percentile over the user-NDV frame
    "q150_conversion_latency" ->
      (operators.OlapQueries.conversionLatency _),
    // governance view over the oracle-proven q25 pair join: per
    // unordered source pair, leak count + mean Jaccard
    "q151_cross_source_dups" -> ((s: SparkSession, d: String) =>
      operators.Dedup.crossSourceDups(s, d)),
    // sequence mining: session-opening event paths (session-bounded
    // collect, deterministic sort, path-NDV count shuffle)
    "q152_top_paths" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.topPaths(s, d)),
    // Poisson bootstrap: B resamples in ONE pass via hash-derived
    // per-row weights, exact integer resample sums, CI over B means
    "q153_bootstrap_ci" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.bootstrapCi(s, d)),
    // exact percentiles of a near-unique money domain via histogram
    // range-narrowing selection (distributed quickselect) — the
    // routed machinery forced down its scale path at every SF
    "q154_selection_percentiles" -> ((s: SparkSession, d: String) =>
      operators.Percentiles.pricePercentilesSelection(s, d)),
    // connected components via large-star/small-star doubling on a
    // 1000-long chain graph — a diameter min-label propagation would
    // refuse; components analytically known, hence SQL-oracle-able
    "q155_connected_components" -> ((s: SparkSession, d: String) =>
      operators.ConnectedComponents.chainComponents(s, d)),
    // incremental resolution: "yesterday's" half-block chains merge
    // "today's" bridge edges through the condensed label graph — the
    // base edges are never re-read; components are analytically the
    // doubled blocks, so plain SQL oracles a two-phase incremental run
    "q157_incremental_components" -> ((s: SparkSession, d: String) =>
      operators.ConnectedComponents.incrementalChainComponents(s, d)),
    // linear text classifier trained IN the engine: standardized
    // hashed-TF shares, 5 batch-GD steps, every engine-crossing
    // parameter (μ, σ, avg-gradients) rounded 6 dp — the whole
    // training run + confusion matrix replays as unrolled CTEs
    "q156_text_classifier" -> ((s: SparkSession, d: String) =>
      operators.Estimators.textClassifierGd(s, d)),
    // TPC-H Q20 shape: nested-aggregate dominant-supplier semi join
    "q122_dominant_suppliers" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.dominantSuppliers(s, d)),
    "q44_string_functions" -> (operators.SqlQueries.stringFunctions _),
    "q45_big_spenders" -> (operators.SqlQueries.bigSpenders _),
    "q36_cube_orders" -> (operators.OlapQueries.cubeOrders _),
    "q37_orders_by_month" -> (operators.OlapQueries.ordersByMonth _),
    // REAL audio decode: RIFF/WAVE PCM chunk walk over deterministic
    // synthesis — the oracle replays the integer feature arithmetic
    // from text while Spark parses the actual bytes (q101's pattern,
    // audio edition). The stub-codec batch plumbing stays spec-covered
    // in MultimodalSpec.
    "q34_media_features" -> (multimodal.Multimodal.audioFeatures _),
    // per-doc duplication profile at character grain (the span-excision
    // decision input; q70 is the positioned word-span detector). The
    // default runs the hashed-key spelling — both window-key shuffles
    // move 8-byte xxhash64 keys, never 32-char substrings; the counts
    // are hash-invariant (spec-proven), so the raw-string oracle holds
    "q158_substring_dedup" -> (operators.Dedup.substringDedup(_, _)),
    // CUSUM changepoint monitor over daily ingest volume — a recursion
    // replayed in SQL through its prefix-sum/prefix-min closed form
    "q159_cusum_changepoint" -> ((s: SparkSession, d: String) =>
      operators.OlapQueries.cusumDailyEvents(s, d)),
    // real resize (header parse → pixel sampling → re-encode → decode);
    // the oracle replays the nearest-neighbor index arithmetic
    "q160_image_resize" -> ((s: SparkSession, d: String) =>
      multimodal.Multimodal.resizeImages(s, d)),
    // real 2× audio decimation (chunk walk → sample selection →
    // re-encode → decode); oracle replays the kept positions
    "q161_audio_resample" -> ((s: SparkSession, d: String) =>
      multimodal.Multimodal.resampleAudio(s, d)),
    // q155's twin on the orthogonal hard axis: HUB-STAR blocks (max
    // degree grows with block size) instead of deep chains — the
    // unified sorted-run doubling loop's hub safety gets an oracle
    // check at every SF, not just the SkewFixtureSpec replica proof
    "q162_components_hubstar" -> ((s: SparkSession, d: String) =>
      operators.ConnectedComponents.starComponents(s, d)),
    // framed audio features (energy + zero crossings per 64-sample
    // frame) — integer-exact, so the oracle replays the synthesis
    "q163_audio_frames" -> ((s: SparkSession, d: String) =>
      multimodal.Multimodal.audioFrameFeatures(s, d)),
    // per-channel pixel histograms (the near-black/blown-out image
    // filter input); counts replayed by the oracle from the synthesis
    "q164_image_histogram" -> ((s: SparkSession, d: String) =>
      multimodal.Multimodal.imageHistograms(s, d)),
    // strided frame sampling with per-frame sha-256 — the sampled
    // slices compared byte-for-byte against the oracle's substrings
    "q165_frame_digests" -> ((s: SparkSession, d: String) =>
      multimodal.Multimodal.frameDigests(s, d)),
    // INCREMENTAL near-dup: today's batch (every 5th doc) against the
    // persisted prefix index of the rest — exact (no LSH recall
    // loss), so the oracle is q60's brute force restricted to
    // batch-touching pairs; corpus text is never re-shingled (spec-
    // asserted accumulator invariant)
    "q166_incremental_neardup" -> ((s: SparkSession, d: String) =>
      operators.Dedup.incrementalNearDupPairs(s, d)),
    // near-dup-aware train/validation split: docs route by CLUSTER
    // representative (shared exact pair frame → resolution), so near
    // -dups never straddle splits; rep % 10 keeps it oracle-replayable
    "q167_leakage_split" -> ((s: SparkSession, d: String) =>
      operators.Dedup.leakageFreeSplit(s, d)),
    // MULTI-day incremental near-dup: corpus arrives in 3 waves; day 0
    // bootstraps the prefix index and self-resolves, later days
    // merge-and-absorb under the PINNED day-0 df ordering — the union
    // over days provably equals the one-shot blocking-free answer, so
    // the oracle is q60's full brute force verbatim
    "q168_multiday_neardup" -> ((s: SparkSession, d: String) =>
      operators.Dedup.multiDayNearDupPairs(s, d)),
    // keep-BEST curation: each near-dup cluster keeps its highest-
    // quality member (q30's score; doc_id tiebreak), not the minimum
    // id — closure + argmax replayed by the oracle
    "q169_keepbest_curation" -> ((s: SparkSession, d: String) =>
      operators.Dedup.keepBestCuration(s, d)),
    // exact top-k Jaccard SEARCH (retrieval, not thresholding): per
    // probe doc the 5 most-similar docs with J >= 0.1, ranked by the
    // bounded topk_rows aggregate over prefix-index candidates
    "q170_jaccard_search" -> ((s: SparkSession, d: String) =>
      operators.Dedup.jaccardTopK(s, d)),
    // CCNet-style perplexity filter: rank-exact head/middle/tail
    // thirds under the corpus unigram LM, tail dropped — the
    // bucketing runs WITHOUT a corpus-wide window
    "q171_perplexity_buckets" -> (operators.TextQueries.perplexityBuckets _),
    // materialized-summary routing: the aggregate is transparently
    // rewritten onto a (flag, status, day)-grain pre-aggregate; the
    // oracle computes from the RAW table, so the hash-PASS proves
    // the rewrite correct
    "q172_summary_pricing" -> (operators.OlapQueries.summaryPricing _),
    // the derived-grain rollup through the router: month over the
    // day grain exercises alias inlining + coarser re-aggregation
    // under the raw-table oracle
    "q173_summary_monthly" -> (operators.OlapQueries.summaryMonthly _),
    // the ORACLE-CHECKED sketch measure: a KMV bottom-k array stored
    // per grain row answers the distinct-supplier estimate through
    // the router, and the portable hash lets DuckDB replay it
    "q174_summary_kmv" -> (operators.OlapQueries.summaryKmvSuppliers _),
    // per-doc 3-gram novelty (share of grams FIRST introduced by the
    // doc in doc_id order) — exact scaled-integer ratio, gram-NDV
    // shuffle only
    "q175_ngram_novelty" -> (operators.TextQueries.ngramNovelty _),
    // vocabulary growth curve per ingest batch: per-term first-day min
    // + sharded prefix-sum cumulative (no single-partition window)
    "q176_vocab_growth" -> ((s: SparkSession, d: String) =>
      operators.TextQueries.vocabGrowth(s, d)),
    // JOIN-aware MV routing: the lineitem⋈orders aggregate is
    // transparently rewritten onto a (priority, flag)-grain summary of
    // the JOIN — the routed plan has no join and reads neither raw
    // table; the oracle computes from them, proving the rewrite
    "q177_summary_join" -> (operators.OlapQueries.summaryJoinPriority _),
    // the joined MV's INCREMENTAL lifecycle: partial build over the
    // historical fact slice + one joined-delta refresh, then the
    // routed answer must equal the oracle's from-scratch join
    "q178_summary_join_refresh" ->
      (operators.OlapQueries.summaryJoinRefresh _),
    // EXACT percentiles through a histogram-grain MV: a summary at
    // (flag, quantity) grain is the counts-route histogram, and
    // percentile/min/max/count/distinct-count all route onto its
    // ~150 rows; the oracle replays from the raw table
    "q179_summary_percentiles" ->
      (operators.OlapQueries.summaryPercentiles _),
    // the two routing families composed: percentiles over a fact-dim
    // join answered from a joined histogram-grain summary — no join,
    // no raw scan in the routed plan
    "q180_summary_join_percentiles" ->
      (operators.OlapQueries.summaryJoinPercentiles _),
    // ROLLUP through the router: the summary slides under the Expand,
    // so subtotal and grand-total levels re-aggregate summary rows
    // cnt-weighted; the oracle rolls up the raw table
    "q181_summary_rollup" -> (operators.OlapQueries.summaryRollup _),
    // STAR-schema routing: a 3-table inner equi-join (customer ⋈
    // orders ⋈ lineitem) answered from one joined summary — spelled
    // in a different join order than the registration to exercise
    // the canonical path+edge key; the oracle joins from scratch
    "q182_summary_star" -> (operators.OlapQueries.summaryStarSegment _),
    // exact stddev/variance routed through the summary's Σx² leg —
    // the engine's decimal-exact moment family (Spark's own double
    // Welford stays raw, fail-closed); oracle replays the scaled-
    // integer sums and the one double quotient
    "q184_summary_variance" -> (operators.OlapQueries.summaryVariance _),
    // the DEEP star: q78's six-table TPC-H-Q5 join (with the local
    // cross-branch equality) answered from one joined summary, the
    // query spelled dims-outward-in vs the fact-outward registration;
    // the oracle re-joins all six tables from scratch
    "q183_summary_star6" -> (operators.OlapQueries.summaryLocalVolume _),
    // the DELTA-COMPENSATED read: a summary built over 80% of the
    // rows, the other 20% appended as new files — the router answers
    // merge(summary, partial-agg(new files only)), the post-append
    // truth, so the oracle is the plain aggregate over the FULL table
    "q185_summary_delta" -> (operators.OlapQueries.summaryDeltaPricing _),
    // the TWO-LEAF delta-compensated JOINED read: fact AND dim both
    // gain appended files in one window, and the telescoped
    // inclusion–exclusion fold (Δli⋈ord₀ + (li₀+Δli)⋈Δord, reads
    // pinned to the blessed listing) keeps the star routed; base ∪
    // delta is exactly the full tables, so the oracle is the plain
    // aggregate over raw lineitem ⋈ orders
    "q187_summary_delta_join" -> (operators.OlapQueries.summaryDeltaJoin _),
    // the FILTERED MV: summary declared WHERE l_quantity > 30 (built
    // over the slice only); the query filters the STRICTLY STRONGER
    // l_quantity > 35, so routing exercises the subsumption gate's
    // range containment; the oracle recomputes over the raw slice
    "q188_summary_filtered" -> (operators.OlapQueries.summaryFiltered _),
    // the QUANTILE-SKETCH MV measure: approximate percentiles routed
    // on a grain WITHOUT the value column — bottom-k (portable-hash,
    // cents) pair sketches stored per grain row, union lossless, so
    // the routed nearest-rank estimate is bit-identical to sketching
    // raw rows and the oracle replays the whole sketch in SQL
    "q189_summary_quantile_sketch" ->
      (operators.OlapQueries.summaryQuantileSketch _),
    // MULTIPLE summaries on one source, best-match routing: the full
    // pricing summary AND the filtered high-quantity slice are both
    // registered; the rewrite serves this query from the slice (the
    // smallest qualifying build — spec-asserted); oracle = raw slice
    "q190_summary_best_match" ->
      (operators.OlapQueries.summaryBestMatch _),
    // the DELETE-compensated MV read: a retention job removes one
    // built file (the l_orderkey%10=7 slice, isolated in its own
    // file); invertible aggregates route onto merge(summary,
    // negate(cube rows of the deleted file)) reading summary + cube
    // only (plan-asserted in the query); the oracle replays the
    // post-delete truth as the raw aggregate over the surviving slice
    "q191_summary_delete_comp" ->
      (operators.OlapQueries.summaryDeleteComp _),
    // read-after-REBLESS: a summarized copy of lineitem is compacted
    // IN PLACE (Layout.compact + swap — the nightly OPTIMIZE), which
    // suspends routing; Summaries.rebless verifies the rewrite was
    // content-preserving at summary resolution and re-records the
    // fingerprint without rebuilding, and the read routes onto the
    // untouched generation (plan-asserted inside the query). The copy
    // is the full table, so the oracle is the plain raw aggregate
    "q192_summary_rebless" -> (operators.OlapQueries.summaryRebless _),
    // the SQL-DDL-managed MV: CREATE MATERIALIZED VIEW builds it,
    // the read routes onto it (plan-asserted inside the query), DROP
    // revokes — the whole lifecycle without the Scala API. Routing
    // is value-preserving, so the oracle is the plain raw aggregate
    "q193_summary_sql_ddl" -> (operators.OlapQueries.summarySqlDdl _),
    "q194_sorted_scan" -> (operators.Layout.sortedRangeScan _),
    "q195_zorder_scan" -> (operators.Layout.zorderRangeScan _),
    // co-located bucketed join: both tables hash-bucketed on the join
    // key at write time, so the sort-merge join runs with no shuffle
    // on either side (plan-asserted in LayoutSpec); bucketing is a
    // layout choice, so the oracle is the same join over raw parquet
    "q186_bucketed_join" -> (operators.Layout.bucketedJoin _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_events_topk" ->
      """SELECT event_type,
        |  round(sum(value), 4) AS total_value,
        |  round(avg(value), 4) AS avg_value,
        |  round(min(value), 4) AS min_value,
        |  round(max(value), 4) AS max_value,
        |  count(*) AS n_events
        |FROM events
        |GROUP BY event_type
        |ORDER BY total_value DESC, event_type
        |LIMIT 20""".stripMargin,
    "q02_scan_prune_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  round(l_extendedprice * (1 - l_discount), 4) AS revenue,
        |  l_shipdate
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_fill_defaults" ->
      """SELECT doc_id,
        |  coalesce(nullif(lang, 'en'), 'unknown') AS lang_or_default,
        |  coalesce(nullif(source, 'src0'), '') AS source_or_default
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q04_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q05_nest_unnest" ->
      """SELECT user_id,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1
        |       AS INTEGER) AS idx,
        |  event_id, event_type, value
        |FROM events
        |ORDER BY user_id, idx""".stripMargin,
    "q06_distinct_counts" ->
      """SELECT count(DISTINCT l_returnflag) AS n_returnflag,
        |  count(DISTINCT l_linestatus) AS n_linestatus,
        |  count(DISTINCT l_partkey) AS n_partkey,
        |  count(DISTINCT l_suppkey) AS n_suppkey,
        |  count(DISTINCT l_orderkey) AS n_orderkey
        |FROM lineitem""".stripMargin,
    "q07_table_counts" ->
      """SELECT 'lineitem' AS tbl, count(*) AS n_rows FROM lineitem
        |UNION ALL SELECT 'orders', count(*) FROM orders
        |UNION ALL SELECT 'customer', count(*) FROM customer
        |UNION ALL SELECT 'events', count(*) FROM events
        |UNION ALL SELECT 'documents', count(*) FROM documents
        |ORDER BY tbl""".stripMargin,
    "q08_feature_bucket" ->
      """SELECT p_partkey,
        |  (p_partkey * 2654435761) % 1000 AS bucket
        |FROM part
        |ORDER BY p_partkey""".stripMargin,
    "q09_normalize" ->
      """SELECT event_id, event_type,
        |  round((value - avg(value) OVER (PARTITION BY event_type)) /
        |        stddev_samp(value) OVER (PARTITION BY event_type), 4)
        |    AS value_norm
        |FROM events
        |ORDER BY event_id""".stripMargin,
    "q10_shuffle" ->
      """SELECT event_id,
        |  (event_id * 2654435761) % 1048576 AS shuffle_key
        |FROM events
        |ORDER BY shuffle_key, event_id
        |LIMIT 100""".stripMargin,
    "q11_repeat_epochs" ->
      """SELECT epoch, event_type, count(*) AS n
        |FROM (SELECT 0 AS epoch, event_type FROM events
        |      UNION ALL SELECT 1, event_type FROM events
        |      UNION ALL SELECT 2, event_type FROM events)
        |GROUP BY epoch, event_type
        |ORDER BY epoch, event_type""".stripMargin,
    "q12_batch_stats" ->
      """SELECT batch_id, count(*) AS batch_rows,
        |  round(sum(value), 4) AS batch_value
        |FROM (SELECT value,
        |        CAST(floor((row_number() OVER (ORDER BY event_id) - 1) / 512.0)
        |             AS BIGINT) AS batch_id
        |      FROM events)
        |GROUP BY batch_id
        |ORDER BY batch_id""".stripMargin,
    "q13_star_join_revenue" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q14_top_parts" ->
      """SELECT p_partkey, p_name, p_brand,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_partkey, p_name, p_brand
        |ORDER BY revenue DESC, p_partkey
        |LIMIT 20""".stripMargin,
    "q15_event_windows" ->
      """SELECT user_id, event_id, value,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  lag(value, 1) OVER w AS prev_value,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |    AS running_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q16_set_ops" ->
      """SELECT 'both' AS tag, nationkey FROM
        |  (SELECT c_nationkey AS nationkey FROM customer
        |   INTERSECT SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT 'cust_only', nationkey FROM
        |  (SELECT c_nationkey AS nationkey FROM customer
        |   EXCEPT SELECT s_nationkey FROM supplier)
        |ORDER BY tag, nationkey""".stripMargin,
    "q17_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |  coalesce(l_linestatus, '(all)') AS linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q18_semi_anti" ->
      """SELECT 'with_orders' AS tag, count(*) AS n_customers FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT 'without_orders', count(*) FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY tag""".stripMargin,
    "q19_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(rk AS INTEGER) AS rk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |      FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,
    "q59_range_join" ->
      """WITH bands AS (SELECT * FROM (VALUES
        |    (CAST(0 AS BIGINT), 0.0, 1.0), (1, 1.0, 2.0), (2, 2.0, 5.0),
        |    (3, 5.0, 10.0), (4, 10.0, 20.0), (5, 20.0, 50.0),
        |    (6, 50.0, 100.0), (7, 100.0, 200.0), (8, 200.0, 500.0))
        |  AS t(band_id, lo, hi))
        |SELECT band_id, count(*) AS n, round(sum(value), 4) AS total_value
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY band_id
        |ORDER BY band_id""".stripMargin,
    "q58_corpus_manifest" ->
      """WITH kept AS (
        |  SELECT doc_id, source,
        |    regexp_replace(
        |      regexp_replace(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |        '<EMAIL>', 'g'),
        |      '[0-9]{6,}', '<NUM>', 'g') AS text
        |  FROM documents
        |  WHERE ((doc_id % 1000000007) * 2654435761) % 1000 < CASE
        |      WHEN source IN ('src0','src1','src2','src3','src4') THEN 900
        |      WHEN source IN ('src5','src6','src7','src8','src9') THEN 500
        |      ELSE 200 END),
        |t AS (SELECT doc_id, source, string_split(text, ' ') AS ws
        |      FROM kept),
        |c AS (SELECT doc_id, source, u.s AS start_tok,
        |        u.s // 48 AS chunk_id, ws[u.s + 1 : u.s + 64] AS chunk
        |      FROM t, unnest(range(0, len(ws), 48)) AS u(s))
        |SELECT doc_id, chunk_id, start_tok,
        |  len(chunk) AS n_tokens,
        |  list_reduce(
        |    list_prepend(7::BIGINT,
        |      [ascii(ch) for ch in string_split(array_to_string(chunk, ' '), '')]),
        |    (acc, ch) -> (acc * 31 + ch) % 1000000007) AS fp,
        |  source
        |FROM c
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "q56_doc_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |c AS (SELECT doc_id, u.s AS start_tok, u.s // 48 AS chunk_id,
        |        ws[u.s + 1 : u.s + 64] AS chunk
        |      FROM t, unnest(range(0, len(ws), 48)) AS u(s))
        |SELECT doc_id, chunk_id, start_tok,
        |  len(chunk) AS n_tokens,
        |  list_reduce(
        |    list_prepend(7::BIGINT,
        |      [ascii(ch) for ch in string_split(array_to_string(chunk, ' '), '')]),
        |    (acc, ch) -> (acc * 31 + ch) % 1000000007) AS fp
        |FROM c
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "q57_pii_scrub" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) +
        |       len(regexp_extract_all(
        |         regexp_replace(text,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |           '<EMAIL>', 'g'),
        |         '[0-9]{6,}')) AS BIGINT)
        |    AS n_redactions,
        |  regexp_replace(
        |    regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{6,}', '<NUM>', 'g') AS scrubbed
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q55_quantized_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |m AS (SELECT vec_id, v,
        |        list_max(list_transform(v, y -> abs(y))) AS mx FROM e),
        |z AS (SELECT vec_id,
        |        CASE WHEN mx > 0
        |          THEN list_transform(v, x -> floor(x * 127 / mx + 0.5))
        |          ELSE list_transform(v, x -> 0.0) END AS qv
        |      FROM m),
        |qq AS (SELECT qv FROM z WHERE vec_id = 0)
        |SELECT z.vec_id,
        |  round(list_dot_product(z.qv, qq.qv) /
        |    (sqrt(list_dot_product(z.qv, z.qv)) *
        |     sqrt(list_dot_product(qq.qv, qq.qv))), 4) AS cosine_q
        |FROM z, qq
        |WHERE z.vec_id <> 0
        |ORDER BY cosine_q DESC, z.vec_id
        |LIMIT 20""".stripMargin,
    "q54_hashed_tf" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |           FROM documents)
        |SELECT doc_id,
        |  list_reduce(
        |    list_prepend(7::BIGINT, [ascii(c) for c in string_split(w, '')]),
        |    (acc, c) -> (acc * 31 + c) % 1000000007) % 64 AS bucket,
        |  count(*) AS tf
        |FROM w
        |WHERE w <> ''
        |GROUP BY doc_id, bucket
        |ORDER BY doc_id, bucket""".stripMargin,
    "q53_topk_agg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(rk AS INTEGER) AS rk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |      FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,
    "q20_hourly_events" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n, round(sum(value), 4) AS total_value
        |FROM events
        |GROUP BY hour_start, event_type
        |ORDER BY hour_start, event_type""".stripMargin,
    // the oracle rebuilds the ENTIRE portable HLL sketch: Karp–Rabin
    // folds for strings, the affine+xorshift mix into [0,1e9+7), the
    // exact-CDF register ranks (bitlength((D-1)//w) over the 244141
    // window), the integer harmonic sum, and the identical float
    // estimate expression (the ln branch was swept bit-identical over
    // its full domain) — the q128/q174 discipline applied to HLL, so
    // the suite's last rows-only query carries a value hash now
    "q21_vocab_sizes" ->
      """WITH base AS (
        |  SELECT 'l_returnflag' AS column_name,
        |    list_reduce(list_prepend(7::BIGINT,
        |      [ascii(ch)::BIGINT for ch in string_split(l_returnflag, '')]),
        |      (acc, ch) -> (acc * 31 + ch) % 1000000007) AS v
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_linestatus',
        |    list_reduce(list_prepend(7::BIGINT,
        |      [ascii(ch)::BIGINT for ch in string_split(l_linestatus, '')]),
        |      (acc, ch) -> (acc * 31 + ch) % 1000000007)
        |  FROM lineitem
        |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
        |  UNION ALL SELECT 'l_orderkey', l_orderkey FROM lineitem),
        |m1 AS (SELECT column_name,
        |         (v % 1000000007) * 2654435761 % 1000000007 AS h
        |       FROM base),
        |m2 AS (SELECT column_name, xor(h, h >> 13) AS h FROM m1),
        |m3 AS (SELECT column_name, h * 1610612741 % 1000000007 AS h
        |       FROM m2),
        |m4 AS (SELECT column_name, xor(h, h >> 11) % 1000000007 AS h
        |       FROM m3),
        |-- NULL inputs hash to NULL and must drop here: the engine's
        |-- HLL sketch skips nulls, and a NULL h would otherwise group
        |-- as its own register row and skew the zeros count
        |d AS (SELECT DISTINCT column_name, h FROM m4
        |      WHERE h IS NOT NULL),
        |r AS (SELECT column_name, h % 4096 AS idx,
        |        CASE WHEN h // 4096 = 0 THEN 19
        |             ELSE length(bin(244140 // (h // 4096))) END AS rank
        |      FROM d),
        |regs AS (SELECT column_name, idx, max(rank) AS mj
        |         FROM r GROUP BY column_name, idx),
        |agg AS (SELECT column_name, count(*) AS nz,
        |          sum(1::BIGINT << (19 - mj)) AS s_present
        |        FROM regs GROUP BY column_name),
        |calc AS (SELECT column_name, 4096 - nz AS zeros,
        |           (0.7213::DOUBLE
        |              / (1.0::DOUBLE + 1.079::DOUBLE / 4096.0::DOUBLE))
        |             * 4096.0::DOUBLE * 4096.0::DOUBLE
        |             / (CAST(s_present
        |                     + (4096 - nz) * (1::BIGINT << 19) AS DOUBLE)
        |                / 524288.0::DOUBLE) AS raw
        |         FROM agg),
        |est AS (SELECT column_name,
        |          CAST(floor(CASE
        |            WHEN raw <= 2.5::DOUBLE * 4096.0::DOUBLE AND zeros > 0
        |            THEN 4096.0::DOUBLE * ln(4096.0::DOUBLE / zeros)
        |            ELSE raw END + 0.5::DOUBLE) AS BIGINT) AS approx_ndv
        |        FROM calc)
        |SELECT column_name, approx_ndv, approx_ndv * 5 AS n_buckets
        |FROM est ORDER BY column_name""".stripMargin,
    "q22_exact_dedup" ->
      """SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY text
        |ORDER BY keep_doc_id""".stripMargin,
    // the oracle REBUILDS the full LSH pipeline: portable polynomial
    // gram hashes (31-base codepoint fold mod 1e9+7), the affine
    // MinHash family ((2i+1)h + i·M mod p), fold band keys, candidate
    // self-join, and exact-Jaccard verification — signatures AND
    // candidate sets replay, not just the verified output
    "q23_minhash_pairs" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(ws) >= 3
        |      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |            for i in range(1, len(ws) - 1)]
        |      ELSE [text] END) AS sh
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
        |        FROM documents)
        |), gh AS MATERIALIZED (
        |  SELECT DISTINCT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(unicode(c) AS BIGINT) for c in string_split(gram, '')]),
        |      (a, x) -> (a * 31 + x) % 1000000007) AS h
        |  FROM (SELECT doc_id, unnest(sh) AS gram FROM d)
        |), hs AS MATERIALIZED (
        |  SELECT doc_id, list(h ORDER BY h) AS hset,
        |    count(*) AS sz
        |  FROM gh GROUP BY doc_id
        |), sg AS MATERIALIZED (
        |  SELECT doc_id, i,
        |    min(((2 * i + 1) * h + (i * 2654435761) % 1000000007)
        |        % 1000000007) AS mv
        |  FROM gh CROSS JOIN (SELECT unnest(range(0, 72)) AS i) f
        |  GROUP BY doc_id, i
        |), sl AS MATERIALIZED (
        |  SELECT doc_id, list(mv ORDER BY i) AS s FROM sg GROUP BY doc_id
        |), bk AS MATERIALIZED (
        |  SELECT doc_id, b,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_slice(s, b * 6 + 1, b * 6 + 6)),
        |      (a, x) -> (a * 2654435761 + x) % 1000000007) AS key
        |  FROM sl CROSS JOIN (SELECT unnest(range(0, 12)) AS b) g
        |), cand AS MATERIALIZED (
        |  SELECT DISTINCT l.doc_id AS ai, r.doc_id AS bi
        |  FROM bk l JOIN bk r
        |    ON l.b = r.b AND l.key = r.key AND l.doc_id < r.doc_id
        |)
        |SELECT ai, bi, jaccard FROM (
        |  SELECT ai, bi,
        |    round(len(list_intersect(a.hset, b.hset))::DOUBLE /
        |      (a.sz + b.sz - len(list_intersect(a.hset, b.hset))),
        |      4) AS jaccard
        |  FROM cand JOIN hs a ON ai = a.doc_id JOIN hs b ON bi = b.doc_id)
        |WHERE jaccard >= 0.8
        |ORDER BY ai, bi""".stripMargin,
    // the oracle REBUILDS the SimHash: 60-bit wide portable gram
    // hashes (h31·2³⁰ + h37), per-bit majority vote, 16-bit band
    // keys, Hamming verification — all in SQL bit arithmetic
    "q24_simhash_pairs" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(ws) >= 3
        |      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |            for i in range(1, len(ws) - 1)]
        |      ELSE [text] END) AS sh
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
        |        FROM documents)
        |), gh AS (
        |  SELECT DISTINCT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(unicode(c) AS BIGINT) for c in string_split(gram, '')]),
        |      (a, x) -> (a * 31 + x) % 1000000007) * 1073741824
        |    + list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      [CAST(unicode(c) AS BIGINT) for c in string_split(gram, '')]),
        |      (a, x) -> (a * 37 + x) % 1000000007) AS h
        |  FROM (SELECT doc_id, unnest(sh) AS gram FROM d)
        |), sig AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
        |             ELSE 0 END) AS BIGINT) AS sig
        |  FROM (
        |    SELECT doc_id, b,
        |      sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |    FROM gh CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bb
        |    GROUP BY doc_id, b)
        |  GROUP BY doc_id
        |), bk AS (
        |  SELECT doc_id, sig, b, (sig >> CAST(b * 16 AS INTEGER)) & 65535 AS key
        |  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bb
        |)
        |SELECT DISTINCT l.doc_id AS ai, r.doc_id AS bi,
        |  CAST(bit_count(xor(l.sig, r.sig)) AS INTEGER) AS hamming
        |FROM bk l JOIN bk r
        |  ON l.b = r.b AND l.key = r.key AND l.doc_id < r.doc_id
        |WHERE bit_count(xor(l.sig, r.sig)) <= 3
        |ORDER BY ai, bi""".stripMargin,
    "q25_ngram_jaccard_pairs" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(ws) >= 3
        |      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |            for i in range(1, len(ws) - 1)]
        |      ELSE [text] END) AS sh,
        |    CAST(floor(n_chars / 32.0) AS BIGINT) AS blk
        |  FROM (SELECT doc_id, text, n_chars,
        |          string_split(text, ' ') AS ws FROM documents)
        |), pairs AS MATERIALIZED (
        |  SELECT a.doc_id AS ai, b.doc_id AS bi,
        |    round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |          4) AS jaccard
        |  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |  UNION ALL
        |  SELECT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id),
        |    round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |          4)
        |  FROM d a JOIN d b ON a.blk + 1 = b.blk
        |)
        |SELECT ai, bi, jaccard FROM pairs
        |WHERE jaccard >= 0.8
        |ORDER BY ai, bi""".stripMargin,
    "q26_cosine_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT v FROM e WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  round(list_dot_product(e.v, q.v) /
        |    (sqrt(list_dot_product(e.v, e.v)) *
        |     sqrt(list_dot_product(q.v, q.v))), 4) AS cosine
        |FROM e, q
        |WHERE e.vec_id <> 0
        |ORDER BY cosine DESC, vec_id
        |LIMIT 20""".stripMargin,
    "q27_embedding_pairs" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS ai, b.vec_id AS bi,
        |  round(list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) *
        |     sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) *
        |     sqrt(list_dot_product(b.v, b.v))), 4) >= 0.4
        |ORDER BY ai, bi""".stripMargin,
    "q50_embedding_pairs_blocked" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS ai, b.vec_id AS bi,
        |  round(list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) *
        |     sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.v, b.v) /
        |    (sqrt(list_dot_product(a.v, a.v)) *
        |     sqrt(list_dot_product(b.v, b.v))), 4) >= 0.4
        |ORDER BY ai, bi""".stripMargin,
    "q51_quality_quartile" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
        |           FROM documents),
        |q AS (SELECT doc_id, lang,
        |  floor((0.4 * least(len(list_filter(ws, w -> w IN ('the', 'a')))::DOUBLE
        |                     / len(ws) * 8, 1.0) +
        |         0.3 * least(len(ws)::DOUBLE / 100, 1.0) +
        |         0.3 * (len(list_distinct(ws))::DOUBLE / len(ws)))
        |        * 10000 + 0.5) / 10000 AS quality
        |  FROM t),
        |c AS (SELECT lang,
        |        floor(quantile_cont(quality, 0.75) * 10000 + 0.5) / 10000
        |          AS lang_q75
        |      FROM q GROUP BY lang)
        |SELECT q.doc_id, q.lang, q.quality, c.lang_q75
        |FROM q JOIN c ON q.lang = c.lang
        |WHERE q.quality >= c.lang_q75
        |ORDER BY q.doc_id""".stripMargin,
    "q52_mixture_sample" ->
      """SELECT doc_id, source, lang,
        |  CAST(CASE
        |    WHEN source IN ('src0','src1','src2','src3','src4') THEN 900
        |    WHEN source IN ('src5','src6','src7','src8','src9') THEN 500
        |    ELSE 200 END AS BIGINT) AS target_permille
        |FROM documents
        |WHERE ((doc_id % 1000000007) * 2654435761) % 1000 < CASE
        |    WHEN source IN ('src0','src1','src2','src3','src4') THEN 900
        |    WHEN source IN ('src5','src6','src7','src8','src9') THEN 500
        |    ELSE 200 END
        |ORDER BY doc_id""".stripMargin,
    "q29_token_stats" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(regexp_extract_all(text,
        |      '[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_word_tokens,
        |  round(length(replace(text, ' ', ''))::DOUBLE /
        |        len(string_split(text, ' ')), 4) AS avg_word_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q30_quality_scores" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ws
        |           FROM documents)
        |SELECT doc_id,
        |  round(len(list_filter(ws, w -> w IN ('the', 'a')))::DOUBLE /
        |        len(ws), 4) AS stopword_ratio,
        |  round(len(list_distinct(ws))::DOUBLE / len(ws), 4)
        |    AS distinct_ratio,
        |  floor((0.4 * least(len(list_filter(ws, w -> w IN ('the', 'a')))::DOUBLE
        |                     / len(ws) * 8, 1.0) +
        |         0.3 * least(len(ws)::DOUBLE / 100, 1.0) +
        |         0.3 * (len(list_distinct(ws))::DOUBLE / len(ws)))
        |        * 10000 + 0.5) / 10000
        |    AS quality
        |FROM t
        |ORDER BY doc_id""".stripMargin,
    // the stopword-profile argmax verbatim: per-language hit counts
    // (with multiplicity) over lowercased whitespace tokens; ties
    // break toward the GREATER language code (fr > es > en > de), CJK
    // codepoints short-circuit to zh, zero hits to 'und'
    "q31_langid" ->
      """WITH d AS (
        |  SELECT doc_id, lang AS labeled_lang, text,
        |    list_transform(string_split(text, ' '), w -> lower(w)) AS ws
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, labeled_lang, text,
        |    len(list_filter(ws, w -> w IN ('the','a','of','and','to',
        |      'in','is','it','that'))) AS sc_en,
        |    len(list_filter(ws, w -> w IN ('der','die','und','das',
        |      'ist','nicht','ein','zu','mit'))) AS sc_de,
        |    len(list_filter(ws, w -> w IN ('le','la','les','et','des',
        |      'est','un','une','dans'))) AS sc_fr,
        |    len(list_filter(ws, w -> w IN ('el','los','de','que','es',
        |      'una','en','por','como'))) AS sc_es
        |  FROM d)
        |SELECT doc_id, labeled_lang,
        |  CASE
        |    WHEN text IS NULL THEN NULL
        |    WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |    WHEN greatest(sc_en, sc_de, sc_fr, sc_es) = 0 THEN 'und'
        |    WHEN sc_fr >= sc_en AND sc_fr >= sc_de AND sc_fr >= sc_es
        |      THEN 'fr'
        |    WHEN sc_es >= sc_en AND sc_es >= sc_de THEN 'es'
        |    WHEN sc_en >= sc_de THEN 'en'
        |    ELSE 'de' END AS predicted_lang
        |FROM s
        |ORDER BY doc_id""".stripMargin,
    "q32_fingerprints" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(7::BIGINT,
        |      [ascii(c) for c in string_split(text, '')]),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q33_media_stats" ->
      """SELECT doc_id AS media_id,
        |  ['image', 'audio', 'video'][(doc_id % 3) + 1] AS media_type,
        |  CAST(octet_length(text::BLOB) AS INTEGER) AS n_bytes,
        |  sha256(text) AS digest,
        |  octet_length(text::BLOB) = n_chars AS meta_consistent
        |FROM documents
        |ORDER BY media_id""".stripMargin,
    "q35_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  round(quantile_cont(l_quantity, 0.95), 4) AS p95_qty,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q36_cube_orders" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS orderstatus,
        |  coalesce(o_orderpriority, '(all)') AS orderpriority,
        |  round(sum(o_totalprice), 2) AS total_price, count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY orderstatus, orderpriority""".stripMargin,
    "q37_orders_by_month" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders
        |GROUP BY month
        |ORDER BY month""".stripMargin,
    "q38_asof_join" ->
      """WITH e AS (SELECT event_id, ts, user_id, event_type, value
        |           FROM events),
        |p AS (SELECT * FROM e WHERE event_type = 'purchase')
        |SELECT e.event_id,
        |  p.event_id AS prev_purchase_id,
        |  p.value AS prev_purchase_value
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts > p.ts
        |ORDER BY e.event_id""".stripMargin,
    "q39_user_sessions" ->
      """WITH x AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, us,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS session_id
        |  FROM x
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  max(us) - min(us) AS duration_us
        |FROM s
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q40_shipping_priority" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |  AND l_shipdate > TIMESTAMP '1999-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q41_systematic_sample" ->
      """SELECT event_id, event_type, value
        |FROM events
        |WHERE (event_id * 2654435761) % 100 < 10
        |ORDER BY event_id""".stripMargin,
    "q42_dedup_decisions" ->
      """WITH RECURSIVE
        |d AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(ws) >= 3
        |      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |            for i in range(1, len(ws) - 1)]
        |      ELSE [text] END) AS sh,
        |    CAST(floor(n_chars / 32.0) AS BIGINT) AS blk
        |  FROM (SELECT doc_id, text, n_chars,
        |          string_split(text, ' ') AS ws FROM documents)
        |), p AS MATERIALIZED (
        |  SELECT ai, bi FROM (
        |    SELECT a.doc_id AS ai, b.doc_id AS bi,
        |      round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |        4) AS jaccard
        |    FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |    UNION ALL
        |    SELECT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id),
        |      round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |        4)
        |    FROM d a JOIN d b ON a.blk + 1 = b.blk
        |  ) WHERE jaccard >= 0.8
        |), edges AS MATERIALIZED (
        |  SELECT ai AS a, bi AS b FROM p UNION ALL SELECT bi, ai FROM p
        |), reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT reach.a, edges.b FROM reach
        |  JOIN edges ON reach.b = edges.a
        |)
        |SELECT a AS doc_id, least(a, min(b)) AS cluster_rep,
        |  a = least(a, min(b)) AS keep
        |FROM reach GROUP BY a
        |ORDER BY doc_id""".stripMargin,
    "q43_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |  coalesce(l_linestatus, '(all)') AS linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q44_string_functions" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_uc,
        |  substr(p_name, 1, 10) AS name_prefix,
        |  replace(p_type, ' ', '_') AS type_snake,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  CAST(length(p_name) AS INTEGER) AS name_len
        |FROM part
        |WHERE p_name LIKE '%a%'
        |ORDER BY p_partkey""".stripMargin,
    "q45_big_spenders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
        |                          FROM orders o2
        |                          WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q46_kept_corpus" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(ws) >= 3
        |      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |            for i in range(1, len(ws) - 1)]
        |      ELSE [text] END) AS sh,
        |    CAST(floor(n_chars / 32.0) AS BIGINT) AS blk
        |  FROM (SELECT doc_id, text, n_chars,
        |          string_split(text, ' ') AS ws FROM documents)
        |), pairs AS MATERIALIZED (
        |  SELECT a.doc_id AS ai, b.doc_id AS bi,
        |    round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |          4) AS jaccard
        |  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |  UNION ALL
        |  SELECT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id),
        |    round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |          4)
        |  FROM d a JOIN d b ON a.blk + 1 = b.blk
        |)
        |SELECT doc_id, lang, source, n_chars
        |FROM documents
        |WHERE doc_id NOT IN (SELECT bi FROM pairs WHERE jaccard >= 0.8)
        |ORDER BY doc_id""".stripMargin,
    "q47_token_packing" ->
      """SELECT pack_id, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM (SELECT doc_id, n_tokens,
        |        CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
        |          / 512.0) AS BIGINT) AS pack_id
        |      FROM (SELECT doc_id,
        |              CAST(len(string_split(text, ' ')) AS BIGINT)
        |                AS n_tokens
        |            FROM documents))
        |GROUP BY pack_id
        |ORDER BY pack_id""".stripMargin,
    "q48_contamination" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) >= 8
        |      THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |            w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' ||
        |            w[i+6] || ' ' || w[i+7]
        |            for i in range(1, len(w) - 6)]
        |      ELSE [text] END) AS sh
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS w
        |        FROM documents)
        |), eval_grams AS (
        |  SELECT DISTINCT unnest(sh) AS gram FROM g WHERE doc_id < 10
        |), train_grams AS (
        |  SELECT doc_id, unnest(sh) AS gram FROM g WHERE doc_id >= 10
        |)
        |SELECT doc_id, count(*) AS n_contaminated_grams
        |FROM train_grams JOIN eval_grams USING (gram)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    // exact because ndv(event_type)=5 <= capacity=8 - the Misra-Gries
    // summary never decrements, so counts equal the true frequencies
    "q49_heavy_hitters" ->
      """SELECT event_type AS value, count(*) AS cnt
        |FROM events
        |GROUP BY event_type
        |ORDER BY cnt DESC, value""".stripMargin,
    // blocking-free brute force — the exact set q60's prefix filter
    // must reproduce (q25's oracle keeps its length-block semantics;
    // this one has none)
    "q60_prefix_jaccard_pairs" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(ws) >= 3
        |      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |            for i in range(1, len(ws) - 1)]
        |      ELSE [text] END) AS sh
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
        |        FROM documents)
        |)
        |SELECT ai, bi, jaccard FROM (
        |  SELECT a.doc_id AS ai, b.doc_id AS bi,
        |    round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |          4) AS jaccard
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id
        |)
        |WHERE jaccard >= 0.8
        |ORDER BY ai, bi""".stripMargin,
    // order by µs time (both engines agree at µs under either fixture
    // ts encoding — see Tables.eventsOnDiskSchema) so a
    // sub-µs difference can't flip the argmin between engines
    "q61_first_events" ->
      """SELECT user_id, event_type,
        |  epoch_us(ts) AS first_ts_us,
        |  event_id AS first_event_id,
        |  value AS first_value
        |FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY user_id, event_type
        |  ORDER BY epoch_us(ts), event_id) = 1
        |ORDER BY user_id, event_type""".stripMargin,
    // q48's oracle verbatim: the bloom prefilter + exact verify is a
    // pure plan transform, not a semantics change
    "q62_bloom_contamination" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(w) >= 8
        |      THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |            w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' ||
        |            w[i+6] || ' ' || w[i+7]
        |            for i in range(1, len(w) - 6)]
        |      ELSE [text] END) AS sh
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS w
        |        FROM documents)
        |), eval_grams AS (
        |  SELECT DISTINCT unnest(sh) AS gram FROM g WHERE doc_id < 10
        |), train_grams AS (
        |  SELECT doc_id, unnest(sh) AS gram FROM g WHERE doc_id >= 10
        |)
        |SELECT doc_id, count(*) AS n_contaminated_grams
        |FROM train_grams JOIN eval_grams USING (gram)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "q63_stratified_sample" ->
      """SELECT lang, doc_id, priority FROM (
        |  SELECT lang, doc_id,
        |    ((doc_id % 1000000007) * 2654435761) % 1000000007 AS priority
        |  FROM documents)
        |QUALIFY row_number() OVER (
        |  PARTITION BY lang ORDER BY priority, doc_id) <= 25
        |ORDER BY lang, priority, doc_id""".stripMargin,
    "q64_unigram_lm" ->
      """WITH w AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents)
        |  WHERE w <> ''),
        |c AS (SELECT w, count(*) AS cnt FROM w GROUP BY w),
        |t AS (SELECT sum(cnt)::DOUBLE AS total FROM c)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(avg(ln(cnt::DOUBLE / total)), 4) AS avg_logprob
        |FROM w JOIN c USING (w), t
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    // the window spelling the distributed counts+prefix-sum plan must
    // reproduce exactly
    "q65_length_cdf" ->
      """SELECT doc_id, n_chars,
        |  round(cume_dist() OVER (ORDER BY n_chars), 4) AS len_cdf
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q66_repetition_stats" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ws
        |           FROM documents),
        |g AS (SELECT doc_id, ws,
        |        CASE WHEN len(ws) >= 2
        |          THEN [ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]
        |          ELSE [text] END AS grams
        |      FROM t),
        |c AS (SELECT doc_id, gm, count(*) AS c
        |      FROM (SELECT doc_id, unnest(grams) AS gm FROM g)
        |      GROUP BY doc_id, gm),
        |m AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM c
        |      GROUP BY doc_id)
        |SELECT g.doc_id AS doc_id,
        |  CASE WHEN ws IS NULL THEN NULL
        |    ELSE round(mx::DOUBLE / tot, 4) END AS top_bigram_frac,
        |  round(1 - len(list_distinct(ws))::DOUBLE / len(ws), 4)
        |    AS dup_token_frac
        |FROM g JOIN m ON g.doc_id = m.doc_id
        |ORDER BY g.doc_id""".stripMargin,
    "q67_incremental_dedup" ->
      """SELECT doc_id, source, lang, n_chars
        |FROM documents i
        |WHERE i.source NOT IN ('src0','src1','src2','src3','src4',
        |                       'src5','src6','src7','src8','src9')
        |  AND NOT EXISTS (
        |    SELECT 1 FROM documents e
        |    WHERE e.source IN ('src0','src1','src2','src3','src4',
        |                       'src5','src6','src7','src8','src9')
        |      AND e.text = i.text)
        |ORDER BY doc_id""".stripMargin,
    "q68_time_window_avg" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
        |  count(*) OVER w AS n_1h,
        |  round(avg(value) OVER w, 4) AS avg_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q69_pivot_events" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  count(*) FILTER (WHERE event_type = 'error') AS n_error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS n_view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q70_dup_spans" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ws
        |           FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(ws) >= 8
        |          THEN [array_to_string(ws[i:i+7], ' ')
        |                for i in range(1, len(ws) - 6)]
        |          ELSE [text] END AS grams
        |      FROM t),
        |s AS (SELECT doc_id, unnest(grams) AS span,
        |             unnest(range(0, len(grams))) AS pos
        |      FROM g),
        |d AS (SELECT span FROM s GROUP BY span
        |      HAVING count(DISTINCT doc_id) >= 2)
        |SELECT s.doc_id AS doc_id, s.pos AS pos
        |FROM s JOIN d USING (span)
        |ORDER BY doc_id, pos""".stripMargin,
    "q71_hashed_tfidf" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |           FROM documents),
        |tf AS (SELECT doc_id,
        |         list_reduce(
        |           list_prepend(7::BIGINT,
        |             [ascii(c) for c in string_split(w, '')]),
        |           (acc, c) -> (acc * 31 + c) % 1000000007) % 64 AS bucket,
        |         count(*) AS tf
        |       FROM w WHERE w <> ''
        |       GROUP BY doc_id, bucket),
        |df AS (SELECT bucket, count(*) AS df FROM tf GROUP BY bucket),
        |n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
        |SELECT doc_id, bucket, tf,
        |  round(tf * ln(n_docs / df), 4) AS tfidf
        |FROM tf JOIN df USING (bucket), n
        |ORDER BY doc_id, bucket""".stripMargin,
    "q72_label_centroids" ->
      """WITH e AS (SELECT label, unnest(embedding) AS v,
        |             unnest(range(0, len(embedding))) AS dim
        |           FROM embeddings),
        |n AS (SELECT label, count(*) AS n_vecs FROM embeddings
        |      GROUP BY label)
        |SELECT e.label AS label, dim, round(avg(v), 4) AS value, n_vecs
        |FROM e JOIN n USING (label)
        |GROUP BY e.label, dim, n_vecs
        |ORDER BY label, dim""".stripMargin,
    "q73_interleave" ->
      """WITH s AS (SELECT source,
        |             row_number() OVER (ORDER BY source) - 1 AS src_idx,
        |             count(*) OVER () AS n_src
        |           FROM (SELECT DISTINCT source FROM documents)),
        |r AS (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY (doc_id % 1000000007) * 2654435761
        |                     % 1000000007, doc_id) - 1 AS rn
        |      FROM documents)
        |SELECT doc_id, r.source AS source,
        |  rn * n_src + src_idx AS interleave_pos
        |FROM r JOIN s ON r.source = s.source
        |ORDER BY interleave_pos""".stripMargin,
    "q74_knn_join" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (
        |  SELECT q.q_id, e.vec_id AS neighbor_id,
        |    round(list_dot_product(e.v, q.qv) /
        |      (sqrt(list_dot_product(e.v, e.v)) *
        |       sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
        |  FROM e, q WHERE e.vec_id <> q.q_id),
        |ranked AS (
        |  SELECT q_id, neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rk
        |  FROM scored)
        |SELECT q_id, neighbor_id, cosine, rk FROM ranked
        |WHERE rk <= 5
        |ORDER BY q_id, rk""".stripMargin,
    "q75_vocab_index" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS term
        |           FROM documents),
        |counts AS (SELECT term, count(*) AS freq FROM w
        |           WHERE term <> '' GROUP BY term)
        |SELECT term,
        |  row_number() OVER (ORDER BY freq DESC, term) AS term_id,
        |  freq
        |FROM counts
        |ORDER BY term_id""".stripMargin,
    "q76_token_ids" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |t AS (SELECT doc_id, unnest(ws) AS term,
        |        unnest(range(0, len(ws))) AS pos
        |      FROM s),
        |counts AS (SELECT term, count(*) AS freq FROM t
        |           WHERE term <> '' GROUP BY term),
        |v AS (SELECT term,
        |        row_number() OVER (ORDER BY freq DESC, term) AS term_id
        |      FROM counts)
        |SELECT t.doc_id, t.pos, v.term_id
        |FROM t JOIN v USING (term)
        |WHERE t.term <> ''
        |ORDER BY doc_id, pos""".stripMargin,
    "q77_semantic_kept" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (SELECT a.vec_id AS ai, b.vec_id AS bi
        |      FROM e a JOIN e b ON a.vec_id < b.vec_id
        |      WHERE round(list_dot_product(a.v, b.v) /
        |        (sqrt(list_dot_product(a.v, a.v)) *
        |         sqrt(list_dot_product(b.v, b.v))), 4) >= 0.4),
        |edges AS (SELECT ai AS a, bi AS b FROM p
        |          UNION ALL SELECT bi, ai FROM p),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT reach.a, edges.b FROM reach
        |  JOIN edges ON reach.b = edges.a)
        |SELECT vec_id, label FROM embeddings
        |WHERE vec_id NOT IN (SELECT a FROM reach WHERE b < a)
        |ORDER BY vec_id""".stripMargin,
    "q78_local_supplier_volume" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q79_temperature_resample" ->
      """WITH counts AS (
        |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |rates AS (
        |  SELECT lang, greatest(1, CAST(round(1000 * sqrt(
        |      (SELECT min(n_docs) FROM counts)::DOUBLE / n_docs))
        |    AS BIGINT)) AS keep_permille
        |  FROM counts)
        |SELECT d.doc_id, d.lang, r.keep_permille
        |FROM documents d JOIN rates r ON d.lang = r.lang
        |WHERE ((d.doc_id % 1000000007) * 2654435761) % 1000
        |      < r.keep_permille
        |ORDER BY d.doc_id""".stripMargin,
    "q80_zorder_manifest" -> {
      // the same 16+16-bit Morton interleave Layout.zorderKey builds
      // as Column arithmetic, generated here as SQL bit terms
      val zx = (0 until 16).map(i => s"(((ck >> $i) & 1) << ${2 * i})")
        .mkString(" + ")
      val zy = (0 until 16).map(i => s"(((day >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""WITH pts AS (
         |  SELECT (o_custkey & 65535) AS ck,
         |    (date_diff('day', DATE '1970-01-01',
         |       CAST(o_orderdate AS DATE)) & 65535) AS day
         |  FROM orders),
         |z AS (SELECT ck, day, ($zx) + ($zy) AS zkey FROM pts)
         |SELECT (zkey >> 18) AS z_bucket, count(*) AS n_rows,
         |  min(ck) AS min_ck, max(ck) AS max_ck,
         |  min(day) AS min_day, max(day) AS max_day
         |FROM z GROUP BY z_bucket ORDER BY z_bucket""".stripMargin
    },
    "q81_attribution" ->
      """SELECT p.user_id, p.event_id,
        |  epoch_us(p.ts) AS ts_us,
        |  round(p.value, 4) AS value,
        |  count(c.ts) AS n_clicks_1h
        |FROM events p LEFT JOIN events c
        |  ON c.event_type = 'click' AND c.user_id = p.user_id
        |  AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 60 MINUTE
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.user_id, p.event_id, p.ts, p.value
        |ORDER BY p.user_id, p.event_id""".stripMargin,
    "q82_small_qty_revenue" ->
      """WITH l AS (
        |  SELECT l_quantity, l_extendedprice,
        |    avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
        |  FROM lineitem)
        |SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
        |  count(*) AS n_small
        |FROM l WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q83_funnel" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS view_ts,
        |    min(CASE WHEN event_type = 'click' THEN ts END) AS click_ts,
        |    min(CASE WHEN event_type = 'purchase' THEN ts END)
        |      AS purchase_ts
        |  FROM events GROUP BY user_id)
        |SELECT count(view_ts) AS n_view,
        |  count(CASE WHEN click_ts >= view_ts THEN 1 END) AS n_view_click,
        |  count(CASE WHEN click_ts >= view_ts
        |    AND purchase_ts >= click_ts THEN 1 END) AS n_full_funnel
        |FROM per_user""".stripMargin,
    "q84_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_totalprice, sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, round(sum(l_quantity), 4) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING round(sum(l_quantity), 4) > 150) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q85_promo_revenue" ->
      """SELECT round(100.0 *
        |  sum(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
        |  sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-02-01'""".stripMargin,
    "q86_disjunctive_revenue" ->
      """SELECT count(*) AS n_lines,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#4' AND l_quantity BETWEEN 1 AND 11
        |       AND p_size BETWEEN 1 AND 5)
        |   OR (p_brand = 'Brand#19' AND l_quantity BETWEEN 10 AND 20
        |       AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 20 AND 30
        |       AND p_size BETWEEN 1 AND 15)""".stripMargin,
    "q87_idle_rich_customers" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS total_bal
        |FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q88_priority_waiting" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 240 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q89_contamination_rate" ->
      """WITH g AS (
        |  SELECT doc_id, source,
        |    list_distinct(CASE WHEN len(w) >= 8
        |      THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
        |            w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' ||
        |            w[i+6] || ' ' || w[i+7]
        |            for i in range(1, len(w) - 6)]
        |      ELSE [text] END) AS sh
        |  FROM (SELECT doc_id, source, text, string_split(text, ' ') AS w
        |        FROM documents)
        |), eval_grams AS (
        |  SELECT DISTINCT unnest(sh) AS gram FROM g WHERE doc_id < 10
        |), hits AS (
        |  SELECT DISTINCT t.doc_id
        |  FROM (SELECT doc_id, unnest(sh) AS gram FROM g
        |        WHERE doc_id >= 10) t
        |  JOIN eval_grams USING (gram)
        |)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN hits.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_contaminated,
        |  round(CAST(sum(CASE WHEN hits.doc_id IS NOT NULL THEN 1 ELSE 0
        |    END) AS DOUBLE) / count(*), 4) AS rate
        |FROM g LEFT JOIN hits USING (doc_id)
        |WHERE g.doc_id >= 10
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    "q90_quality_gate" ->
      """WITH s AS (
        |  SELECT source,
        |    len(ws) AS nt,
        |    len(list_distinct(ws))::DOUBLE / len(ws) AS dr,
        |    floor((0.4 * least(len(list_filter(ws, w -> w IN ('the', 'a')))
        |             ::DOUBLE / len(ws) * 8, 1.0) +
        |           0.3 * least(len(ws)::DOUBLE / 100, 1.0) +
        |           0.3 * (len(list_distinct(ws))::DOUBLE / len(ws)))
        |          * 10000 + 0.5) / 10000 AS q
        |  FROM (SELECT source, string_split(text, ' ') AS ws FROM documents)
        |)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN nt < 20 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_too_short,
        |  CAST(sum(CASE WHEN q < 0.35 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low_quality,
        |  CAST(sum(CASE WHEN dr < 0.33 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_repetitive,
        |  CAST(sum(CASE WHEN nt >= 20 AND q >= 0.35 AND dr >= 0.33
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM s
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    "q91_bpe_merges" ->
      """WITH t AS (
        |  SELECT string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2
        |), pairs AS (
        |  SELECT unnest([w[i] || ' ' || w[i+1]
        |                 for i in range(1, len(w))]) AS pair
        |  FROM t
        |)
        |SELECT pair, count(*) AS n
        |FROM pairs
        |GROUP BY pair
        |ORDER BY n DESC, pair
        |LIMIT 20""".stripMargin,
    "q92_cluster_sizes" ->
      """WITH RECURSIVE
        |d AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(ws) >= 3
        |      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |            for i in range(1, len(ws) - 1)]
        |      ELSE [text] END) AS sh,
        |    CAST(floor(n_chars / 32.0) AS BIGINT) AS blk
        |  FROM (SELECT doc_id, text, n_chars,
        |          string_split(text, ' ') AS ws FROM documents)
        |), p AS MATERIALIZED (
        |  SELECT ai, bi FROM (
        |    SELECT a.doc_id AS ai, b.doc_id AS bi,
        |      round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |        4) AS jaccard
        |    FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |    UNION ALL
        |    SELECT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id),
        |      round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |        4)
        |    FROM d a JOIN d b ON a.blk + 1 = b.blk
        |  ) WHERE jaccard >= 0.8
        |), edges AS MATERIALIZED (
        |  SELECT ai AS a, bi AS b FROM p UNION ALL SELECT bi, ai FROM p
        |), reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT reach.a, edges.b FROM reach
        |  JOIN edges ON reach.b = edges.a
        |), rep AS MATERIALIZED (
        |  SELECT a AS doc_id, least(a, min(b)) AS cluster_rep
        |  FROM reach GROUP BY a
        |), sizes AS MATERIALIZED (
        |  SELECT cluster_rep, count(*) AS cluster_size FROM rep
        |  GROUP BY cluster_rep
        |)
        |SELECT cluster_size, count(*) AS n_clusters
        |FROM sizes
        |GROUP BY cluster_size
        |ORDER BY cluster_size""".stripMargin,
    "q93_source_caps" ->
      """WITH s AS (
        |  SELECT source, doc_id,
        |    floor((0.4 * least(len(list_filter(ws, w -> w IN ('the', 'a')))
        |             ::DOUBLE / len(ws) * 8, 1.0) +
        |           0.3 * least(len(ws)::DOUBLE / 100, 1.0) +
        |           0.3 * (len(list_distinct(ws))::DOUBLE / len(ws)))
        |          * 10000 + 0.5) / 10000 AS quality
        |  FROM (SELECT source, doc_id, string_split(text, ' ') AS ws
        |        FROM documents)
        |)
        |SELECT source, doc_id, quality,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY quality DESC, doc_id) AS INTEGER) AS rk
        |FROM s
        |QUALIFY rk <= 10
        |ORDER BY source, rk""".stripMargin,
    "q94_merge_manifest" ->
      """WITH e AS (
        |  SELECT sha256(text) AS content_hash, min(doc_id) AS old_id,
        |    count(*) AS old_copies
        |  FROM documents
        |  WHERE source IN ('src0','src1','src2','src3','src4',
        |                   'src5','src6','src7','src8','src9')
        |  GROUP BY 1
        |), b AS (
        |  SELECT sha256(text) AS content_hash, min(doc_id) AS new_id,
        |    count(*) AS new_copies
        |  FROM documents
        |  WHERE source NOT IN ('src0','src1','src2','src3','src4',
        |                       'src5','src6','src7','src8','src9')
        |  GROUP BY 1
        |)
        |SELECT coalesce(old_id, new_id) AS canonical_id,
        |  CASE WHEN new_id IS NULL THEN 'keep'
        |       WHEN old_id IS NULL THEN 'insert'
        |       ELSE 'update' END AS action,
        |  CAST(coalesce(old_copies, 0) + coalesce(new_copies, 0)
        |       AS BIGINT) AS n_copies
        |FROM e FULL JOIN b USING (content_hash)
        |ORDER BY canonical_id""".stripMargin,
    "q95_window_suite" ->
      """SELECT user_id, event_id, value,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  round(percent_rank() OVER w, 4) AS pct_rank,
        |  round(cume_dist() OVER w, 4) AS cdist,
        |  lead(value, 1) OVER w AS next_value,
        |  first_value(value) OVER wf AS first_value,
        |  nth_value(value, 3) OVER wf AS third_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id),
        |  wf AS (PARTITION BY user_id ORDER BY event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING
        |         AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,
    // same interpolation semantics as q35's oracle, over the
    // bounded-NDV measures the operator targets (see Percentiles
    // crossover note); the price path is spec-tested
    "q96_percentiles_distributed" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  round(quantile_cont(l_quantity, 0.95), 4) AS p95_qty,
        |  round(quantile_cont(l_discount, 0.5), 4) AS p50_disc
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q97_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2)
        |    AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
        |    AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q98_cohort_retention" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('week', ts) AS w FROM events
        |), cohorts AS (
        |  SELECT user_id, min(w) AS cohort FROM ev GROUP BY user_id
        |), activity AS (
        |  SELECT DISTINCT user_id, w FROM ev
        |)
        |SELECT cohort,
        |  CAST(datediff('day', cohort, w) / 7 AS INTEGER) AS week_offset,
        |  count(*) AS n_active
        |FROM activity JOIN cohorts USING (user_id)
        |GROUP BY cohort, week_offset
        |ORDER BY cohort, week_offset""".stripMargin,
    "q99_corpus_admission" ->
      """WITH s AS (
        |  SELECT doc_id, lang, source, n_chars, sha256(text) AS h,
        |    len(ws) AS nt,
        |    len(list_distinct(ws))::DOUBLE / len(ws) AS dr,
        |    floor((0.4 * least(len(list_filter(ws, w -> w IN ('the', 'a')))
        |             ::DOUBLE / len(ws) * 8, 1.0) +
        |           0.3 * least(len(ws)::DOUBLE / 100, 1.0) +
        |           0.3 * (len(list_distinct(ws))::DOUBLE / len(ws)))
        |          * 10000 + 0.5) / 10000 AS q
        |  FROM (SELECT doc_id, lang, source, n_chars, text,
        |          string_split(text, ' ') AS ws FROM documents)
        |)
        |SELECT doc_id, lang, source, n_chars
        |FROM s
        |WHERE nt >= 20 AND q >= 0.35 AND dr >= 0.33
        |QUALIFY row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1
        |ORDER BY doc_id""".stripMargin,
    "q100_training_mix" ->
      """WITH s AS (
        |  SELECT doc_id, lang, sha256(text) AS h,
        |    CAST(len(ws) AS BIGINT) AS nt,
        |    len(list_distinct(ws))::DOUBLE / len(ws) AS dr,
        |    floor((0.4 * least(len(list_filter(ws, w -> w IN ('the', 'a')))
        |             ::DOUBLE / len(ws) * 8, 1.0) +
        |           0.3 * least(len(ws)::DOUBLE / 100, 1.0) +
        |           0.3 * (len(list_distinct(ws))::DOUBLE / len(ws)))
        |          * 10000 + 0.5) / 10000 AS q
        |  FROM (SELECT doc_id, lang, text,
        |          string_split(text, ' ') AS ws FROM documents)
        |), admitted AS (
        |  SELECT doc_id, lang, nt FROM s
        |  WHERE nt >= 20 AND q >= 0.35 AND dr >= 0.33
        |  QUALIFY row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1
        |), counts AS (
        |  SELECT lang, count(*) AS n_docs FROM admitted GROUP BY lang
        |), rates AS (
        |  SELECT lang, greatest(1, CAST(round(1000 * sqrt(
        |      (SELECT min(n_docs) FROM counts)::DOUBLE / n_docs))
        |    AS BIGINT)) AS keep_permille
        |  FROM counts
        |), accepted AS (
        |  SELECT a.doc_id, a.nt
        |  FROM admitted a JOIN rates r USING (lang)
        |  WHERE ((a.doc_id % 1000000007) * 2654435761) % 1000
        |        < r.keep_permille
        |), packed AS (
        |  SELECT doc_id, nt,
        |    CAST(floor((sum(nt) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
        |      / 512.0) AS BIGINT) AS pack_id
        |  FROM accepted
        |)
        |SELECT pack_id, count(*) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS pack_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM packed
        |GROUP BY pack_id
        |ORDER BY pack_id""".stripMargin,
    // replays the audio SYNTHESIS (first 256 text chars → 16-bit PCM
    // via s = ascii·256 − 32768) as integer aggregates — Spark's side
    // parses the actual RIFF/WAVE bytes, so the two agree only if the
    // chunk walk, little-endian reads, and sign extension are right
    "q34_media_features" ->
      """SELECT doc_id AS media_id,
        |  8000 + (doc_id % 3) * 4000 AS sample_rate,
        |  CAST(len(t) AS BIGINT) AS n_samples,
        |  CAST(list_aggregate(
        |    [ascii(substr(t, i, 1)) * 256 - 32768
        |     for i in range(1, len(t) + 1)], 'sum') AS BIGINT)
        |    AS sum_samples,
        |  CAST(list_aggregate(
        |    [abs(ascii(substr(t, i, 1)) * 256 - 32768)
        |     for i in range(1, len(t) + 1)], 'max') AS BIGINT)
        |    AS peak_abs
        |FROM (SELECT doc_id, substr(text, 1, 256) AS t
        |      FROM documents WHERE doc_id % 3 = 1 AND len(text) >= 1)
        |ORDER BY media_id""".stripMargin,
    // replays the image SYNTHESIS (pad/truncate text to the 8×8 RGB
    // raster) and averages each channel stride — Spark's side parses
    // the actual PPM bytes, so the two agree only if the decoder
    // reads the header and strides the raster correctly
    "q101_image_decode" ->
      """SELECT doc_id AS media_id, 8 AS width, 8 AS height,
        |  round(list_aggregate(
        |    [ascii(substr(p, 3*i+1, 1)) for i in range(0, 64)],
        |    'avg'), 4) AS mean_r,
        |  round(list_aggregate(
        |    [ascii(substr(p, 3*i+2, 1)) for i in range(0, 64)],
        |    'avg'), 4) AS mean_g,
        |  round(list_aggregate(
        |    [ascii(substr(p, 3*i+3, 1)) for i in range(0, 64)],
        |    'avg'), 4) AS mean_b
        |FROM (SELECT doc_id, rpad(substr(text, 1, 192), 192, ' ') AS p
        |      FROM documents WHERE doc_id % 3 = 0)
        |ORDER BY media_id""".stripMargin,
    "q102_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON supplier.s_nationkey = n1.n_nationkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON customer.c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_19')
        |   OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_3')
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    "q103_market_share" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  round(sum(CASE WHEN n1.n_name = 'NATION_3'
        |                 THEN l_extendedprice * (1 - l_discount)
        |                 ELSE 0.0 END) /
        |        sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON supplier.s_nationkey = n1.n_nationkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON customer.c_nationkey = n2.n_nationkey
        |JOIN region ON n2.n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q104_product_profit" ->
      """SELECT n_name AS nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS o_year,
        |  round(sum(l_extendedprice * (1 - l_discount)
        |            - 0.5 * p_retailprice * l_quantity), 2) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2
        |ORDER BY nation ASC, o_year DESC""".stripMargin,
    "q105_returned_items" ->
      """SELECT c_custkey, c_name, n_name, c_acctbal,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "q106_order_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q107_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice * (1 - l_discount)
        |             AS DECIMAL(18,6))) AS rev_exact
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey
        |)
        |SELECT s_suppkey, s_name,
        |  CAST(round(rev_exact, 2) AS DOUBLE) AS total_revenue
        |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_exact = (SELECT max(rev_exact) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q108_recordstream" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_chars
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    "q109_sliding_windows" ->
      """WITH slid AS (
        |  SELECT date_trunc('hour', ts) AS win_start, event_type, value
        |  FROM events
        |  UNION ALL
        |  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR, event_type,
        |    value
        |  FROM events
        |)
        |SELECT win_start, event_type, count(*) AS n,
        |  round(sum(value), 4) AS total_value
        |FROM slid
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,
    "q110_pack_contents" ->
      """SELECT pack_id, count(*) AS n_docs,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
        |    AS doc_ids
        |FROM (SELECT doc_id, n_tokens,
        |        CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
        |          / 512.0) AS BIGINT) AS pack_id
        |      FROM (SELECT doc_id,
        |              CAST(len(string_split(text, ' ')) AS BIGINT)
        |                AS n_tokens
        |            FROM documents))
        |GROUP BY pack_id
        |ORDER BY pack_id""".stripMargin,
    "q111_cheapest_shipment" ->
      """WITH li AS (
        |  SELECT l_partkey, l_suppkey,
        |    l_extendedprice / l_quantity AS unit_price
        |  FROM lineitem
        |), m AS (
        |  SELECT l_partkey AS m_partkey, min(unit_price) AS min_price
        |  FROM li GROUP BY 1
        |)
        |SELECT p_partkey, p_name,
        |  CAST(round(CAST(min_price AS DECIMAL(18,6)), 4) AS DOUBLE)
        |    AS min_unit_price,
        |  count(*) AS n_min_lines, min(l_suppkey) AS min_suppkey
        |FROM li
        |JOIN m ON l_partkey = m_partkey AND unit_price = min_price
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_size <= 5
        |GROUP BY 1, 2, 3
        |ORDER BY p_partkey""".stripMargin,
    "q112_session_windows" ->
      """WITH x AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
        |             >= 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s AS (
        |  SELECT user_id, us,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS sid
        |  FROM x
        |)
        |SELECT user_id, min(us) AS start_us,
        |  max(us) + 1800000000 AS end_us, count(*) AS n_events
        |FROM s
        |GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin,
    "q113_event_transitions" ->
      """WITH x AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |)
        |SELECT prev_type, event_type AS next_type,
        |  count(*) AS n_transitions
        |FROM x
        |WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q114_length_buckets" ->
      """SELECT bucket_len, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(bucket_len * count(*) - sum(n_tokens) AS BIGINT)
        |    AS pad_waste
        |FROM (SELECT n_tokens,
        |        least(2048, CAST(ceil(n_tokens / 64.0) * 64 AS BIGINT))
        |          AS bucket_len
        |      FROM (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
        |              AS n_tokens
        |            FROM documents))
        |GROUP BY bucket_len
        |ORDER BY bucket_len""".stripMargin,
    "q115_monthly_spine" ->
      """WITH RECURSIVE months(m) AS (
        |  SELECT TIMESTAMP '1995-01-01'
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH FROM months
        |  WHERE m < TIMESTAMP '2001-08-01'
        |)
        |SELECT m AS month_start,
        |  count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0), 2) AS total_price
        |FROM months LEFT JOIN orders
        |  ON date_trunc('month', o_orderdate) = m
        |GROUP BY m
        |ORDER BY m""".stripMargin,
    "q116_top_order_lateral" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer,
        |LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 1
        |)
        |ORDER BY c_custkey""".stripMargin,
    "q117_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q118_late_line_priority" ->
      """SELECT l_linestatus,
        |  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |        THEN 1 END) AS high_line_count,
        |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |        THEN 1 END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 100 DAY
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "q119_waiting_supplier" ->
      """SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 100 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 100 DAY)
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 50""".stripMargin,
    // Lloyd k-means, 3 iterations unrolled: each aN assigns under the
    // previous centroids (squared-L2, (dist, cid) tie-break), each mN
    // recomputes per-dimension means rounded to 6 dp (the same quantum
    // the Spark side rounds at, so both engines walk one trajectory),
    // each cN keeps the previous centroid for an empty cluster.
    "q120_lloyd_clusters" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c0 AS (SELECT CAST(vec_id AS INT) AS cid,
        |         list_transform(v, x -> round(x, 6)) AS c
        |       FROM e WHERE vec_id < 8),
        |a1 AS (SELECT vec_id, v, cid FROM (
        |         SELECT e.vec_id, e.v, c0.cid,
        |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |             list_dot_product(e.v, e.v)
        |               - 2 * list_dot_product(e.v, c0.c)
        |               + list_dot_product(c0.c, c0.c), c0.cid) AS rn
        |         FROM e CROSS JOIN c0)
        |       WHERE rn = 1),
        |m1 AS (SELECT cid, pos, round(avg(x), 6) AS m FROM (
        |         SELECT cid, unnest(v) AS x,
        |           unnest(range(1, len(v) + 1)) AS pos
        |         FROM a1)
        |       GROUP BY cid, pos),
        |c1 AS (SELECT c0.cid, coalesce(l.c, c0.c) AS c
        |       FROM c0 LEFT JOIN (SELECT cid, list(m ORDER BY pos) AS c
        |                          FROM m1 GROUP BY cid) l USING (cid)),
        |a2 AS (SELECT vec_id, v, cid FROM (
        |         SELECT e.vec_id, e.v, c1.cid,
        |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |             list_dot_product(e.v, e.v)
        |               - 2 * list_dot_product(e.v, c1.c)
        |               + list_dot_product(c1.c, c1.c), c1.cid) AS rn
        |         FROM e CROSS JOIN c1)
        |       WHERE rn = 1),
        |m2 AS (SELECT cid, pos, round(avg(x), 6) AS m FROM (
        |         SELECT cid, unnest(v) AS x,
        |           unnest(range(1, len(v) + 1)) AS pos
        |         FROM a2)
        |       GROUP BY cid, pos),
        |c2 AS (SELECT c1.cid, coalesce(l.c, c1.c) AS c
        |       FROM c1 LEFT JOIN (SELECT cid, list(m ORDER BY pos) AS c
        |                          FROM m2 GROUP BY cid) l USING (cid)),
        |a3 AS (SELECT vec_id, v, cid FROM (
        |         SELECT e.vec_id, e.v, c2.cid,
        |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |             list_dot_product(e.v, e.v)
        |               - 2 * list_dot_product(e.v, c2.c)
        |               + list_dot_product(c2.c, c2.c), c2.cid) AS rn
        |         FROM e CROSS JOIN c2)
        |       WHERE rn = 1),
        |m3 AS (SELECT cid, pos, round(avg(x), 6) AS m FROM (
        |         SELECT cid, unnest(v) AS x,
        |           unnest(range(1, len(v) + 1)) AS pos
        |         FROM a3)
        |       GROUP BY cid, pos),
        |c3 AS (SELECT c2.cid, coalesce(l.c, c2.c) AS c
        |       FROM c2 LEFT JOIN (SELECT cid, list(m ORDER BY pos) AS c
        |                          FROM m3 GROUP BY cid) l USING (cid)),
        |af AS (SELECT vec_id, cid FROM (
        |         SELECT e.vec_id, c3.cid,
        |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |             list_dot_product(e.v, e.v)
        |               - 2 * list_dot_product(e.v, c3.c)
        |               + list_dot_product(c3.c, c3.c), c3.cid) AS rn
        |         FROM e CROSS JOIN c3)
        |       WHERE rn = 1),
        |n3 AS (SELECT cid, round(sqrt(list_dot_product(c, c)), 4)
        |         AS centroid_norm FROM c3)
        |SELECT af.cid AS cluster_id, count(*) AS n_vecs, n3.centroid_norm
        |FROM af JOIN n3 ON af.cid = n3.cid
        |GROUP BY af.cid, n3.centroid_norm
        |ORDER BY cluster_id""".stripMargin,
    // q120's unrolled Lloyd trajectory at k=16 feeding the IVF probe:
    // rank cells by centroid cosine rounded to 6 dp (cid tie-break),
    // probe the best 8, exact 4 dp cosine top-20 within probed cells
    "q28_ivf_topk" ->
      """WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS MATERIALIZED (SELECT v AS qv FROM e WHERE vec_id = 0),
        |c0 AS MATERIALIZED (SELECT CAST(vec_id AS INT) AS cid,
        |         list_transform(v, x -> round(x, 6)) AS c
        |       FROM e WHERE vec_id < 16),
        |a1 AS MATERIALIZED (SELECT vec_id, v, cid FROM (
        |         SELECT e.vec_id, e.v, c0.cid,
        |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |             list_dot_product(e.v, e.v)
        |               - 2 * list_dot_product(e.v, c0.c)
        |               + list_dot_product(c0.c, c0.c), c0.cid) AS rn
        |         FROM e CROSS JOIN c0)
        |       WHERE rn = 1),
        |m1 AS MATERIALIZED (SELECT cid, pos, round(avg(x), 6) AS m FROM (
        |         SELECT cid, unnest(v) AS x,
        |           unnest(range(1, len(v) + 1)) AS pos
        |         FROM a1)
        |       GROUP BY cid, pos),
        |c1 AS MATERIALIZED (SELECT c0.cid, coalesce(l.c, c0.c) AS c
        |       FROM c0 LEFT JOIN (SELECT cid, list(m ORDER BY pos) AS c
        |                          FROM m1 GROUP BY cid) l USING (cid)),
        |a2 AS MATERIALIZED (SELECT vec_id, v, cid FROM (
        |         SELECT e.vec_id, e.v, c1.cid,
        |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |             list_dot_product(e.v, e.v)
        |               - 2 * list_dot_product(e.v, c1.c)
        |               + list_dot_product(c1.c, c1.c), c1.cid) AS rn
        |         FROM e CROSS JOIN c1)
        |       WHERE rn = 1),
        |m2 AS MATERIALIZED (SELECT cid, pos, round(avg(x), 6) AS m FROM (
        |         SELECT cid, unnest(v) AS x,
        |           unnest(range(1, len(v) + 1)) AS pos
        |         FROM a2)
        |       GROUP BY cid, pos),
        |c2 AS MATERIALIZED (SELECT c1.cid, coalesce(l.c, c1.c) AS c
        |       FROM c1 LEFT JOIN (SELECT cid, list(m ORDER BY pos) AS c
        |                          FROM m2 GROUP BY cid) l USING (cid)),
        |a3 AS MATERIALIZED (SELECT vec_id, v, cid FROM (
        |         SELECT e.vec_id, e.v, c2.cid,
        |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |             list_dot_product(e.v, e.v)
        |               - 2 * list_dot_product(e.v, c2.c)
        |               + list_dot_product(c2.c, c2.c), c2.cid) AS rn
        |         FROM e CROSS JOIN c2)
        |       WHERE rn = 1),
        |m3 AS MATERIALIZED (SELECT cid, pos, round(avg(x), 6) AS m FROM (
        |         SELECT cid, unnest(v) AS x,
        |           unnest(range(1, len(v) + 1)) AS pos
        |         FROM a3)
        |       GROUP BY cid, pos),
        |c3 AS MATERIALIZED (SELECT c2.cid, coalesce(l.c, c2.c) AS c
        |       FROM c2 LEFT JOIN (SELECT cid, list(m ORDER BY pos) AS c
        |                          FROM m3 GROUP BY cid) l USING (cid)),
        |af AS MATERIALIZED (SELECT vec_id, cid FROM (
        |         SELECT e.vec_id, c3.cid,
        |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |             list_dot_product(e.v, e.v)
        |               - 2 * list_dot_product(e.v, c3.c)
        |               + list_dot_product(c3.c, c3.c), c3.cid) AS rn
        |         FROM e CROSS JOIN c3)
        |       WHERE rn = 1),
        |pr AS MATERIALIZED (SELECT cid FROM (
        |         SELECT c3.cid,
        |           round(list_dot_product(c3.c, q.qv) /
        |             (sqrt(list_dot_product(c3.c, c3.c)) *
        |              sqrt(list_dot_product(q.qv, q.qv))), 6) AS pc
        |         FROM c3 CROSS JOIN q)
        |       ORDER BY pc DESC, cid LIMIT 8)
        |SELECT vec_id, cosine FROM (
        |  SELECT e.vec_id,
        |    round(list_dot_product(e.v, q.qv) /
        |      (sqrt(list_dot_product(e.v, e.v)) *
        |       sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
        |  FROM e CROSS JOIN q JOIN af ON e.vec_id = af.vec_id
        |  WHERE af.cid IN (SELECT cid FROM pr) AND e.vec_id <> 0)
        |ORDER BY cosine DESC, vec_id
        |LIMIT 20""".stripMargin,
    "q121_part_supplier_counts" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier
        |     WHERE s_acctbal < 1000 AND s_suppkey IS NOT NULL)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q122_dominant_suppliers" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM (
        |    SELECT l_partkey, l_suppkey,
        |      sum(CAST(l_quantity AS DECIMAL(20,4))) AS qty,
        |      sum(sum(CAST(l_quantity AS DECIMAL(20,4))))
        |        OVER (PARTITION BY l_partkey) AS total
        |    FROM lineitem JOIN part ON l_partkey = p_partkey
        |    WHERE p_name LIKE 'large%'
        |      AND l_shipdate >= TIMESTAMP '1996-01-01'
        |      AND l_shipdate < TIMESTAMP '1997-01-01'
        |    GROUP BY l_partkey, l_suppkey)
        |  WHERE qty > 0.5 * total)
        |ORDER BY s_name""".stripMargin,
    "q123_embedding_clusters" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS ai, b.vec_id AS bi
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) *
        |       sqrt(list_dot_product(b.v, b.v))), 4) >= 0.4
        |), edges AS (
        |  SELECT ai AS a, bi AS b FROM p UNION ALL SELECT bi, ai FROM p
        |), reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT reach.a, edges.b FROM reach
        |  JOIN edges ON reach.b = edges.a
        |)
        |SELECT a AS vec_id, least(a, min(b)) AS cluster_rep,
        |  a = least(a, min(b)) AS keep
        |FROM reach GROUP BY a
        |ORDER BY vec_id""".stripMargin,
    // 3 GD iterations unrolled: gN averages the per-dimension gradient
    // under the previous weights (rounded 6 dp — the shared trajectory
    // quantum), wN applies the identical IEEE w − g update; iteration
    // 1's sigmoid is exactly 0.5 in every engine (w0 = 0).
    "q124_logreg_gd" ->
      """WITH e AS (SELECT vec_id,
        |             list_prepend(1.0, embedding::DOUBLE[]) AS x,
        |             CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y
        |           FROM embeddings),
        |g1 AS (SELECT pos, round(avg(xj * (0.5 - y)), 6) AS g
        |       FROM (SELECT unnest(x) AS xj,
        |               unnest(range(1, len(x) + 1)) AS pos, y FROM e)
        |       GROUP BY pos),
        |w1 AS (SELECT list(0.0 - g ORDER BY pos) AS w FROM g1),
        |r2 AS (SELECT x, y,
        |         1/(1 + exp(-list_dot_product(x, (SELECT w FROM w1)))) - y
        |           AS r FROM e),
        |g2 AS (SELECT pos, round(avg(xj * r), 6) AS g
        |       FROM (SELECT unnest(x) AS xj,
        |               unnest(range(1, len(x) + 1)) AS pos, r FROM r2)
        |       GROUP BY pos),
        |w2 AS (SELECT list(wv - g ORDER BY pos) AS w
        |       FROM (SELECT unnest(w) AS wv,
        |               unnest(range(1, len(w) + 1)) AS pos FROM w1)
        |       JOIN g2 USING (pos)),
        |r3 AS (SELECT x, y,
        |         1/(1 + exp(-list_dot_product(x, (SELECT w FROM w2)))) - y
        |           AS r FROM e),
        |g3 AS (SELECT pos, round(avg(xj * r), 6) AS g
        |       FROM (SELECT unnest(x) AS xj,
        |               unnest(range(1, len(x) + 1)) AS pos, r FROM r3)
        |       GROUP BY pos),
        |w3 AS (SELECT list(wv - g ORDER BY pos) AS w
        |       FROM (SELECT unnest(w) AS wv,
        |               unnest(range(1, len(w) + 1)) AS pos FROM w2)
        |       JOIN g3 USING (pos))
        |SELECT y, CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS pred,
        |  count(*) AS n, round(avg(p), 4) AS avg_p
        |FROM (SELECT y,
        |        1/(1 + exp(-list_dot_product(x, (SELECT w FROM w3))))
        |          AS p FROM e)
        |GROUP BY y, pred
        |ORDER BY y, pred""".stripMargin,
    // 3 power iterations unrolled: uN = Σ c·(c·v) per dimension under
    // the previous iterate, vN = round(uN/‖uN‖, 6) — the same 6 dp
    // trajectory quantum the Spark side rounds at; the mean vector
    // centers both engines identically.
    "q125_pca_projection" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x, label
        |           FROM embeddings),
        |m AS (SELECT list(mu ORDER BY pos) AS m FROM (
        |        SELECT pos, round(avg(xj), 6) AS mu
        |        FROM (SELECT unnest(x) AS xj,
        |                unnest(range(1, len(x) + 1)) AS pos FROM e)
        |        GROUP BY pos)),
        |d AS (SELECT vec_id, label,
        |        list_transform(list_zip(x, m.m), t -> t[1] - t[2]) AS c
        |      FROM e, m),
        |v0 AS (SELECT list_transform(m, y -> round(1/sqrt(len(m)), 6))
        |         AS v FROM m),
        |u1 AS (SELECT pos, sum(cj * s) AS u FROM (
        |         SELECT unnest(c) AS cj,
        |           unnest(range(1, len(c) + 1)) AS pos,
        |           list_dot_product(d.c, v0.v) AS s
        |         FROM d, v0)
        |       GROUP BY pos),
        |v1 AS (SELECT list(round(u / nrm, 6) ORDER BY pos) AS v
        |       FROM u1, (SELECT sqrt(sum(u*u)) AS nrm FROM u1)),
        |u2 AS (SELECT pos, sum(cj * s) AS u FROM (
        |         SELECT unnest(c) AS cj,
        |           unnest(range(1, len(c) + 1)) AS pos,
        |           list_dot_product(d.c, v1.v) AS s
        |         FROM d, v1)
        |       GROUP BY pos),
        |v2 AS (SELECT list(round(u / nrm, 6) ORDER BY pos) AS v
        |       FROM u2, (SELECT sqrt(sum(u*u)) AS nrm FROM u2)),
        |u3 AS (SELECT pos, sum(cj * s) AS u FROM (
        |         SELECT unnest(c) AS cj,
        |           unnest(range(1, len(c) + 1)) AS pos,
        |           list_dot_product(d.c, v2.v) AS s
        |         FROM d, v2)
        |       GROUP BY pos),
        |v3 AS (SELECT list(round(u / nrm, 6) ORDER BY pos) AS v
        |       FROM u3, (SELECT sqrt(sum(u*u)) AS nrm FROM u3))
        |SELECT label, count(*) AS n,
        |  round(avg(p), 4) AS avg_proj,
        |  round(avg(p*p), 4) AS avg_proj_sq
        |FROM (SELECT d.label, list_dot_product(d.c, v3.v) AS p
        |      FROM d, v3)
        |GROUP BY label
        |ORDER BY label""".stripMargin,
    // multinomial NB with Laplace α=1; scores round to 6 dp (top-2
    // margin ~3e-3 ≫ ln noise); ties break (score DESC, lang ASC)
    "q126_naive_bayes" ->
      """WITH t AS (SELECT doc_id, lang, w FROM (
        |             SELECT doc_id, lang,
        |               unnest(string_split(text, ' ')) AS w
        |             FROM documents) WHERE w <> ''),
        |pri AS (SELECT lang,
        |          ln(count(*) /
        |             (SELECT count(*)::DOUBLE FROM documents)) AS lp
        |        FROM documents GROUP BY lang),
        |ntok AS (SELECT lang, count(*) AS ntok FROM t GROUP BY lang),
        |v AS (SELECT count(DISTINCT w) AS v FROM t),
        |wc AS (SELECT lang, w, count(*) AS c FROM t GROUP BY lang, w),
        |s AS (SELECT t.doc_id, t.lang AS true_lang, ntok.lang AS cl,
        |        ln((coalesce(wc.c, 0) + 1.0) / (ntok.ntok + v.v)) AS lp
        |      FROM t CROSS JOIN ntok CROSS JOIN v
        |      LEFT JOIN wc ON wc.lang = ntok.lang AND wc.w = t.w),
        |sc AS (SELECT s.doc_id, s.true_lang, s.cl,
        |         round(sum(s.lp) + any_value(pri.lp), 6) AS score
        |       FROM s JOIN pri ON pri.lang = s.cl
        |       GROUP BY s.doc_id, s.true_lang, s.cl),
        |rk AS (SELECT doc_id, true_lang, cl, score,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY score DESC, cl) AS rn
        |       FROM sc)
        |SELECT true_lang AS lang, cl AS pred_lang, count(*) AS n
        |FROM rk WHERE rn = 1
        |GROUP BY true_lang, cl
        |ORDER BY lang, pred_lang""".stripMargin,
    "q127_scd2_intervals" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_id, ts, event_type FROM o
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type AS state, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS valid_to
        |FROM c
        |ORDER BY user_id, valid_from""".stripMargin,
    // the oracle rebuilds the ENTIRE sketch — same polynomial
    // fingerprint fold, same (a·fp+b mod p) mod width row hashes —
    // so every counter is cross-engine identical, not just the output
    "q128_countmin" ->
      """WITH t AS (SELECT w FROM (
        |             SELECT unnest(string_split(text, ' ')) AS w
        |             FROM documents) WHERE w <> ''),
        |c AS (SELECT w,
        |        list_reduce(
        |          list_prepend(7::BIGINT,
        |            [ascii(ch) for ch in string_split(w, '')]),
        |          (acc, ch) -> (acc * 31 + ch) % 1000000007) AS fp,
        |        count(*) AS cnt
        |      FROM t GROUP BY w),
        |params AS (SELECT * FROM (VALUES
        |  (0, 982451653::BIGINT, 7::BIGINT),
        |  (1, 735632797::BIGINT, 11::BIGINT),
        |  (2, 352654597::BIGINT, 13::BIGINT),
        |  (3, 97::BIGINT, 17::BIGINT)) AS p(row_i, a, b)),
        |buckets AS (SELECT c.w, c.cnt, p.row_i,
        |              ((p.a * c.fp + p.b) % 1000000007) % 64 AS bucket
        |            FROM c CROSS JOIN params p),
        |sketch AS (SELECT row_i, bucket,
        |             CAST(sum(cnt) AS BIGINT) AS counter
        |           FROM buckets GROUP BY row_i, bucket),
        |probes AS (SELECT w FROM c ORDER BY cnt DESC, w LIMIT 20)
        |SELECT b.w, max(b.cnt) AS exact_cnt, min(s.counter) AS cm_est
        |FROM buckets b
        |JOIN sketch s ON b.row_i = s.row_i AND b.bucket = s.bucket
        |WHERE b.w IN (SELECT w FROM probes)
        |GROUP BY b.w
        |ORDER BY exact_cnt DESC, w""".stripMargin,
    // monthly cells summed in DECIMAL (partition-order exact), the x
    // side in integer arithmetic; slope rounds at 4 dp ≫ Σxy noise
    "q129_revenue_trend" ->
      """WITH m AS (
        |  SELECT c_mktsegment AS segment,
        |    year(o_orderdate) * 12 + month(o_orderdate) - 23940 AS mi,
        |    sum(CAST(o_totalprice AS DECIMAL(20,2))) AS ydec
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY segment, mi),
        |a AS (
        |  SELECT segment, count(*) AS n, sum(mi) AS sx,
        |    sum(mi * mi) AS sxx, sum(ydec) AS sydec,
        |    sum(mi * CAST(ydec AS DOUBLE)) AS sxy
        |  FROM m GROUP BY segment)
        |SELECT segment, CAST(n AS BIGINT) AS n_months,
        |  CASE WHEN n * sxx - sx * sx <> 0
        |    THEN round((n * sxy - sx * CAST(sydec AS DOUBLE))
        |           / (n * sxx - sx * sx), 4)
        |    END AS slope,
        |  floor(CAST(sydec * 100 AS DOUBLE) / n + 0.5) / 100
        |    AS avg_monthly_rev
        |FROM a
        |ORDER BY segment""".stripMargin,
    // priority = integer hash scaled to [0,1e6) over the mixture
    // weight — one IEEE division, no libm: bit-identical cross-engine
    "q130_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |    CAST(CASE
        |      WHEN source IN ('src0','src1','src2','src3','src4')
        |        THEN 900
        |      WHEN source IN ('src5','src6','src7','src8','src9')
        |        THEN 500
        |      ELSE 200 END AS BIGINT) AS weight_permille
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source, weight_permille,
        |    CAST(((doc_id % 1000000007) * 2654435761) % 1000000 + 1
        |      AS DOUBLE) / CAST(weight_permille AS DOUBLE) AS priority
        |  FROM w)
        |SELECT doc_id, source, weight_permille,
        |  round(priority, 4) AS priority
        |FROM s
        |ORDER BY s.priority, doc_id
        |LIMIT 200""".stripMargin,
    // share test in integer-scaled DECIMAL (value·1000 > total·1): both
    // engines qualify identical parts regardless of summation order
    "q131_important_parts" ->
      """WITH v AS (
        |  SELECT l_partkey, sum(CAST(l_extendedprice * (1 - l_discount)
        |        AS DECIMAL(18,6))) AS value_exact
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_19'
        |  GROUP BY l_partkey),
        |t AS (SELECT sum(value_exact) AS total_exact FROM v)
        |SELECT l_partkey AS p_partkey,
        |  CAST(round(value_exact, 2) AS DOUBLE) AS part_value
        |FROM v, t
        |WHERE value_exact * 1000 > total_exact * 1
        |ORDER BY part_value DESC, p_partkey""".stripMargin,
    // the oracle REBUILDS the sketch: distinct portable hashes, k-th
    // order statistic via row_number, same integer floor division
    "q132_kmv_vocab" ->
      """WITH m AS (
        |  SELECT 'l_orderkey' AS column_name, l_orderkey AS v
        |  FROM lineitem
        |  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
        |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem),
        |d AS (SELECT DISTINCT column_name, v FROM m),
        |n AS (SELECT column_name, count(*) AS exact_ndv
        |      FROM d GROUP BY column_name),
        |h AS (SELECT DISTINCT column_name,
        |        ((v % 1000000007) * 2654435761) % 1000000007 AS hv
        |      FROM d),
        |r AS (SELECT column_name, hv,
        |        row_number() OVER (PARTITION BY column_name
        |                           ORDER BY hv) AS rn
        |      FROM h),
        |c AS (SELECT column_name, count(*) AS nh
        |      FROM h GROUP BY column_name),
        |kth AS (SELECT column_name, hv FROM r WHERE rn = 128)
        |SELECT n.column_name, CAST(n.exact_ndv AS BIGINT) AS exact_ndv,
        |  CAST(CASE WHEN c.nh < 128 THEN c.nh
        |       ELSE CAST(127 AS BIGINT) * 1000000007 // kth.hv END
        |    AS BIGINT) AS kmv_ndv
        |FROM n JOIN c USING (column_name) LEFT JOIN kth USING (column_name)
        |ORDER BY column_name""".stripMargin,
    // the oracle REBUILDS the bottom-k sample: same portable hash
    // priority, same (pri, rk) selection order, same nearest-rank pick
    "q133_sample_quantiles" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |    l_orderkey * 10 + l_linenumber AS rk,
        |    ((l_orderkey * 10 + l_linenumber) % 1000000007)
        |      * 2654435761 % 1000000007 AS pri,
        |    l_extendedprice AS v
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, rk, v,
        |        row_number() OVER (PARTITION BY l_returnflag
        |                           ORDER BY pri, rk) AS sel
        |      FROM s),
        |samp AS (SELECT l_returnflag, v, rk FROM r WHERE sel <= 128),
        |rv AS (SELECT l_returnflag, v,
        |         row_number() OVER (PARTITION BY l_returnflag
        |                            ORDER BY v, rk) AS rv,
        |         count(*) OVER (PARTITION BY l_returnflag) AS n
        |       FROM samp)
        |SELECT l_returnflag,
        |  CAST(max(n) AS BIGINT) AS n_sample,
        |  CAST(max(CASE WHEN rv = ceil(0.50 * n) THEN v END)
        |    AS DOUBLE) AS p50_est,
        |  CAST(max(CASE WHEN rv = ceil(0.90 * n) THEN v END)
        |    AS DOUBLE) AS p90_est,
        |  CAST(max(CASE WHEN rv = ceil(0.99 * n) THEN v END)
        |    AS DOUBLE) AS p99_est
        |FROM rv GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // unrolled power iteration: each rN CTE replays one damped step
    // (dangling mass + incoming mass), rounded to 6 dp like the Spark
    // iterate, so the trajectories stay bit-identical engine-to-engine
    "q134_trade_rank" ->
      """WITH nodes AS (
        |  SELECT c_custkey * 2 AS node_id FROM customer
        |  UNION ALL SELECT s_suppkey * 2 + 1 FROM supplier),
        |pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT c AS src, s AS dst FROM pairs
        |  UNION ALL SELECT s AS src, c AS dst FROM pairs),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |r0 AS (SELECT node_id, CAST(1.0 AS DOUBLE) AS m FROM nodes),
        |d0 AS (SELECT coalesce(sum(m), 0) AS dang FROM r0
        |       WHERE node_id NOT IN (SELECT src FROM deg)),
        |c0 AS (SELECT e.dst AS node_id, sum(r.m / g.outdeg) AS contrib
        |       FROM edges e JOIN deg g ON e.src = g.src
        |       JOIN r0 r ON e.src = r.node_id GROUP BY e.dst),
        |r1 AS (SELECT n.node_id,
        |         round(0.15 + 0.85 * (coalesce(c.contrib, 0)
        |           + (SELECT dang FROM d0) / (SELECT n FROM nn)), 6) AS m
        |       FROM nodes n LEFT JOIN c0 c ON n.node_id = c.node_id),
        |d1 AS (SELECT coalesce(sum(m), 0) AS dang FROM r1
        |       WHERE node_id NOT IN (SELECT src FROM deg)),
        |c1 AS (SELECT e.dst AS node_id, sum(r.m / g.outdeg) AS contrib
        |       FROM edges e JOIN deg g ON e.src = g.src
        |       JOIN r1 r ON e.src = r.node_id GROUP BY e.dst),
        |r2 AS (SELECT n.node_id,
        |         round(0.15 + 0.85 * (coalesce(c.contrib, 0)
        |           + (SELECT dang FROM d1) / (SELECT n FROM nn)), 6) AS m
        |       FROM nodes n LEFT JOIN c1 c ON n.node_id = c.node_id),
        |d2 AS (SELECT coalesce(sum(m), 0) AS dang FROM r2
        |       WHERE node_id NOT IN (SELECT src FROM deg)),
        |c2 AS (SELECT e.dst AS node_id, sum(r.m / g.outdeg) AS contrib
        |       FROM edges e JOIN deg g ON e.src = g.src
        |       JOIN r2 r ON e.src = r.node_id GROUP BY e.dst),
        |r3 AS (SELECT n.node_id,
        |         round(0.15 + 0.85 * (coalesce(c.contrib, 0)
        |           + (SELECT dang FROM d2) / (SELECT n FROM nn)), 6) AS m
        |       FROM nodes n LEFT JOIN c2 c ON n.node_id = c.node_id)
        |SELECT node_id,
        |  CASE WHEN node_id % 2 = 0 THEN 'customer'
        |       ELSE 'supplier' END AS node_type,
        |  m AS rank_mass
        |FROM r3 ORDER BY rank_mass DESC, node_id LIMIT 20""".stripMargin,
    // exact Σc² next to the 1-in-64 key-domain sampled estimate —
    // HUGEINT sums cast back to BIGINT, floor divisions spelled //
    "q135_join_card" ->
      """WITH c AS (
        |  SELECT l_partkey, count(*) AS c,
        |    (l_partkey % 1000000007) * 2654435761 % 1000000007 AS h
        |  FROM lineitem GROUP BY l_partkey),
        |a AS (
        |  SELECT CAST(sum(c * c) AS BIGINT) AS exact_pairs,
        |    CAST(coalesce(sum(CASE WHEN h < 1000000007 // 64
        |      THEN c * c END), 0) * 64 AS BIGINT) AS est_pairs
        |  FROM c)
        |SELECT exact_pairs, est_pairs,
        |  round(CAST(est_pairs - exact_pairs AS DOUBLE)
        |    / CAST(exact_pairs AS DOUBLE) * 100, 2) AS rel_err_pct
        |FROM a""".stripMargin,
    // the oracle rebuilds both sketches: distinct portable hashes per
    // flag, bottom-min(k,m) of the union via row_number, ρ·U floor math
    "q136_kmv_setops" ->
      """WITH d AS (
        |  SELECT DISTINCT l_returnflag AS f,
        |    (l_partkey % 1000000007) * 2654435761 % 1000000007 AS h
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
        |u AS (SELECT h, max(CASE WHEN f = 'R' THEN 1 ELSE 0 END) AS ina,
        |        max(CASE WHEN f = 'A' THEN 1 ELSE 0 END) AS inb
        |      FROM d GROUP BY h),
        |s AS (SELECT h, ina, inb,
        |        row_number() OVER (ORDER BY h) AS rn
        |      FROM u),
        |st AS (SELECT count(*) AS m, max(h) AS kth,
        |         CAST(sum(CASE WHEN ina = 1 AND inb = 1 THEN 1
        |           ELSE 0 END) AS BIGINT) AS nboth
        |       FROM s WHERE rn <= 256),
        |ex AS (SELECT CAST(count(*) AS BIGINT) AS union_exact,
        |         CAST(sum(CASE WHEN ina = 1 AND inb = 1 THEN 1
        |           ELSE 0 END) AS BIGINT) AS inter_exact,
        |         CAST(sum(ina) AS BIGINT) AS n_a_exact,
        |         CAST(sum(inb) AS BIGINT) AS n_b_exact
        |       FROM u),
        |est AS (SELECT m, nboth,
        |          CASE WHEN m < 256 THEN m
        |               ELSE CAST(255 AS BIGINT) * 1000000007 // kth
        |               END AS union_est
        |        FROM st)
        |SELECT n_a_exact, n_b_exact, union_exact,
        |  CAST(union_est AS BIGINT) AS union_est, inter_exact,
        |  CAST((nboth * union_est) // m AS BIGINT) AS inter_est,
        |  round(CAST(nboth AS DOUBLE) / CAST(m AS DOUBLE), 4) AS jaccard_est
        |FROM est, ex""".stripMargin,
    // the spine regenerates from the same bounds aggregate; LOCF is
    // last_value IGNORE NULLS over the identical bounded window
    "q137_locf_fill" ->
      """WITH b AS (
        |  SELECT CAST(min(o_orderdate) AS DATE) AS lo,
        |    CAST(max(o_orderdate) AS DATE) AS hi FROM orders),
        |days AS (
        |  SELECT CAST(unnest(generate_series(lo, hi,
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |segs AS (SELECT DISTINCT c_mktsegment AS seg FROM customer),
        |rev AS (
        |  SELECT c_mktsegment AS seg, CAST(o_orderdate AS DATE) AS day,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT s.seg, d.day,
        |  CAST(coalesce(last_value(r.rev IGNORE NULLS) OVER (
        |    PARTITION BY s.seg ORDER BY d.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
        |    AS DOUBLE) AS rev_filled,
        |  r.rev IS NOT NULL AS observed
        |FROM segs s CROSS JOIN days d
        |LEFT JOIN rev r ON r.seg = s.seg AND r.day = d.day
        |ORDER BY s.seg, d.day""".stripMargin,
    // six exact decimal moments per pair, the same double r formula
    "q138_corr_matrix" ->
      """WITH m AS (
        |  SELECT pair, x, y FROM (
        |    SELECT CAST(l_quantity AS DECIMAL(18,2)) AS qty,
        |      CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
        |      CAST(l_discount AS DECIMAL(18,2)) AS disc,
        |      CAST(l_tax AS DECIMAL(18,2)) AS tax
        |    FROM lineitem) t,
        |  LATERAL (VALUES
        |    ('qty_price', t.qty, t.price), ('qty_disc', t.qty, t.disc),
        |    ('qty_tax', t.qty, t.tax), ('price_disc', t.price, t.disc),
        |    ('price_tax', t.price, t.tax), ('disc_tax', t.disc, t.tax))
        |    AS v(pair, x, y)),
        |mo AS (
        |  SELECT pair, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(y * y) AS DOUBLE) AS syy
        |  FROM m GROUP BY pair)
        |SELECT pair,
        |  round((n * sxy - sx * sy) /
        |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r
        |FROM mo ORDER BY pair""".stripMargin,
    // same tokenization as q64 (space split, empties dropped),
    // adjacency as lead over doc-partitioned position order, identical
    // double spelling of the PMI expression
    "q139_pmi_pairs" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |t AS (
        |  SELECT doc_id, unnest(ws) AS w,
        |    unnest(range(1, len(ws) + 1)) AS pos
        |  FROM d),
        |f AS (SELECT doc_id, w, pos FROM t WHERE w <> ''),
        |b0 AS (
        |  SELECT doc_id, w,
        |    lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        |  FROM f),
        |bi AS (SELECT least(w, nxt) AS x, greatest(w, nxt) AS y
        |       FROM b0 WHERE nxt IS NOT NULL AND w <> nxt),
        |cp AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy
        |       FROM bi GROUP BY x, y),
        |mt AS (SELECT CAST(sum(n_xy) AS BIGINT) AS mm FROM cp),
        |cu AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM f GROUP BY w),
        |nt AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cu)
        |SELECT cp.x, cp.y, cp.n_xy,
        |  round(ln(CAST(cp.n_xy AS DOUBLE) * CAST(nt.n AS DOUBLE)
        |      * CAST(nt.n AS DOUBLE)
        |    / (CAST(mt.mm AS DOUBLE) * CAST(a.c AS DOUBLE)
        |      * CAST(b.c AS DOUBLE))), 4) AS pmi
        |FROM cp
        |JOIN cu a ON cp.x = a.w
        |JOIN cu b ON cp.y = b.w, mt, nt
        |WHERE cp.n_xy >= 5
        |ORDER BY pmi DESC, cp.x, cp.y LIMIT 20""".stripMargin,
    // identical wedge formulation; HUGEINT sums cast back, // floor
    "q140_butterflies" ->
      """WITH p AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |w AS (
        |  SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT) AS cnt
        |  FROM p a JOIN p b ON a.c = b.c AND a.s < b.s
        |  GROUP BY a.s, b.s)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_edges,
        |  CAST(sum(cnt) AS BIGINT) AS n_wedges,
        |  CAST(count(*) AS BIGINT) AS n_supplier_pairs,
        |  CAST(sum(cnt * (cnt - 1) // 2) AS BIGINT) AS n_butterflies
        |FROM w""".stripMargin,
    // the oracle rebuilds the full expected grid (cross join of the
    // marginals) with the identical double spelling of (n-e)^2/e
    "q141_chi_square" ->
      """WITH ev AS (
        |  SELECT event_type AS t, hour(ts) AS h FROM events),
        |cells AS (SELECT t, h, CAST(count(*) AS BIGINT) AS n
        |          FROM ev GROUP BY t, h),
        |rt AS (SELECT t, CAST(sum(n) AS BIGINT) AS rt
        |       FROM cells GROUP BY t),
        |ct AS (SELECT h, CAST(sum(n) AS BIGINT) AS ct
        |       FROM cells GROUP BY h),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
        |g AS (
        |  SELECT rt.t, ct.h, rt.rt, ct.ct,
        |    coalesce(cells.n, 0) AS n
        |  FROM rt CROSS JOIN ct
        |  LEFT JOIN cells ON cells.t = rt.t AND cells.h = ct.h),
        |x AS (
        |  SELECT t, rt, n,
        |    CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |      / (SELECT CAST(nn AS DOUBLE) FROM tot) AS e
        |  FROM g)
        |SELECT t AS event_type,
        |  CAST(max(rt) AS BIGINT) AS n_events,
        |  round(sum((CAST(n AS DOUBLE) - e) * (CAST(n AS DOUBLE) - e)
        |    / e), 4) AS chi2_part
        |FROM x GROUP BY t ORDER BY t""".stripMargin,
    // same melt, same p·ln p double spelling
    "q142_column_entropy" ->
      """WITH m AS (
        |  SELECT 'l_returnflag' AS column_name,
        |    CAST(l_returnflag AS VARCHAR) AS v FROM lineitem
        |  UNION ALL SELECT 'l_linestatus',
        |    CAST(l_linestatus AS VARCHAR) FROM lineitem
        |  UNION ALL SELECT 'l_linenumber',
        |    CAST(l_linenumber AS VARCHAR) FROM lineitem
        |  UNION ALL SELECT 'l_quantity',
        |    CAST(l_quantity AS VARCHAR) FROM lineitem),
        |c AS (SELECT column_name, v, CAST(count(*) AS BIGINT) AS c
        |      FROM m GROUP BY column_name, v),
        |t AS (SELECT column_name, CAST(sum(c) AS BIGINT) AS n
        |      FROM c GROUP BY column_name)
        |SELECT c.column_name,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  round(-sum((CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
        |    * ln(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))), 4)
        |    AS entropy_nats
        |FROM c JOIN t USING (column_name)
        |GROUP BY c.column_name ORDER BY c.column_name""".stripMargin,
    // identical tokenization and literal spelling (2.2 = k1+1,
    // 0.25 = 1-b); avgdl stays the ntok/nd quotient inline
    "q143_bm25_topk" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |f AS (SELECT doc_id, w FROM t WHERE w <> ''),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |       FROM f GROUP BY doc_id),
        |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
        |       FROM f WHERE w IN ('join', 'filter', 'scan')
        |       GROUP BY doc_id, w),
        |dfreq AS (SELECT w, CAST(count(*) AS BIGINT) AS df
        |          FROM tf GROUP BY w),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS ntok FROM f)
        |SELECT tf.doc_id,
        |  round(sum(
        |    ln((CAST(nd.nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
        |      / (CAST(df AS DOUBLE) + 0.5) + 1.0)
        |    * (CAST(tf AS DOUBLE) * 2.2
        |      / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
        |        * CAST(dl AS DOUBLE)
        |        / (CAST(nt.ntok AS DOUBLE) / CAST(nd.nd AS DOUBLE)))))),
        |    4) AS bm25,
        |  CAST(count(*) AS BIGINT) AS n_terms
        |FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (w), nd, nt
        |GROUP BY tf.doc_id
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    // both candidate lists rebuilt (q143 at k=50, q26's cosine at
    // k=50), ranked by the same tie-deterministic orderings, fused
    // with the identical reciprocal spelling
    "q144_rank_fusion" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |f AS (SELECT doc_id, w FROM t WHERE w <> ''),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |       FROM f GROUP BY doc_id),
        |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
        |       FROM f WHERE w IN ('join', 'filter', 'scan')
        |       GROUP BY doc_id, w),
        |dfreq AS (SELECT w, CAST(count(*) AS BIGINT) AS df
        |          FROM tf GROUP BY w),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
        |nt AS (SELECT CAST(count(*) AS BIGINT) AS ntok FROM f),
        |bm AS (
        |  SELECT tf.doc_id,
        |    round(sum(
        |      ln((CAST(nd.nd AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
        |        / (CAST(df AS DOUBLE) + 0.5) + 1.0)
        |      * (CAST(tf AS DOUBLE) * 2.2
        |        / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75
        |          * CAST(dl AS DOUBLE)
        |          / (CAST(nt.ntok AS DOUBLE) / CAST(nd.nd AS DOUBLE)))))),
        |      4) AS bm25
        |  FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (w), nd, nt
        |  GROUP BY tf.doc_id
        |  ORDER BY bm25 DESC, doc_id LIMIT 50),
        |kw AS (SELECT doc_id, CAST(row_number() OVER (
        |         ORDER BY bm25 DESC, doc_id) AS INT) AS kw_rank
        |       FROM bm),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT v FROM e WHERE vec_id = 0),
        |cs AS (
        |  SELECT e.vec_id,
        |    round(list_dot_product(e.v, q.v) /
        |      (sqrt(list_dot_product(e.v, e.v)) *
        |       sqrt(list_dot_product(q.v, q.v))), 4) AS cosine
        |  FROM e, q WHERE e.vec_id <> 0
        |  ORDER BY cosine DESC, vec_id LIMIT 50),
        |sem AS (SELECT vec_id AS doc_id, CAST(row_number() OVER (
        |          ORDER BY cosine DESC, vec_id) AS INT) AS sem_rank
        |        FROM cs)
        |SELECT coalesce(kw.doc_id, sem.doc_id) AS doc_id,
        |  kw_rank, sem_rank,
        |  round(
        |    coalesce(1.0 / CAST(kw_rank + 60 AS DOUBLE), 0.0) +
        |    coalesce(1.0 / CAST(sem_rank + 60 AS DOUBLE), 0.0), 6) AS rrf
        |FROM kw FULL OUTER JOIN sem ON kw.doc_id = sem.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin,
    // identical quantization (round(v*1000) to BIGINT) and the same
    // double spelling of t and Welch-Satterthwaite df
    "q145_welch_ttest" ->
      """WITH ev AS (
        |  SELECT event_type AS grp,
        |    CAST(round(value * 1000, 0) AS BIGINT) AS v
        |  FROM events WHERE event_type IN ('click', 'view')),
        |m AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(v) AS BIGINT) AS s,
        |        CAST(sum(v * v) AS BIGINT) AS ss
        |      FROM ev GROUP BY grp),
        |a AS (SELECT n AS na, s AS sa, ss AS ssa FROM m
        |      WHERE grp = 'click'),
        |b AS (SELECT n AS nb, s AS sb, ss AS ssb FROM m
        |      WHERE grp = 'view'),
        |x AS (SELECT na, nb,
        |        CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
        |        CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
        |        (CAST(ssa AS DOUBLE) - CAST(sa AS DOUBLE)
        |          * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
        |          / (CAST(na AS DOUBLE) - 1.0) AS va,
        |        (CAST(ssb AS DOUBLE) - CAST(sb AS DOUBLE)
        |          * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
        |          / (CAST(nb AS DOUBLE) - 1.0) AS vb
        |      FROM a, b),
        |y AS (SELECT na, nb, ma, mb,
        |        va / CAST(na AS DOUBLE) AS sea,
        |        vb / CAST(nb AS DOUBLE) AS seb
        |      FROM x)
        |SELECT na, nb,
        |  round(ma / 1000.0, 4) AS mean_a,
        |  round(mb / 1000.0, 4) AS mean_b,
        |  round((ma - mb) / sqrt(sea + seb), 4) AS t_stat,
        |  round((sea + seb) * (sea + seb)
        |    / (sea * sea / (CAST(na AS DOUBLE) - 1.0)
        |      + seb * seb / (CAST(nb AS DOUBLE) - 1.0)), 2) AS welch_df
        |FROM y""".stripMargin,
    // quantile_cont interpolates like Spark's percentile() on the same
    // integer cents (the q35/q96 discipline); fences spelled once
    "q146_iqr_outliers" ->
      """WITH li AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
        |  FROM lineitem),
        |f AS (SELECT l_returnflag,
        |        quantile_cont(cents, 0.25) AS q1,
        |        quantile_cont(cents, 0.75) AS q3
        |      FROM li GROUP BY l_returnflag),
        |g AS (SELECT l_returnflag,
        |        q1 - (q3 - q1) * 1.5 AS lo,
        |        q3 + (q3 - q1) * 1.5 AS hi
        |      FROM f)
        |SELECT li.l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN CAST(cents AS DOUBLE) < lo THEN 1
        |    ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(sum(CASE WHEN CAST(cents AS DOUBLE) > hi THEN 1
        |    ELSE 0 END) AS BIGINT) AS n_high,
        |  round(max(lo) / 100.0, 4) AS fence_lo,
        |  round(max(hi) / 100.0, 4) AS fence_hi
        |FROM li JOIN g USING (l_returnflag)
        |GROUP BY li.l_returnflag ORDER BY li.l_returnflag""".stripMargin,
    // identical basket/pair/margin counts; N·c_ab/(c_a·c_b) spelled once
    "q147_copurchase_lift" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |no AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM b),
        |pr AS (
        |  SELECT a.p AS pa, c.p AS pb, CAST(count(*) AS BIGINT) AS c_ab
        |  FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
        |  GROUP BY a.p, c.p HAVING count(*) >= 3),
        |m AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY p)
        |SELECT pr.pa, pr.pb, pr.c_ab,
        |  round(CAST(no.n AS DOUBLE) * CAST(pr.c_ab AS DOUBLE)
        |    / (CAST(ma.c AS DOUBLE) * CAST(mb.c AS DOUBLE)), 4) AS lift
        |FROM pr
        |JOIN m ma ON pr.pa = ma.p
        |JOIN m mb ON pr.pb = mb.p, no
        |ORDER BY lift DESC, pa, pb LIMIT 20""".stripMargin,
    // q124's unrolled training chain, then: p rounded 6 dp, exact
    // decile cutpoints, bucket by counting cutpoints below p
    "q148_model_calibration" ->
      """WITH e AS (SELECT vec_id,
        |             list_prepend(1.0, embedding::DOUBLE[]) AS x,
        |             CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y
        |           FROM embeddings),
        |g1 AS (SELECT pos, round(avg(xj * (0.5 - y)), 6) AS g
        |       FROM (SELECT unnest(x) AS xj,
        |               unnest(range(1, len(x) + 1)) AS pos, y FROM e)
        |       GROUP BY pos),
        |w1 AS (SELECT list(0.0 - g ORDER BY pos) AS w FROM g1),
        |r2 AS (SELECT x, y,
        |         1/(1 + exp(-list_dot_product(x, (SELECT w FROM w1)))) - y
        |           AS r FROM e),
        |g2 AS (SELECT pos, round(avg(xj * r), 6) AS g
        |       FROM (SELECT unnest(x) AS xj,
        |               unnest(range(1, len(x) + 1)) AS pos, r FROM r2)
        |       GROUP BY pos),
        |w2 AS (SELECT list(wv - g ORDER BY pos) AS w
        |       FROM (SELECT unnest(w) AS wv,
        |               unnest(range(1, len(w) + 1)) AS pos FROM w1)
        |       JOIN g2 USING (pos)),
        |r3 AS (SELECT x, y,
        |         1/(1 + exp(-list_dot_product(x, (SELECT w FROM w2)))) - y
        |           AS r FROM e),
        |g3 AS (SELECT pos, round(avg(xj * r), 6) AS g
        |       FROM (SELECT unnest(x) AS xj,
        |               unnest(range(1, len(x) + 1)) AS pos, r FROM r3)
        |       GROUP BY pos),
        |w3 AS (SELECT list(wv - g ORDER BY pos) AS w
        |       FROM (SELECT unnest(w) AS wv,
        |               unnest(range(1, len(w) + 1)) AS pos FROM w2)
        |       JOIN g3 USING (pos)),
        |p6 AS (SELECT y,
        |         round(1/(1 + exp(-list_dot_product(x,
        |           (SELECT w FROM w3)))), 6) AS p6
        |       FROM e),
        |cut AS (SELECT list_transform(quantile_cont(p6,
        |          [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
        |          c -> round(c, 6)) AS cs FROM p6),
        |d AS (SELECT y, p6,
        |        CAST(1 + len(list_filter(cs, c -> p6 > c)) AS INT)
        |          AS decile
        |      FROM p6, cut)
        |SELECT decile, CAST(count(*) AS BIGINT) AS n,
        |  round(avg(p6), 4) AS avg_p,
        |  round(avg(CAST(y AS DOUBLE)), 4) AS pos_rate
        |FROM d GROUP BY decile ORDER BY decile""".stripMargin,
    // rank by (cents, custkey) ascending = the composite-key order the
    // sharded prefix sum walks; same quantization, same double spelling
    "q149_gini_revenue" ->
      """WITH r AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |k AS (SELECT cents,
        |        row_number() OVER (ORDER BY cents, o_custkey) AS rk
        |      FROM r),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(cents) AS BIGINT) AS s,
        |        CAST(sum(rk * cents) AS BIGINT) AS rs
        |      FROM k)
        |SELECT n, round(CAST(s AS DOUBLE) / 100, 2) AS total_rev,
        |  round(2.0 * CAST(rs AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
        |    - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini
        |FROM t""".stripMargin,
    // same conditional mins, same integer-µs delta, quantile_cont twin
    "q150_conversion_latency" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |f AS (SELECT user_id,
        |        min(CASE WHEN event_type = 'view' THEN us END)
        |          AS first_view,
        |        min(CASE WHEN event_type = 'purchase' THEN us END)
        |          AS first_buy
        |      FROM ev GROUP BY user_id),
        |v AS (SELECT first_view, first_buy,
        |        CASE WHEN first_buy > first_view
        |          THEN (first_buy - first_view) / 1000000 END AS delta_s
        |      FROM f WHERE first_view IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_viewers,
        |  CAST(count(delta_s) AS BIGINT) AS n_converted,
        |  round(CAST(count(delta_s) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 4) AS conversion_rate,
        |  round(quantile_cont(delta_s, 0.25), 2) AS p25_s,
        |  round(quantile_cont(delta_s, 0.50), 2) AS p50_s,
        |  round(quantile_cont(delta_s, 0.90), 2) AS p90_s
        |FROM v""".stripMargin,
    // q25's exact pair CTE joined to the source dim, grouped on the
    // unordered source pair
    "q151_cross_source_dups" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(ws) >= 3
        |      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |            for i in range(1, len(ws) - 1)]
        |      ELSE [text] END) AS sh,
        |    CAST(floor(n_chars / 32.0) AS BIGINT) AS blk
        |  FROM (SELECT doc_id, text, n_chars,
        |          string_split(text, ' ') AS ws FROM documents)
        |), pairs AS MATERIALIZED (
        |  SELECT a.doc_id AS ai, b.doc_id AS bi,
        |    round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |          4) AS jaccard
        |  FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |  UNION ALL
        |  SELECT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id),
        |    round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |          4)
        |  FROM d a JOIN d b ON a.blk + 1 = b.blk
        |), hits AS MATERIALIZED (SELECT ai, bi, jaccard FROM pairs WHERE jaccard >= 0.8)
        |, g AS MATERIALIZED (
        |  SELECT least(sa.source, sb.source) AS source_a,
        |    greatest(sa.source, sb.source) AS source_b,
        |    CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CAST(round(jaccard * 10000, 0) AS BIGINT))
        |      AS BIGINT) AS spm
        |  FROM hits
        |  JOIN documents sa ON hits.ai = sa.doc_id
        |  JOIN documents sb ON hits.bi = sb.doc_id
        |  GROUP BY least(sa.source, sb.source),
        |    greatest(sa.source, sb.source))
        |SELECT source_a, source_b, n_pairs,
        |  CAST((2 * spm + n_pairs) // (2 * n_pairs) AS DOUBLE)
        |    / 10000.0 AS avg_jaccard
        |FROM g ORDER BY source_a, source_b""".stripMargin,
    // q39's gap rule replayed, paths via list(... ORDER BY us, id)
    "q152_top_paths" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, event_type, us,
        |    CASE WHEN us - lag(us) OVER w > 1800000000
        |           OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM ev WINDOW w AS (PARTITION BY user_id
        |                       ORDER BY us, event_id)),
        |g AS (
        |  SELECT user_id, event_id, event_type, us,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_id
        |  FROM s),
        |p AS (
        |  SELECT array_to_string(
        |      (list(event_type ORDER BY us, event_id))[1:3], '>') AS path
        |  FROM g GROUP BY user_id, session_id)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |FROM p GROUP BY path
        |ORDER BY n_sessions DESC, path LIMIT 10""".stripMargin,
    // the same hash draws, the same literal Poisson thresholds, the
    // same exact weighted sums — the oracle redraws every resample
    "q153_bootstrap_ci" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |m AS (
        |  SELECT o_orderkey, cents, b,
        |    CAST((o_orderkey * 32 + b) % 1000000007
        |      * 2654435761 % 1000000007 AS DOUBLE)
        |      / CAST(1000000007 AS DOUBLE) AS u
        |  FROM o, unnest(range(0, 32)) AS r(b)),
        |w AS (
        |  SELECT b, cents,
        |    CASE WHEN u < 0.36787944117144233 THEN 0
        |         WHEN u < 0.7357588823428847 THEN 1
        |         WHEN u < 0.9196986029286058 THEN 2
        |         WHEN u < 0.9810118431238462 THEN 3
        |         ELSE 4 END AS w
        |  FROM m),
        |means AS (
        |  SELECT b, CAST(sum(w * cents) AS DOUBLE)
        |    / CAST(sum(w) AS DOUBLE) AS mm
        |  FROM w GROUP BY b),
        |base AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |      AS mean_cents
        |  FROM o)
        |SELECT n, round(mean_cents / 100.0, 2) AS mean_value,
        |  round(quantile_cont(mm, 0.025) / 100.0, 2) AS ci_lo,
        |  round(quantile_cont(mm, 0.975) / 100.0, 2) AS ci_hi
        |FROM means, base GROUP BY n, mean_cents""".stripMargin,
    // selection-route percentiles: quantile_cont over the identical
    // fixed-point cents grid, descaled and 4 dp-rounded on both sides
    "q154_selection_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(cents, 0.25) / 100.0, 4) AS p25_price,
        |  round(quantile_cont(cents, 0.50) / 100.0, 4) AS p50_price,
        |  round(quantile_cont(cents, 0.75) / 100.0, 4) AS p75_price,
        |  round(quantile_cont(cents, 0.99) / 100.0, 4) AS p99_price
        |FROM (SELECT l_returnflag,
        |        CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
        |      FROM lineitem)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // chain components are analytically the custkey's 1000-block: the
    // oracle derives them arithmetically while the engine runs the
    // real doubling iteration — exactness proves the graph algorithm
    // replays 2× decimation from the synthesis: kept samples are the
    // odd text positions (1, 3, 5, …), rate halves — while Spark walks
    // the actual RIFF chunks, selects samples, and re-encodes
    "q161_audio_resample" ->
      """SELECT doc_id AS media_id,
        |  (8000 + (doc_id % 3) * 4000) // 2 AS sample_rate,
        |  CAST((len(t) + 1) // 2 AS BIGINT) AS n_samples,
        |  CAST(list_aggregate(
        |    [ascii(substr(t, i, 1)) * 256 - 32768
        |     for i in range(1, len(t) + 1, 2)], 'sum') AS BIGINT)
        |    AS sum_samples,
        |  CAST(list_aggregate(
        |    [abs(ascii(substr(t, i, 1)) * 256 - 32768)
        |     for i in range(1, len(t) + 1, 2)], 'max') AS BIGINT)
        |    AS peak_abs
        |FROM (SELECT doc_id, substr(text, 1, 256) AS t
        |      FROM documents WHERE doc_id % 3 = 1 AND len(text) >= 1)
        |ORDER BY media_id""".stripMargin,
    // replays 64-sample framing from the synthesis: per-frame energy
    // Σs² and DC-removed zero crossings via the exact integer
    // comparison s·64 < Σs (no float mean) — while Spark walks the
    // actual RIFF bytes and frames the PCM stream
    "q163_audio_frames" ->
      """WITH a AS (SELECT doc_id, substr(text, 1, 256) AS t
        |           FROM documents WHERE doc_id % 3 = 1 AND len(text) >= 1),
        |s AS (SELECT doc_id, len(t) AS n,
        |        unnest(range(1, len(t) + 1)) AS i,
        |        unnest([CAST(ascii(substr(t, i, 1)) AS BIGINT) * 256 - 32768
        |                for i in range(1, len(t) + 1)]) AS smp
        |      FROM a),
        |fr AS (SELECT doc_id, n, (i - 1) // 64 AS frame_idx, i, smp,
        |         smp * 64 < sum(smp) OVER (PARTITION BY doc_id, (i - 1) // 64)
        |           AS neg
        |       FROM s),
        |fl AS (SELECT doc_id, n, frame_idx, smp, neg,
        |         lag(neg) OVER (PARTITION BY doc_id, frame_idx ORDER BY i)
        |           AS prev
        |       FROM fr)
        |SELECT doc_id AS media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(sum(smp * smp) AS BIGINT) AS energy,
        |  CAST(sum(CASE WHEN prev IS NOT NULL AND neg != prev
        |       THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        |FROM fl WHERE frame_idx < n // 64
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // replays the raster stride from the image synthesis: channel =
    // (pos−1) mod 3, bin = value div 64, counts grouped — while Spark
    // parses the P6 header and strides the actual raster bytes
    "q164_image_histogram" ->
      """WITH a AS (SELECT doc_id, rpad(substr(text, 1, 192), 192, ' ') AS p
        |           FROM documents WHERE doc_id % 3 = 0),
        |px AS (SELECT doc_id,
        |         unnest(range(1, 193)) AS pos,
        |         unnest([ascii(substr(p, i, 1)) for i in range(1, 193)]) AS v
        |       FROM a)
        |SELECT doc_id AS media_id,
        |  CAST((pos - 1) % 3 AS BIGINT) AS channel,
        |  CAST(v // 64 AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM px GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // replays the strided chunk arithmetic (every 4th complete 32-byte
    // chunk) and digests the same slice bytes — sha-256 agrees only if
    // Spark's offsets and slice bounds are exactly right
    "q165_frame_digests" ->
      """SELECT media_id, chunk_idx, digest FROM (
        |  SELECT doc_id AS media_id,
        |    CAST(unnest(range(0, len(text) // 32, 4)) AS BIGINT)
        |      AS chunk_idx,
        |    unnest([sha256(substr(text, ci * 32 + 1, 32))
        |            for ci in range(0, len(text) // 32, 4)]) AS digest
        |  FROM documents WHERE doc_id % 3 = 2 AND len(text) >= 32)
        |ORDER BY media_id, chunk_idx""".stripMargin,
    // q92's recursive-CTE transitive closure, re-used as the cluster
    // rep per doc; singletons (no qualifying pair) are their own rep,
    // split = rep % 10 — the whole near-dup-aware split replayed in
    // declarative SQL
    "q167_leakage_split" ->
      """WITH RECURSIVE
        |d AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(ws) >= 3
        |      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |            for i in range(1, len(ws) - 1)]
        |      ELSE [text] END) AS sh,
        |    CAST(floor(n_chars / 32.0) AS BIGINT) AS blk
        |  FROM (SELECT doc_id, text, n_chars,
        |          string_split(text, ' ') AS ws FROM documents)
        |), p AS MATERIALIZED (
        |  SELECT ai, bi FROM (
        |    SELECT a.doc_id AS ai, b.doc_id AS bi,
        |      round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |        4) AS jaccard
        |    FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |    UNION ALL
        |    SELECT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id),
        |      round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |        4)
        |    FROM d a JOIN d b ON a.blk + 1 = b.blk
        |  ) WHERE jaccard >= 0.8
        |), edges AS MATERIALIZED (
        |  SELECT ai AS a, bi AS b FROM p UNION ALL SELECT bi, ai FROM p
        |), reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT reach.a, edges.b FROM reach
        |  JOIN edges ON reach.b = edges.a
        |), rep AS MATERIALIZED (
        |  SELECT a AS doc_id, least(a, min(b)) AS cluster_rep
        |  FROM reach GROUP BY a
        |)
        |SELECT dd.doc_id,
        |  coalesce(rep.cluster_rep, dd.doc_id) AS cluster_rep,
        |  coalesce(rep.cluster_rep, dd.doc_id) % 10 AS split_id
        |FROM documents dd LEFT JOIN rep ON dd.doc_id = rep.doc_id
        |ORDER BY dd.doc_id""".stripMargin,
    // per-probe brute force + rank window replay of the prefix-index
    // search: top-5 by (jaccard DESC, neighbor ASC) among J >= 0.1
    "q170_jaccard_search" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(ws) >= 3
        |      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |            for i in range(1, len(ws) - 1)]
        |      ELSE [text] END) AS sh
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
        |        FROM documents)
        |), pairs AS MATERIALIZED (
        |  SELECT p.doc_id AS probe_id, o.doc_id AS neighbor_id,
        |    round(len(list_intersect(p.sh, o.sh))::DOUBLE /
        |          (len(p.sh) + len(o.sh) - len(list_intersect(p.sh, o.sh))),
        |          4) AS jaccard
        |  FROM d p JOIN d o ON o.doc_id <> p.doc_id
        |  WHERE p.doc_id % 10 = 0
        |), r AS MATERIALIZED (
        |  SELECT probe_id, neighbor_id, jaccard,
        |    CAST(row_number() OVER (PARTITION BY probe_id
        |      ORDER BY jaccard DESC, neighbor_id ASC) AS INTEGER) AS rk
        |  FROM pairs WHERE jaccard >= 0.1
        |)
        |SELECT probe_id, neighbor_id, jaccard, rk
        |FROM r WHERE rk <= 5
        |ORDER BY probe_id, rk""".stripMargin,
    // q64's scoring + the GLOBAL-window rank spelling the sharded
    // (offsets + partitioned row_number) plan must reproduce exactly;
    // the tertile is pure integer math on the rank
    "q171_perplexity_buckets" ->
      """WITH w AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents)
        |  WHERE w <> ''),
        |c AS (SELECT w, count(*) AS cnt FROM w GROUP BY w),
        |t AS (SELECT sum(cnt)::DOUBLE AS total FROM c),
        |scored AS (
        |  SELECT doc_id, round(avg(ln(cnt::DOUBLE / total)), 4) AS avg_logprob
        |  FROM w JOIN c USING (w), t
        |  GROUP BY doc_id),
        |n AS (SELECT count(*) AS n FROM scored),
        |r AS (
        |  SELECT doc_id, avg_logprob,
        |    row_number() OVER (ORDER BY avg_logprob DESC, doc_id) AS rnk
        |  FROM scored)
        |SELECT doc_id, avg_logprob,
        |  CASE WHEN (rnk - 1) * 3 < n THEN 'head' ELSE 'middle' END
        |    AS ppl_bucket
        |FROM r, n
        |WHERE (rnk - 1) * 3 < 2 * n
        |ORDER BY doc_id""".stripMargin,
    // the RAW-table spelling of the summary-routed aggregate: Spark
    // answers from the materialized summary, DuckDB from lineitem —
    // a hash match proves the MV rewrite value-exact (decimal sums
    // are associative, so re-aggregated partials equal raw sums)
    // avg_qty replays Spark's DECIMAL avg (half-up quotient at scale
    // 6, then decimal→double) with pure integer arithmetic: cents
    // total T, denominator d = 100·n, half-up = (2·T·10^6 + d)//(2·d),
    // and one exact IEEE division by 10^6 — bit-identical both engines
    "q172_summary_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
        |    AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
        |    4) AS sum_base,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*), 4) AS avg_price,
        |  CAST((2 * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100
        |              AS BIGINT) * 1000000 + 100 * count(*))
        |       // (2 * 100 * count(*)) AS DOUBLE) / 1000000.0 AS avg_qty,
        |  round(min(l_extendedprice), 4) AS min_price,
        |  round(max(l_extendedprice), 4) AS max_price
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-06-30'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // raw-table spelling of the month rollup the router answers from
    // the day-grain summary (derived grouping key — q37's month idiom)
    "q173_summary_monthly" ->
      """SELECT date_trunc('month', l_shipdate) AS month,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
        |    AS sum_qty,
        |  round(min(l_extendedprice), 4) AS min_price,
        |  round(max(l_extendedprice), 4) AS max_price
        |FROM lineitem
        |GROUP BY month
        |ORDER BY month""".stripMargin,
    // q132's bottom-k replay, per returnflag: the routed KMV estimate
    // must equal the raw rebuild (merged per-grain bottom-64 IS the
    // group's bottom-64)
    "q174_summary_kmv" ->
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag,
        |    ((l_suppkey % 1000000007) * 2654435761) % 1000000007 AS hv
        |  FROM lineitem),
        |r AS (SELECT l_returnflag, hv,
        |        row_number() OVER (PARTITION BY l_returnflag
        |                           ORDER BY hv) AS rn
        |      FROM h),
        |c AS (SELECT l_returnflag, count(*) AS nh
        |      FROM h GROUP BY l_returnflag),
        |kth AS (SELECT l_returnflag, hv FROM r WHERE rn = 64),
        |n AS (SELECT l_returnflag, count(*) AS n_rows
        |      FROM lineitem GROUP BY l_returnflag)
        |SELECT n.l_returnflag, n.n_rows,
        |  CAST(CASE WHEN c.nh < 64 THEN c.nh
        |       ELSE CAST(63 AS BIGINT) * 1000000007 // kth.hv END
        |    AS BIGINT) AS approx_suppliers
        |FROM n JOIN c USING (l_returnflag) LEFT JOIN kth USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,
    // q60's shingle spelling + first-introducing-doc min + the exact
    // scaled-integer nearest ratio
    "q175_ngram_novelty" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(ws) >= 3
        |      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |            for i in range(1, len(ws) - 1)]
        |      ELSE [text] END) AS sh
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
        |        FROM documents)
        |), g AS (
        |  SELECT doc_id, unnest(sh) AS gram FROM d
        |), f AS (
        |  SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY gram
        |)
        |SELECT doc_id,
        |  count(*) AS n_grams,
        |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS novel_grams,
        |  CAST((2 * 10000 * sum(CASE WHEN first_doc = doc_id
        |          THEN 1 ELSE 0 END) + count(*)) // (2 * count(*))
        |    AS BIGINT) AS novelty_bp
        |FROM g JOIN f USING (gram)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    // q60's shingle spelling + per-gram first-day min + the window
    // cumsum the sharded prefix-sum must reproduce
    "q176_vocab_growth" ->
      """WITH d AS (
        |  SELECT doc_id // 100 AS day,
        |    list_distinct(CASE WHEN len(ws) >= 3
        |      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |            for i in range(1, len(ws) - 1)]
        |      ELSE [text] END) AS sh
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
        |        FROM documents)
        |), g AS (
        |  SELECT day, unnest(sh) AS w FROM d
        |), f AS (SELECT w, min(day) AS day FROM g GROUP BY w),
        |p AS (SELECT day, count(*) AS new_terms FROM f GROUP BY day)
        |SELECT day, new_terms,
        |  CAST(sum(new_terms) OVER (ORDER BY day) AS BIGINT) AS cum_vocab
        |FROM p
        |ORDER BY day""".stripMargin,
    // the raw-table spelling of the join-routed aggregate: DuckDB
    // joins lineitem⋈orders and aggregates from scratch; the engine
    // answers from the joined summary — hash equality proves the
    // join-aware rewrite value-exact
    "q177_summary_join" ->
      """SELECT o_orderpriority, l_returnflag,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
        |    AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
        |    4) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_returnflag <> 'N'
        |GROUP BY o_orderpriority, l_returnflag
        |ORDER BY o_orderpriority, l_returnflag""".stripMargin,
    // raw-table ROLLUP replay: DuckDB recomputes every grouping-set
    // level from lineitem; the engine answered all levels from the
    // summary via the Expand rewrite — null-marked subtotal rows and
    // the grand total are part of the hash
    // the star replay: raw 3-way join; avg_qty uses q172's integer
    // half-up spelling of Spark's decimal avg
    "q182_summary_star" ->
      """SELECT c_mktsegment, l_returnflag,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
        |    AS sum_qty,
        |  CAST((2 * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100
        |              AS BIGINT) * 1000000 + 100 * count(*))
        |       // (2 * 100 * count(*)) AS DOUBLE) / 1000000.0 AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |             AS DOUBLE), 4) AS sum_price
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment <> 'MACHINERY'
        |GROUP BY c_mktsegment, l_returnflag
        |ORDER BY c_mktsegment, l_returnflag""".stripMargin,
    // the deep-star replay: DuckDB re-joins all SIX tables (incl. the
    // local-supplier cross-branch equality) from scratch; the engine
    // answered from the (n_name, r_name, o_orderdate) joined summary.
    // Revenue goes through the same double-product → decimal(18,4)
    // cast on both sides (the per-row 4-dp rational is recovered
    // exactly by either engine), so the sums compare bit-for-bit
    "q183_summary_star6" ->
      """SELECT n_name,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |                      AS DECIMAL(18,4))) AS DOUBLE), 4)
        |    AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN supplier ON s_nationkey = n_nationkey
        |JOIN lineitem ON l_suppkey = s_suppkey
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey
        |  AND c_nationkey = s_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    // exact-variance replay: l_quantity has 2 dp, so ×100 makes every
    // sum an exact HUGEINT; var = toDouble(n·Σx²−(Σx)²)/toDouble(den)
    // — the engine's ExactMoments does the same two double conversions
    // (scale ×10⁴ cancels between numerator and denominator)
    "q184_summary_variance" ->
      """WITH f AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(round(l_quantity * 100) AS HUGEINT) AS qi
        |  FROM lineitem
        |  WHERE l_shipdate <= TIMESTAMP '2000-06-30'),
        |a AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(count(*) AS HUGEINT) AS n,
        |    sum(qi) AS s, sum(qi * qi) AS q
        |  FROM f GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus,
        |  CAST(n AS BIGINT) AS n_rows,
        |  round(CAST(n * q - s * s AS DOUBLE)
        |    / CAST(10000 * n * (n - 1) AS DOUBLE), 4) AS var_qty,
        |  round(CAST(n * q - s * s AS DOUBLE)
        |    / CAST(10000 * n * n AS DOUBLE), 4) AS varp_qty,
        |  round(sqrt(CAST(n * q - s * s AS DOUBLE)
        |    / CAST(10000 * n * (n - 1) AS DOUBLE)), 4) AS sd_qty
        |FROM a
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // the delta demo's base ∪ appended tail is exactly lineitem, so
    // the compensated answer replays as the full-table aggregate
    // (avg_qty: the same scaled-integer half-even quotient replay as
    // q172's decimal AVG)
    "q185_summary_delta" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
        |    AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
        |    4) AS sum_base,
        |  CAST((2 * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100
        |              AS BIGINT) * 1000000 + 100 * count(*))
        |       // (2 * 100 * count(*)) AS DOUBLE) / 1000000.0 AS avg_qty,
        |  round(min(l_extendedprice), 4) AS min_price,
        |  round(max(l_extendedprice), 4) AS max_price
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // base ∪ appended tails = exactly lineitem and orders, so the
    // two-leaf compensated answer replays as the raw full join
    // (avg_qty: the q185 scaled-integer half-even quotient replay)
    "q187_summary_delta_join" ->
      """SELECT o_orderpriority, l_returnflag,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
        |    AS sum_qty,
        |  CAST((2 * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100
        |              AS BIGINT) * 1000000 + 100 * count(*))
        |       // (2 * 100 * count(*)) AS DOUBLE) / 1000000.0 AS avg_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority, l_returnflag
        |ORDER BY o_orderpriority, l_returnflag""".stripMargin,
    // the sketch replays in full: DISTINCT (pri, v) pairs, bottom-256
    // by (pri, v), then nearest-rank selection over the value-sorted
    // sample — the same portable Knuth hash both engines compute in
    // exact int64 arithmetic (operands stay < 2^62)
    "q189_summary_quantile_sketch" ->
      """WITH h AS (
        |  SELECT l_returnflag AS flag,
        |    (l_orderkey * 10 + l_linenumber) % 1000000007
        |      * 2654435761 % 1000000007 AS pri,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS v
        |  FROM lineitem),
        |d AS (SELECT DISTINCT flag, pri, v FROM h),
        |s AS (SELECT flag, pri, v,
        |        row_number() OVER (PARTITION BY flag ORDER BY pri, v)
        |          AS rn
        |      FROM d),
        |kk AS (SELECT flag, pri, v FROM s WHERE rn <= 256),
        |r AS (SELECT flag, v,
        |        row_number() OVER (PARTITION BY flag ORDER BY v, pri)
        |          AS rv,
        |        count(*) OVER (PARTITION BY flag) AS m
        |      FROM kk),
        |n AS (SELECT l_returnflag AS flag, count(*) AS n_rows
        |      FROM lineitem GROUP BY 1)
        |SELECT n.flag AS l_returnflag, n.n_rows,
        |  MAX(CASE WHEN rv = CAST(ceil(0.5 * m) AS BIGINT) THEN v END)
        |    AS p50_cents,
        |  MAX(CASE WHEN rv = CAST(ceil(0.9 * m) AS BIGINT) THEN v END)
        |    AS p90_cents,
        |  MAX(CASE WHEN rv = CAST(ceil(0.99 * m) AS BIGINT) THEN v END)
        |    AS p99_cents
        |FROM r JOIN n ON r.flag = n.flag
        |GROUP BY n.flag, n.n_rows
        |ORDER BY n.flag""".stripMargin,
    "q190_summary_best_match" ->
      """SELECT l_linestatus,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
        |    4) AS sum_base,
        |  round(min(l_extendedprice), 4) AS min_price,
        |  round(max(l_extendedprice), 4) AS max_price
        |FROM lineitem
        |WHERE l_quantity > 35
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    // the fixture deletes exactly the l_orderkey%10=7 file, so the
    // compensated answer replays as the raw aggregate over the
    // surviving predicate slice (avg_qty: the q185 scaled-integer
    // half-even quotient replay)
    "q191_summary_delete_comp" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
        |    AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
        |    4) AS sum_base,
        |  CAST((2 * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100
        |              AS BIGINT) * 1000000 + 100 * count(*))
        |       // (2 * 100 * count(*)) AS DOUBLE) / 1000000.0 AS avg_qty
        |FROM lineitem
        |WHERE l_orderkey % 10 <> 7
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // the DDL-created summary routes value-preserving reads, so the
    // oracle is the same aggregate over raw lineitem
    "q193_summary_sql_ddl" ->
      """SELECT l_linenumber, l_linestatus,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
        |    AS sum_qty,
        |  round(min(l_extendedprice), 4) AS min_price
        |FROM lineitem
        |GROUP BY l_linenumber, l_linestatus
        |ORDER BY l_linenumber, l_linestatus""".stripMargin,
    // the sort-clustered copy is a LAYOUT choice (rows move between
    // files, none change), so the oracle is the same range-slice
    // report over raw lineitem
    "q194_sorted_scan" ->
      """SELECT l_returnflag,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
        |    AS sum_qty,
        |  round(min(l_extendedprice), 4) AS min_price
        |FROM lineitem
        |WHERE l_orderkey >= 1000 AND l_orderkey < 3000
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // the z-ordered copy is a LAYOUT choice too: same oracle shape as
    // q194 with the 2-D box
    "q195_zorder_scan" ->
      """SELECT l_returnflag,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
        |    AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey >= 1000 AND l_orderkey < 3000
        |  AND l_partkey >= 100 AND l_partkey < 500
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // the rebless fixture is a byte-reshuffled full copy of lineitem,
    // so the post-rebless routed answer replays as the raw aggregate
    "q192_summary_rebless" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
        |    AS sum_qty,
        |  round(min(l_extendedprice), 4) AS min_price,
        |  round(max(l_extendedprice), 4) AS max_price
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q188_summary_filtered" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
        |    4) AS sum_base,
        |  round(min(l_extendedprice), 4) AS min_price,
        |  round(max(l_extendedprice), 4) AS max_price
        |FROM lineitem
        |WHERE l_quantity > 35
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q186_bucketed_join" ->
      """SELECT o_orderpriority,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
        |    AS sum_qty,
        |  round(min(l_extendedprice), 4) AS min_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q181_summary_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS flag,
        |  coalesce(l_linestatus, '(all)') AS status,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
        |    AS sum_qty,
        |  round(min(l_extendedprice), 4) AS min_price,
        |  round(max(l_extendedprice), 4) AS max_price
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,
    // percentile-over-join replay: the engine answered from the
    // joined histogram summary; DuckDB joins and sorts from scratch
    "q180_summary_join_percentiles" ->
      """SELECT o_orderpriority,
        |  count(*) AS n_rows,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        |  round(min(l_quantity), 4) AS min_qty,
        |  round(max(l_quantity), 4) AS max_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // raw-table percentile replay: quantile_cont is the same
    // rank-(n-1)p linear interpolation as Spark's exact percentile,
    // and the engine answered from the 150-row histogram summary
    "q179_summary_percentiles" ->
      """SELECT l_returnflag,
        |  count(*) AS n_rows,
        |  CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_qty,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  round(quantile_cont(l_quantity, 0.95), 4) AS p95_qty,
        |  round(min(l_quantity), 4) AS min_qty,
        |  round(max(l_quantity), 4) AS max_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // identical raw-table SQL as q177: the engine's answer went
    // through partial build + incremental refresh instead of a
    // one-shot build, and must land on the same hashes
    "q178_summary_join_refresh" ->
      """SELECT o_orderpriority, l_returnflag,
        |  count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4)
        |    AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
        |    4) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_returnflag <> 'N'
        |GROUP BY o_orderpriority, l_returnflag
        |ORDER BY o_orderpriority, l_returnflag""".stripMargin,
    // q60's brute force over the WHOLE corpus, verbatim: the
    // multi-day union finds each qualifying pair exactly once, on the
    // day its later-arriving endpoint lands
    "q168_multiday_neardup" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(ws) >= 3
        |      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |            for i in range(1, len(ws) - 1)]
        |      ELSE [text] END) AS sh
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
        |        FROM documents)
        |)
        |SELECT ai, bi, jaccard FROM (
        |  SELECT a.doc_id AS ai, b.doc_id AS bi,
        |    round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |          4) AS jaccard
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id
        |)
        |WHERE jaccard >= 0.8
        |ORDER BY ai, bi""".stripMargin,
    // q42's recursive-CTE closure + q30's floored quality formula +
    // a per-cluster (quality DESC, doc_id ASC) argmax window — the
    // quality-aware keep decision replayed declaratively
    "q169_keepbest_curation" ->
      """WITH RECURSIVE
        |d AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(ws) >= 3
        |      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |            for i in range(1, len(ws) - 1)]
        |      ELSE [text] END) AS sh,
        |    CAST(floor(n_chars / 32.0) AS BIGINT) AS blk
        |  FROM (SELECT doc_id, text, n_chars,
        |          string_split(text, ' ') AS ws FROM documents)
        |), p AS MATERIALIZED (
        |  SELECT ai, bi FROM (
        |    SELECT a.doc_id AS ai, b.doc_id AS bi,
        |      round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |        4) AS jaccard
        |    FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |    UNION ALL
        |    SELECT least(a.doc_id, b.doc_id), greatest(a.doc_id, b.doc_id),
        |      round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |        (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |        4)
        |    FROM d a JOIN d b ON a.blk + 1 = b.blk
        |  ) WHERE jaccard >= 0.8
        |), edges AS MATERIALIZED (
        |  SELECT ai AS a, bi AS b FROM p UNION ALL SELECT bi, ai FROM p
        |), reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT reach.a, edges.b FROM reach
        |  JOIN edges ON reach.b = edges.a
        |), rep AS MATERIALIZED (
        |  SELECT a AS doc_id, least(a, min(b)) AS cluster_rep
        |  FROM reach GROUP BY a
        |), q AS MATERIALIZED (
        |  SELECT doc_id,
        |    floor((0.4 * least(len(list_filter(ws, w -> w IN ('the', 'a')))::DOUBLE
        |                       / len(ws) * 8, 1.0) +
        |           0.3 * least(len(ws)::DOUBLE / 100, 1.0) +
        |           0.3 * (len(list_distinct(ws))::DOUBLE / len(ws)))
        |          * 10000 + 0.5) / 10000 AS quality
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |), c AS MATERIALIZED (
        |  SELECT rep.doc_id, rep.cluster_rep, q.quality,
        |    row_number() OVER (PARTITION BY rep.cluster_rep
        |                       ORDER BY q.quality DESC, rep.doc_id ASC)
        |      AS rn
        |  FROM rep JOIN q ON rep.doc_id = q.doc_id
        |)
        |SELECT doc_id, cluster_rep, quality, rn = 1 AS kept
        |FROM c
        |ORDER BY doc_id""".stripMargin,
    // q60's blocking-free brute force restricted to batch-touching
    // pairs (ai or bi ≡ 0 mod 5) — the incremental merge is exact, so
    // the one-shot oracle replays it under the batch filter
    "q166_incremental_neardup" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(ws) >= 3
        |      THEN [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |            for i in range(1, len(ws) - 1)]
        |      ELSE [text] END) AS sh
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS ws
        |        FROM documents)
        |)
        |SELECT ai, bi, jaccard FROM (
        |  SELECT a.doc_id AS ai, b.doc_id AS bi,
        |    round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))),
        |          4) AS jaccard
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id
        |   AND (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)
        |)
        |WHERE jaccard >= 0.8
        |ORDER BY ai, bi""".stripMargin,
    // q155's analytic-blocks oracle at the hub-star block length: the
    // engine resolves each 400-key star through the sorted-run loop;
    // components are the blocks either way
    "q162_components_hubstar" ->
      """WITH n AS (
        |  SELECT c_custkey AS node,
        |    c_custkey // 400 AS blk
        |  FROM customer),
        |s AS (
        |  SELECT blk, min(node) AS component,
        |    CAST(count(*) AS BIGINT) AS component_size
        |  FROM n GROUP BY blk)
        |SELECT node, component, component_size
        |FROM n JOIN s USING (blk)
        |ORDER BY node""".stripMargin,
    // replays the 8×8 → 4×4 nearest-neighbor sampling from the image
    // SYNTHESIS: target pixel (k DIV 4, k % 4) reads source pixel
    // (2·row, 2·col) → char position ((2·row·8 + 2·col)·3 + channel)
    // of the padded raster string — while Spark parses, resizes, and
    // re-encodes the actual P6 bytes
    "q160_image_resize" ->
      """SELECT doc_id AS media_id, 4 AS width, 4 AS height,
        |  round(list_aggregate(
        |    [ascii(substr(p, ((k // 4) * 2 * 8 + (k % 4) * 2) * 3 + 1, 1))
        |     for k in range(0, 16)], 'avg'), 4) AS mean_r,
        |  round(list_aggregate(
        |    [ascii(substr(p, ((k // 4) * 2 * 8 + (k % 4) * 2) * 3 + 2, 1))
        |     for k in range(0, 16)], 'avg'), 4) AS mean_g,
        |  round(list_aggregate(
        |    [ascii(substr(p, ((k // 4) * 2 * 8 + (k % 4) * 2) * 3 + 3, 1))
        |     for k in range(0, 16)], 'avg'), 4) AS mean_b
        |FROM (SELECT doc_id, rpad(substr(text, 1, 192), 192, ' ') AS p
        |      FROM documents WHERE doc_id % 3 = 0)
        |ORDER BY media_id""".stripMargin,
    // Page's CUSUM via its closed form S = P − min(0, min prefix P):
    // (μ, σ) from the SAME exact integer moments in the same IEEE
    // expression order, every crossing value rounded by the explicit
    // floor(x·1e6 + 0.5)/1e6 spelling (no round() tie semantics)
    "q159_cusum_changepoint" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(n_events) AS BIGINT) AS sx,
        |    CAST(sum(n_events * n_events) AS BIGINT) AS sxx
        |  FROM d),
        |z AS (
        |  SELECT day, n_events,
        |    floor((CAST(n_events AS DOUBLE) - CAST(sx AS DOUBLE) / n)
        |      / sqrt((CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
        |        / (n - 1)) * 1000000.0 + 0.5) / 1000000.0 AS z
        |  FROM d, m),
        |p AS (
        |  SELECT day, n_events, z,
        |    sum(z - 0.5) OVER (ORDER BY day) AS pu,
        |    sum(-z - 0.5) OVER (ORDER BY day) AS pd
        |  FROM z),
        |c AS (
        |  SELECT day, n_events, z,
        |    floor((pu - min(least(pu, 0.0)) OVER (ORDER BY day))
        |      * 1000000.0 + 0.5) / 1000000.0 AS cusum_up,
        |    floor((pd - min(least(pd, 0.0)) OVER (ORDER BY day))
        |      * 1000000.0 + 0.5) / 1000000.0 AS cusum_down
        |  FROM p)
        |SELECT day, n_events, z, cusum_up, cusum_down,
        |  (cusum_up > 4.0 OR cusum_down > 4.0) AS alarm
        |FROM c
        |ORDER BY day""".stripMargin,
    // character windows at stride 16 replayed verbatim (the Spark side
    // groups on the same raw 32-char window strings — see the
    // substringDedup scaladoc for the hashed 100 TB spelling)
    "q158_substring_dedup" ->
      """WITH w AS (
        |  SELECT doc_id, substr(text, u.p, 32) AS win
        |  FROM documents, unnest(range(1, len(text) - 30, 16)) AS u(p)
        |  WHERE len(text) >= 32),
        |d AS (
        |  SELECT win FROM w GROUP BY win
        |  HAVING count(DISTINCT doc_id) > 1)
        |SELECT w.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_windows,
        |  CAST(coalesce(sum(CASE WHEN d.win IS NOT NULL THEN 1 ELSE 0
        |    END), 0) AS BIGINT) AS n_dup_windows
        |FROM w LEFT JOIN d ON w.win = d.win
        |GROUP BY w.doc_id
        |ORDER BY doc_id""".stripMargin,
    // merged components = 1200-blocks of the dense key space (a tail
    // half-block with no bridge keeps its half component, which the
    // 1200-grouping yields too — see incrementalChainComponents)
    "q157_incremental_components" ->
      """WITH n AS (
        |  SELECT c_custkey AS node,
        |    c_custkey // 1200 AS blk
        |  FROM customer),
        |s AS (
        |  SELECT blk, min(node) AS component,
        |    CAST(count(*) AS BIGINT) AS component_size
        |  FROM n GROUP BY blk)
        |SELECT node, component, component_size
        |FROM n JOIN s USING (blk)
        |ORDER BY node""".stripMargin,
    "q155_connected_components" ->
      """WITH n AS (
        |  SELECT c_custkey AS node,
        |    c_custkey // 1000 AS blk
        |  FROM customer),
        |s AS (
        |  SELECT blk, min(node) AS component,
        |    CAST(count(*) AS BIGINT) AS component_size
        |  FROM n GROUP BY blk)
        |SELECT node, component, component_size
        |FROM n JOIN s USING (blk)
        |ORDER BY node""".stripMargin,
    // the full training replay: q54's bucket hash → per-doc share
    // vectors → 6 dp μ/σ standardization → five unrolled GD steps
    // (each avg-gradient rounded 6 dp) → confusion matrix. Margins
    // measured at all three SFs: |p−0.5| ≥ 2.6e-5, gradient distance
    // to its rounding boundary ≥ 7e-10 — both far above cross-engine
    // exp/summation noise.
    "q156_text_classifier" ->
      """WITH tf AS MATERIALIZED (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(7::BIGINT, [ascii(c) for c in string_split(w, '')]),
        |      (acc, c) -> (acc * 31 + c) % 1000000007) % 16 AS bucket,
        |    count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  WHERE w <> '' GROUP BY doc_id, bucket),
        |dm AS MATERIALIZED (SELECT doc_id, map(list(bucket), list(tf)) AS m,
        |         sum(tf) AS tot FROM tf GROUP BY doc_id),
        |lab AS MATERIALIZED (SELECT doc_id,
        |          CASE WHEN len(list_filter(string_split(text, ' '),
        |                 w -> w IN ('the', 'a'))) * 100 >=
        |               len(string_split(text, ' ')) * 8
        |            THEN 1 ELSE 0 END AS y
        |        FROM documents),
        |raw AS MATERIALIZED (SELECT l.doc_id, l.y,
        |          list_prepend(1.0,
        |            [coalesce(map_extract(m, j)[1], 0)::DOUBLE / tot
        |             for j in range(0, 16)]) AS x
        |        FROM lab l JOIN dm USING (doc_id)),
        |st AS MATERIALIZED (SELECT pos, round(avg(xj), 6) AS mu,
        |         round(stddev_pop(xj), 6) AS sd
        |       FROM (SELECT unnest(x) AS xj,
        |               unnest(range(1, len(x) + 1)) AS pos FROM raw)
        |       WHERE pos > 1 GROUP BY pos),
        |sv AS MATERIALIZED (SELECT list(mu ORDER BY pos) AS mus,
        |         list(greatest(sd, 0.000001) ORDER BY pos) AS sds
        |       FROM st),
        |e AS MATERIALIZED (SELECT y,
        |        list_prepend(1.0,
        |          list_transform(list_zip(x[2:], sv.mus, sv.sds),
        |            t -> (t[1] - t[2]) / t[3])) AS x
        |      FROM raw, sv),
        |g1 AS MATERIALIZED (SELECT pos, round(avg(xj * (0.5 - y)), 6) AS g
        |       FROM (SELECT unnest(x) AS xj,
        |               unnest(range(1, len(x) + 1)) AS pos, y FROM e)
        |       GROUP BY pos),
        |w1 AS MATERIALIZED (SELECT list(0.0 - g ORDER BY pos) AS w FROM g1),
        |r2 AS MATERIALIZED (SELECT x, y,
        |         1/(1 + exp(-list_dot_product(x, (SELECT w FROM w1)))) - y
        |           AS r FROM e),
        |g2 AS MATERIALIZED (SELECT pos, round(avg(xj * r), 6) AS g
        |       FROM (SELECT unnest(x) AS xj,
        |               unnest(range(1, len(x) + 1)) AS pos, r FROM r2)
        |       GROUP BY pos),
        |w2 AS MATERIALIZED (SELECT list(wv - g ORDER BY pos) AS w
        |       FROM (SELECT unnest(w) AS wv,
        |               unnest(range(1, len(w) + 1)) AS pos FROM w1)
        |       JOIN g2 USING (pos)),
        |r3 AS MATERIALIZED (SELECT x, y,
        |         1/(1 + exp(-list_dot_product(x, (SELECT w FROM w2)))) - y
        |           AS r FROM e),
        |g3 AS MATERIALIZED (SELECT pos, round(avg(xj * r), 6) AS g
        |       FROM (SELECT unnest(x) AS xj,
        |               unnest(range(1, len(x) + 1)) AS pos, r FROM r3)
        |       GROUP BY pos),
        |w3 AS MATERIALIZED (SELECT list(wv - g ORDER BY pos) AS w
        |       FROM (SELECT unnest(w) AS wv,
        |               unnest(range(1, len(w) + 1)) AS pos FROM w2)
        |       JOIN g3 USING (pos)),
        |r4 AS MATERIALIZED (SELECT x, y,
        |         1/(1 + exp(-list_dot_product(x, (SELECT w FROM w3)))) - y
        |           AS r FROM e),
        |g4 AS MATERIALIZED (SELECT pos, round(avg(xj * r), 6) AS g
        |       FROM (SELECT unnest(x) AS xj,
        |               unnest(range(1, len(x) + 1)) AS pos, r FROM r4)
        |       GROUP BY pos),
        |w4 AS MATERIALIZED (SELECT list(wv - g ORDER BY pos) AS w
        |       FROM (SELECT unnest(w) AS wv,
        |               unnest(range(1, len(w) + 1)) AS pos FROM w3)
        |       JOIN g4 USING (pos)),
        |r5 AS MATERIALIZED (SELECT x, y,
        |         1/(1 + exp(-list_dot_product(x, (SELECT w FROM w4)))) - y
        |           AS r FROM e),
        |g5 AS MATERIALIZED (SELECT pos, round(avg(xj * r), 6) AS g
        |       FROM (SELECT unnest(x) AS xj,
        |               unnest(range(1, len(x) + 1)) AS pos, r FROM r5)
        |       GROUP BY pos),
        |w5 AS MATERIALIZED (SELECT list(wv - g ORDER BY pos) AS w
        |       FROM (SELECT unnest(w) AS wv,
        |               unnest(range(1, len(w) + 1)) AS pos FROM w4)
        |       JOIN g5 USING (pos))
        |SELECT y, CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS pred,
        |  count(*) AS n, round(avg(p), 4) AS avg_p
        |FROM (SELECT y,
        |        1/(1 + exp(-list_dot_product(x, (SELECT w FROM w5))))
        |          AS p FROM e)
        |GROUP BY y, pred
        |ORDER BY y, pred""".stripMargin
  )
}

/** The query catalog: named, reusable builders over the testdata
  * tables. Kept separate from the SparkEntry contract so library users
  * can call them directly.
  */
object Queries {

  /** A1+O1+O2 (SURVEY §2.4, §2.6): hash group-by multi-agg + ordinal
    * sort desc + LIMIT — the reference's cell-8 query shape
    * (README.md:210-222). Partial+final hash aggregation and
    * TakeOrderedAndProject are Catalyst built-ins; at 100 TB this is a
    * single shuffle on event_type (5 groups → map-side combine does
    * almost all the work).
    */
  def eventsTopK(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(
        round(sum("value"), 4).as("total_value"),
        round(avg("value"), 4).as("avg_value"),
        round(min("value"), 4).as("min_value"),
        round(max("value"), 4).as("max_value"),
        count(lit(1)).as("n_events"))
      .orderBy(desc("total_value"), asc("event_type"))
      .limit(20)
}
