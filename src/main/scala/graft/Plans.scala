package graft

import java.nio.file.{Files, Paths}

/** Dumps formatted physical plans of representative queries to
  * PLANS.md — the "is this the plan you'd want" evidence: pushed
  * filters, pruned read schemas, broadcast exchanges, codegen spans.
  * Run: `sbt "runMain graft.Plans"` (writes /root/repo/PLANS.md).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(4)
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val picks = Seq(
      "q01_events_topk" -> "scan → partial/final agg → TakeOrderedAndProject",
      "q02_scan_prune_filter" -> "filter + projection pushed to parquet",
      "q13_star_join_revenue" -> "fact-fact shuffle join + 3 broadcast dims",
      "q22_exact_dedup" -> "content-hash group-by (hashes cross the shuffle)",
      "q23_minhash_pairs" -> "LSH band self-join + early-exit merge-walk verification",
      "q26_cosine_topk" -> "codegen'd dot_product kernel in the scan stage",
      "q38_asof_join" -> "as-of join as union + single-shuffle window",
      "q47_token_packing" -> "sharded two-pass prefix sum — no single-partition window",
      "q50_embedding_pairs_blocked" -> "grid-blocked exact pair join: equality joins on the block-pair cell, no BroadcastNestedLoopJoin",
      "q51_quality_quartile" -> "5-row percentile agg broadcast onto the scoring scan",
      "q52_mixture_sample" -> "mixture sampling as a stateless scan predicate",
      "q53_topk_agg" -> "bounded topk_rows aggregate — partial top-k before the exchange, no window sort",
      "q55_quantized_topk" -> "int8 codes + integer dot products — bit-portable cosine ranking",
      "q58_corpus_manifest" -> "sample+scrub+chunk fused: one FileScan, one exchange",
      "q60_prefix_jaccard_pairs" -> "df-ordered prefix filter over an inverted index — equality joins only (PPJoin family)",
      "q61_first_events" -> "argmin as one struct-min aggregate (map-side partial min, no window sort)",
      "q62_bloom_contamination" -> "codegen'd bloom probe fused into the corpus scan + exact verify join",
      "q65_length_cdf" -> "cume_dist respelled: NDV-sized counts → sharded prefix sum → broadcast join (no corpus-wide window)",
      "q66_repetition_stats" -> "bigram_mode_count kernel fused into the scan — no Generate, no aggregation exchange",
      "q70_dup_spans" -> "span-level dedup: sha2 span keys shuffle, distinct-doc count + semi-join back",
      "q71_hashed_tfidf" -> "bucket-sized df broadcast onto the single tf exchange",
      "q72_label_centroids" -> "vector mean as one mergeable O(dim) aggregate — explode only above the agg",
      "q73_interleave" -> "round-robin epoch order: one rank window + arithmetic position, no global sort",
      "q84_large_orders" -> "HAVING aggregate on the fact key, survivor set joins back, top-100 as TakeOrderedAndProject",
      "q88_priority_waiting" -> "EXISTS as a left-semi hash join with the date residual",
      "q94_merge_manifest" -> "manifest MERGE: full-outer join on content hash — pre-aggregated hashes shuffle, never bodies",
      "q96_percentiles_distributed" -> "exact percentiles without collect_list: fixed-point counts → sharded prefix sum → broadcast rank probes",
      "q99_corpus_admission" -> "ingest gate fused into the scan + first-occurrence argmin on sha2",
      "q102_volume_shipping" -> "Q7 shape: one fact-fact shuffle on orderkey, every dim a broadcast, nation-pair predicate on broadcast columns",
      "q106_order_distribution" -> "Q13 shape: outer-join-then-count keeps zero-order customers; second agg reduces to a histogram",
      "q107_top_supplier" -> "Q15 shape: =max scalar subquery as a 1-row broadcast over the supplier-NDV revenue view",
      "q108_recordstream" -> "DSv2 BatchScan of TFRecord-framed gzip record files — per-file partitions, pruned read schema",
      "q109_sliding_windows" -> "overlapping windows expanded inside the aggregate — no self-union pass",
      "q119_waiting_supplier" -> "Q21 shape: both existentials folded into a two-level orderkey aggregate — one fact shuffle, no Expand, broadcast dim",
      "q121_part_supplier_counts" -> "Q16 shape: broadcast dims prune the fact before its only shuffle; distinct-then-count, no Expand",
      "q124_logreg_gd" -> "trained-model apply pass: σ(w·x) against broadcast weight literals, confusion-matrix aggregate — the per-iteration gradient plan has the same scan+posexplode+partial-agg shape",
      "q126_naive_bayes" -> "NB apply: vocab-keyed pivoted model broadcast onto one exploded-corpus pass; argmax as a codegen'd array_min over (−score, lang) structs",
      "q133_sample_quantiles" -> "bottom-k quantile sketch: mergeable topk_rows sample off one scan, rank selection inside ≤k-row partitioned windows",
      "q135_join_card" -> "F2 join-size estimate: exact Σc² and the 1-in-64 hash-sampled twin in one NDV-sized aggregate",
      "q137_locf_fill" -> "LOCF densification: generated spine × map-side-reduced fact, segment-partitioned carry-forward window",
      "q139_pmi_pairs" -> "PMI collocations: doc-bounded lag windows, NDV-sized count shuffles, 1-row totals broadcast",
      "q141_chi_square" -> "chi-square on a generated type×hour spine — marginals broadcast, empty cells carry expected mass",
      "q143_bm25_topk" -> "BM25: tokenize once for lengths+tfs, df/total broadcasts, pruned scoring, TakeOrderedAndProject top-k",
      "q144_rank_fusion" -> "RRF hybrid retrieval: two parameter-sized ranked lists full-outer merged — rank windows over ≤50 rows, never a corpus",
      "q158_substring_dedup" -> "character-grain duplication profile: in-row window generation (transform+explode inside codegen), two window-key shuffles, doc-grain aggregate",
      "q34_media_features" -> "real RIFF/WAVE decode: typed mapPartitions batch pass over the synthesized payload projection — one scan, no shuffle before the report sort",
      "q166_incremental_neardup" -> "incremental near-dup merge: today's batch shingled once, prefix-joined against the PERSISTED index by token equality — corpus text never re-read, no BroadcastNestedLoopJoin",
      "q169_keepbest_curation" -> "quality-aware keep: cluster-graph-sized argmax (max_by on a (quality, -id) struct) joined back — the corpus is touched only by the pair pipeline's scan",
      "q171_perplexity_buckets" -> "rank-exact perplexity tertiles with NO corpus-wide sort: broadcast per-score offsets + score-PARTITIONED row_number window")
    val out = new StringBuilder
    out ++= "# PLANS — formatted physical plans of representative queries\n\n"
    out ++= "Generated by `graft.Plans` at sf0.001. What to look for is\n"
    out ++= "noted per query; assertions live in PlanSpec.\n"
    def render(name: String, note: String,
        df: org.apache.spark.sql.DataFrame): Unit = {
      out ++= s"\n## $name — $note\n\n```\n"
      // collapse embedded binary literals (e.g. the q62 bloom sketch —
      // 128 KiB of hex) so the dump stays readable
      out ++= df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
        .replaceAll("0x[0-9A-Fa-f]{256,}", "0x<binary literal elided>")
      out ++= "\n```\n"
    }
    picks.foreach { case (name, note) =>
      render(name, note, SparkEntry.queries(name)(spark, sf))
    }
    // the ROUTED star plan needs its registration live (the q182
    // entry pins collected rows, whose plan is a LocalTableScan)
    operators.OlapQueries.registerStarSummary(spark, sf)
    try render("q182_summary_star (routed)",
      "3-table star answered from ONE summary scan: no joins, none of " +
        "customer/orders/lineitem in the plan; AVG re-expressed over " +
        "exact sum + non-null-count legs",
      operators.OlapQueries.summaryStarQuery(spark, sf))
    finally plans.Summaries.drop("li_ord_cust_star")
    operators.OlapQueries.registerLocalVolumeStarSummary(spark, sf)
    try render("q183_summary_star6 (routed)",
      "SIX-table TPC-H-Q5 star answered from ONE summary scan: no " +
        "joins, no fact table in the plan; the date-range and region " +
        "filters re-apply on grain columns of the summary",
      operators.OlapQueries.localVolumeStarQuery(spark, sf))
    finally plans.Summaries.drop("li_q5_star")
    // the DELTA-COMPENSATED read: summary scan UNION partial-agg over
    // only the appended files, merged at the grain — the raw base
    // files are absent from the plan
    operators.OlapQueries.registerDeltaDemo(spark, sf)
    try render("q185_summary_delta (routed, delta-compensated)",
      "append-only stale summary: the plan is merge(summary scan, " +
        "partial-agg(appended files only)) — base files never " +
        "re-read; grain filters push into BOTH union branches",
      operators.OlapQueries.deltaPricingQuery(spark, sf))
    finally plans.Summaries.drop(
      operators.OlapQueries.deltaDemoName(sf))
    // the TWO-LEAF compensated joined read: summary scan UNION
    // partial-agg over the telescoped delta terms (Δli⋈ord₀ +
    // (li₀+Δli)⋈Δord), every leaf read pinned to explicit file lists
    operators.OlapQueries.registerDeltaJoinDemo(spark, sf)
    try render("q187_summary_delta_join (routed, two-leaf compensated)",
      "fact AND dim appended in one window: merge(summary scan, " +
        "partial-agg(Δli⋈ord₀ ∪ (li₀+Δli)⋈Δord)) — each term " +
        "carries a small delta side the planner broadcasts",
      operators.OlapQueries.deltaJoinQuery(spark, sf))
    finally plans.Summaries.drop(
      operators.OlapQueries.deltaJoinDemoName(sf))
    // the FILTERED summary: a strictly-stronger query predicate
    // routes through the subsumption gate, then re-applies on the
    // summary's grain rows
    operators.OlapQueries.registerFilteredSummary(spark, sf)
    try render("q188_summary_filtered (routed via subsumption)",
      "summary declared WHERE l_quantity > 30, query filters > 35: " +
        "one summary scan, the query's own filter re-applied on " +
        "grain columns — the raw table is absent",
      operators.OlapQueries.summaryFilteredQuery(spark, sf))
    finally plans.Summaries.drop("lineitem_hiqty")
    // the QUANTILE-SKETCH measure: nearest-rank estimates off stored
    // bottom-k pair states — one summary scan, quantile_sketch_union
    // in the aggregate, no raw rows
    operators.OlapQueries.registerQskSummary(spark, sf)
    try render("q189_summary_quantile_sketch (routed)",
      "approximate percentiles on a grain WITHOUT the value column: " +
        "quantile_sketch_est rewritten to quantile_sketch_union over " +
        "the stored per-grain sketch states — lossless merge, so " +
        "routed ≡ raw at any p",
      operators.OlapQueries.qskQuery(spark, sf))
    finally plans.Summaries.drop("lineitem_qsk")
    // the persisted IVF index: the probe's cell predicate enforced in
    // PartitionFilters — non-probed cell directories pruned from
    // metadata alone
    render("q28_ivf_topk (persisted index, partition-pruned probe)",
      "cell=<id>/ Hive-partitioned index written once; the probe " +
        "scan carries the cell IN-list in PartitionFilters and opens " +
        "nProbe/numCells of the files",
      operators.Similarity.ivfTopKIndexed(spark, sf))
    Files.writeString(Paths.get("/root/repo/PLANS.md"), out.toString)
    println(s"wrote PLANS.md (${out.length} chars)")
    spark.stop()
  }
}
