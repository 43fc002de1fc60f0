package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Analytics, Behavior, Clustering, Corpus, Dedup, Embeddings, EventWindows, Graph, IncrementalAgg, Ingestion, Kpi, Multimodal, OrderBookOps, Packing, Relational, Sampling, Scale, Similarity, Sketches, Temporal, TextOps}
import graft.streaming.{DensitySignals, FraudDetection, PositionTracker, SpoofingDetector, WireIngest}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator row from SURVEY.md §2
  * re-expressed Spark-first; [[oracleSql]] carries the DuckDB-equivalent
  * ANSI SQL the driver hash-compares against. Column names and value
  * determinism are part of the contract (see Relational's notes).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5RegionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"  -> (Relational.q1PricingSummary(_, _)),
    "q6_filtered_revenue" -> (Relational.q6FilteredRevenue(_, _)),
    "q5_region_revenue"   -> (Relational.q5RegionRevenue(_, _)),
    "q_anti_join"         -> (Relational.qAntiJoin(_, _)),
    "q_semi_join"         -> (Relational.qSemiJoin(_, _)),
    "q_broadcast_enrich"  -> (Relational.qBroadcastEnrich(_, _)),
    "q_order_customer"    -> (Relational.qOrderCustomer(_, _)),
    "q_running_drawdown"  -> (Relational.qRunningMaxDrawdown(_, _)),
    "q_topn_per_key"      -> (Relational.qTopNPerKey(_, _)),
    "q_sort_limit"        -> (Relational.qSortLimit(_, _)),
    "q_tagged_union"      -> (Relational.qTaggedUnion(_, _)),
    "q_set_ops"           -> (Relational.qSetOps(_, _)),
    "q_distinct"          -> (Relational.qDistinct(_, _)),
    "q_type_counts"       -> (Relational.qTypeCounts(_, _)),
    // temporal joins (as-of / bucketed range)
    "q_asof_join"         -> (Temporal.qAsofJoin(_, _)),
    "q_range_join"        -> (Temporal.qRangeJoin(_, _)),
    "q_gap_fill"          -> (Temporal.qGapFill(_, _)),
    "q_scd2"              -> (Temporal.qScd2(_, _)),
    "q_pagerank"          -> (Graph.qPagerank(_, _)),
    "q_ppr_suppliers"     -> (Graph.qPprSuppliers(_, _)),
    "q_khop_suppliers"    -> (Graph.qKhopSuppliers(_, _)),
    "q_triangles"         -> (Graph.qTriangles(_, _)),
    "q_copurchase"        -> (Graph.qCoPurchase(_, _)),
    "q_rendezvous_shard"  -> (Scale.qRendezvousShard(_, _)),
    "q_bucketed_join"     -> (Scale.qBucketedJoin(_, _)),
    "q_bucketed_append"   -> (Scale.qBucketedAppend(_, _)),
    "q_time_prune"        -> (Scale.qTimePrune(_, _)),
    "q_provenance"        -> (Packing.qProvenance(_, _)),
    "q_trend_slope"       -> (Analytics.qTrendSlope(_, _)),
    "q_token_efficiency"  -> (TextOps.qTokenEfficiency(_, _)),
    "q_fd_audit"          -> (Analytics.qFdAudit(_, _)),
    "q_outlier_days"      -> (Analytics.qOutlierDays(_, _)),
    "q_interarrival"      -> (Analytics.qInterarrival(_, _)),
    "q_canonical_pick"    -> (Clustering.qCanonicalPick(_, _)),
    "q_quantile_norm"     -> (Analytics.qQuantileNorm(_, _)),
    "q_cdc_chunks"        -> (Corpus.qCdcChunks(_, _)),
    "q_cluster_stats"     -> (Clustering.qClusterStats(_, _)),
    "q_session_window"    -> (EventWindows.qSessionWindow(_, _)),
    "q_source_overlap"    -> (Corpus.qSourceOverlap(_, _)),
    "q_source_copying"    -> (Graph.qSourceCopying(_, _)),
    "q_shard_digest"      -> (Ingestion.qShardDigest(_, _)),
    "q_edge_support"      -> (Graph.qEdgeSupport(_, _)),
    "q_top_paths"         -> (Behavior.qTopPaths(_, _)),
    "q_edit_verify"       -> (Dedup.qEditVerify(_, _)),
    "q_k_anonymity"       -> (Analytics.qKAnonymity(_, _)),
    // event-time windows (SURVEY §2.7 W1–W3 + sessionization)
    "q_sliding_window"    -> (EventWindows.qSlidingWindow(_, _)),
    "q_trailing_baseline" -> (EventWindows.qTrailingBaseline(_, _)),
    "q_window_trend"      -> (EventWindows.qWindowTrend(_, _)),
    "q_decline_trend"     -> (EventWindows.qDeclineTrend(_, _)),
    "q_sessionize"        -> (EventWindows.qSessionize(_, _)),
    "q_funnel"            -> (EventWindows.qFunnel(_, _)),
    "q_funnel4"           -> (EventWindows.qFunnel4(_, _)),
    "q_funnel_steps"      -> (EventWindows.qFunnelSteps(_, _)),
    "q_event_flow"        -> (Behavior.qEventFlow(_, _)),
    "q_attribution"       -> (Behavior.qAttribution(_, _)),
    "q_salted_join"       -> (Scale.qSaltedJoin(_, _)),
    "q_funnel_abandon"    -> (EventWindows.qFunnelAbandon(_, _)),
    // user-behavior analytics (cohorts, decayed engagement, experiments)
    "q_retention"         -> (Behavior.qRetention(_, _)),
    "q_decay_score"       -> (Behavior.qDecayScore(_, _)),
    "q_srm_check"         -> (Behavior.qSrmCheck(_, _)),
    // stateful keyed-stream FSM (SURVEY §2.6 T1) replayed on events
    "q_fraud_alerts"      -> (FraudDetection.qFraudAlerts(_, _)),
    // spoofing CEP pattern (SURVEY §2.6 T7) batch twin over book frames
    "q_spoofing"          -> (SpoofingDetector.qSpoofing(_, _)),
    // text analysis (word count P4/A1 + corpus quality surface)
    "q_word_count"        -> (TextOps.qWordCount(_, _)),
    "q_token_count"       -> (TextOps.qTokenCount(_, _)),
    "q_text_stats"        -> (TextOps.qTextStats(_, _)),
    "q_lang_id"           -> (TextOps.qLangId(_, _)),
    "q_fingerprint"       -> (TextOps.qFingerprint(_, _)),
    "q_tfidf"             -> (TextOps.qTfidf(_, _)),
    "q_bm25"              -> (TextOps.qBm25(_, _)),
    "q_vocab_coverage"    -> (TextOps.qVocabCoverage(_, _)),
    "q_inverted_index"    -> (TextOps.qInvertedIndex(_, _)),
    "q_phrase_search"     -> (TextOps.qPhraseSearch(_, _)),
    "q_pmi_bigrams"       -> (TextOps.qPmiBigrams(_, _)),
    "q_winnow"            -> (TextOps.qWinnow(_, _)),
    "q_bpe_train"        -> (TextOps.qBpeTrain(_, _)),
    "q_bpe_pairs"         -> (TextOps.qBpePairs(_, _)),
    "q_bpe_encode"        -> (TextOps.qBpeEncode(_, _)),
    "q_quality_logit"     -> (TextOps.qQualityLogit(_, _)),
    "q_passage_bm25"      -> (TextOps.qPassageBm25(_, _)),
    // deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard)
    "q_exact_dedup"       -> (Dedup.qExactDedup(_, _)),
    "q_substring_dedup"   -> (Dedup.qSubstringDedup(_, _)),
    "q_containment_pairs" -> (Dedup.qContainmentPairs(_, _)),
    "q_bbit_minhash"      -> (Dedup.qBbitMinhash(_, _)),
    "q_lm_score"          -> (TextOps.qLmScore(_, _)),
    "q_dedup_masks"       -> (Dedup.qDedupMasks(_, _)),
    "q_naive_split_leak"  -> (Sampling.qNaiveSplitLeakage(_, _)),
    "q_novelty_curve"     -> (Corpus.qNoveltyCurve(_, _)),
    "q_dedup_savings"     -> (Clustering.qDedupSavings(_, _)),
    "q_pq_encode"         -> (Embeddings.qPqEncode(_, _)),
    "q_pq_adc"            -> (Embeddings.qPqAdc(_, _)),
    "q_ann_ivfpq"         -> (Embeddings.qAnnIvfPq(_, _)),
    "q_pq_rerank"         -> (Embeddings.qPqRerank(_, _)),
    "q_minhash_sig"       -> (Dedup.qMinhashSignature(_, _)),
    "q_minhash_lsh_pairs" -> (Dedup.qMinhashLshPairs(_, _)),
    "q_lsh_audit"         -> (Dedup.qLshAudit(_, _)),
    "q_simhash"           -> (Dedup.qSimhash(_, _)),
    "q_simhash_pairs"     -> (Dedup.qSimhashPairs(_, _)),
    "q_ngram_jaccard"     -> (Dedup.qNgramJaccard(_, _)),
    "q_dup_clusters"      -> (Clustering.qDupClusters(_, _)),
    "q_incremental_clusters" -> (Clustering.qIncrementalClusters(_, _)),
    "q_retract_doc"       -> (Clustering.qRetractDoc(_, _)),
    "q_dedup_decision"    -> (Clustering.qDedupDecision(_, _)),
    "q_kmeans"            -> (Clustering.qKmeans(_, _)),
    // corpus preparation: chunking, repetition filters, segment dedup,
    // PII-pattern redaction
    "q_chunk_docs"        -> (Corpus.qChunkDocs(_, _)),
    "q_chunk_quality"     -> (Corpus.qChunkQuality(_, _)),
    "q_repetition"        -> (Corpus.qRepetition(_, _)),
    "q_segment_dedup"     -> (Corpus.qSegmentDedup(_, _)),
    "q_corpus_rewrite"    -> (Corpus.qCorpusRewrite(_, _)),
    "q_intra_doc_dedup"   -> (Corpus.qIntraDocDedup(_, _)),
    "q_shingle_novelty"   -> (Corpus.qShingleNovelty(_, _)),
    "q_boilerplate_strip" -> (Corpus.qBoilerplateStrip(_, _)),
    "q_incremental_dedup" -> (Dedup.qIncrementalDedup(_, _)),
    "q_pii_redact"        -> (Corpus.qPiiRedact(_, _)),
    "q_pii_luhn"          -> (Corpus.qPiiLuhn(_, _)),
    "q_decontaminate"     -> (Corpus.qDecontaminate(_, _)),
    "q_contam_spans"      -> (Corpus.qContamSpans(_, _)),
    "q_source_health"     -> (Corpus.qSourceHealth(_, _)),
    "q_dist_shift"        -> (Corpus.qDistShift(_, _)),
    "q_filter_funnel"     -> (Corpus.qFilterFunnel(_, _)),
    "q_gopher_rules"      -> (Corpus.qGopherRules(_, _)),
    "q_corpus_verdict"    -> (Corpus.qCorpusVerdict(_, _)),
    // embedding vector ops: normalize, mean-pool centroid, coherence
    "q_emb_norm"          -> (Embeddings.qEmbNorm(_, _)),
    "q_emb_centroid"      -> (Embeddings.qEmbCentroid(_, _)),
    "q_emb_centroid_dist" -> (Embeddings.qEmbCentroidDist(_, _)),
    "q_emb_quantize"      -> (Embeddings.qEmbQuantize(_, _)),
    // deterministic sampling
    "q_hash_sample"       -> (Sampling.qHashSample(_, _)),
    "q_stratified_sample" -> (Sampling.qStratifiedSample(_, _)),
    "q_epoch_shuffle"     -> (Sampling.qEpochShuffle(_, _)),
    "q_mixture_rebalance" -> (Sampling.qMixtureRebalance(_, _)),
    "q_temperature_mix"   -> (Sampling.qTemperatureMix(_, _)),
    "q_dsir_weights"      -> (Sampling.qDsirWeights(_, _)),
    "q_budget_select"     -> (Sampling.qBudgetSelect(_, _)),
    "q_quality_tiers"     -> (Sampling.qQualityTiers(_, _)),
    "q_domain_cap"        -> (Sampling.qDomainCap(_, _)),
    "q_priority_sample"   -> (Sampling.qPrioritySample(_, _)),
    "q_unimax_alloc"      -> (Sampling.qUnimaxAlloc(_, _)),
    "q_wfq_interleave"    -> (Sampling.qWfqInterleave(_, _)),
    "q_leakage_split"     -> (Sampling.qLeakageSplit(_, _)),
    "q_split_audit"       -> (Sampling.qSplitAudit(_, _)),
    "q_profile"           -> (Analytics.qProfile(_, _)),
    "q_heavy_hitters"     -> (Scale.qHeavyHitters(_, _)),
    "q_skew_audit"        -> (Scale.qSkewAudit(_, _)),
    "q_salted_agg"        -> (Scale.qSaltedAgg(_, _)),
    "q_zorder_audit"      -> (Scale.qZorderAudit(_, _)),
    "q_winsorize"         -> (Analytics.qWinsorize(_, _)),
    "q_length_histogram"  -> (TextOps.qLengthHistogram(_, _)),
    "q_sequence_pack"     -> (Packing.qSequencePack(_, _)),
    "q_sequence_pack_wide" -> (Packing.qSequencePackWide(_, _)),
    "q_pack_stats"        -> (Packing.qPackStats(_, _)),
    "q_length_buckets"    -> (Packing.qLengthBuckets(_, _)),
    // similarity search over embeddings (brute-force + LSH ANN)
    "q_knn_brute"         -> (Similarity.qKnnBruteForce(_, _)),
    "q_hard_negatives"    -> (Similarity.qHardNegatives(_, _)),
    "q_rrf_fusion"        -> (Similarity.qRrfFusion(_, _)),
    "q_mmr_rerank"        -> (Similarity.qMmr(_, _)),
    "q_margin_mine"       -> (Similarity.qMarginMine(_, _)),
    "q_maxsim"            -> (Similarity.qMaxSim(_, _)),
    "q_ann_lsh"           -> (Similarity.qAnnLsh(_, _)),
    "q_semantic_dedup"    -> (Similarity.qSemanticDedup(_, _)),
    "q_ann_lsh_banded"    -> (Similarity.qAnnLshBanded(_, _)),
    "q_ann_eval"          -> (Similarity.qAnnEval(_, _)),
    "q_mrl_eval"          -> (Similarity.qMrlEval(_, _)),
    "q_near_dup_banded"   -> (Similarity.qNearDupBanded(_, _)),
    "q_ann_ivf"           -> (Similarity.qAnnIvf(_, _)),
    "q_ann_artifact"      -> (Similarity.qAnnArtifact(_, _)),
    "q_embedding_near_dup" -> (Similarity.qEmbeddingNearDup(_, _)),
    // ingestion chain: JSON enrich, validation routing, scalar/date fns
    "q_json_enrich"       -> (Ingestion.qJsonEnrich(_, _)),
    "q_validation_split"  -> (Ingestion.qValidationSplit(_, _)),
    "q_scalar_funcs"      -> (Ingestion.qScalarFuncs(_, _)),
    "q_date_funcs"        -> (Ingestion.qDateFuncs(_, _)),
    "q_url_funcs"         -> (Ingestion.qUrlFuncs(_, _)),
    "q_url_dedup"         -> (Ingestion.qUrlDedup(_, _)),
    "q_snapshot_diff"     -> (Ingestion.qSnapshotDiff(_, _)),
    "q_blocklist_filter"  -> (Corpus.qBlocklistFilter(_, _)),
    // orderbook array analytics + KPI rollup
    "q_book_depth"        -> (OrderBookOps.qBookDepth(_, _)),
    "q_kpi_segment"       -> (Kpi.qKpiSegment(_, _)),
    "q_kpi_sharpe"        -> (Kpi.qKpiSharpe(_, _)),
    "q_kpi_holding"       -> (Kpi.qKpiHolding(_, _)),
    "q_kpi_slippage"      -> (Kpi.qKpiSlippage(_, _)),
    "q_quantiles"         -> (Analytics.qQuantiles(_, _)),
    "q_sketch_stats"      -> (Sketches.qSketchStats(_, _)),
    "q_bloom_filter"      -> (Sketches.qBloomFilter(_, _)),
    "q_countmin"          -> (Sketches.qCountMin(_, _)),
    "q_corpus_overlap"    -> (Sketches.qCorpusOverlap(_, _)),
    "q_kpi_rollup"        -> (Analytics.qKpiRollup(_, _)),
    "q_incremental_rollup" -> (IncrementalAgg.qIncrementalRollup(_, _)),
    "q_status_pivot"      -> (Analytics.qStatusPivot(_, _)),
    // CEP density-drop signal generator (trailing baseline FSM)
    "q_density_signals"   -> (DensitySignals.qDensitySignals(_, _)),
    // S2/K2/K3 composition: wire JSON → parse/validate → proto round
    // trip → idempotent store, value-gated end to end
    "q_wire_ingest"       -> (WireIngest.qWireIngest(_, _)),
    "q_wire_books"        -> (WireIngest.qWireBooks(_, _)),
    // multimodal payload plumbing (binary column + stub decode)
    "q_multimodal"        -> (Multimodal.qMultimodalFeatures(_, _)),
    "q_image_phash"       -> (Multimodal.qImagePhash(_, _)),
    "q_image_neardup_pairs" -> (Multimodal.qImageNeardupPairs(_, _)),
    "q_frame_phash"       -> (Multimodal.qFramePhash(_, _)),
    "q_video_neardup"     -> (Multimodal.qVideoNeardup(_, _)),
    "q_modal_dedup"       -> (Multimodal.qModalDedup(_, _)),
    "q_incremental_phash" -> (Multimodal.qIncrementalPhash(_, _)),
    "q_incremental_modal" -> (Multimodal.qIncrementalModal(_, _)),
    "q_incremental_semdedup" -> (Similarity.qIncrementalSemdedup(_, _)),
    // 4-stream position-tracking FSM (J1/T3/T5/T10–T12): the events
    // replay uses a single position family, so the whole FSM is
    // re-runnable in SQL as a recursive CTE — full value oracle below
    // (semantics additionally pinned by PositionTrackerSpec).
    "q_position_events"   -> (PositionTracker.qPositionEvents(_, _)),
  )

  private val DEC_SUM = "CAST(sum(CAST(%s AS DECIMAL(18,6))) AS DOUBLE)"
  private def dsum(c: String) = DEC_SUM.format(c)
  private def davg(c: String) = s"${dsum(c)} / count($c)"
  private val REVENUE =
    "CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(38,6)) AS DOUBLE)"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  $REVENUE AS sum_disc_price,
         |  ${davg("l_quantity")} AS avg_qty,
         |  ${davg("l_extendedprice")} AS avg_price,
         |  count(*) AS count_order
         |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q6_filtered_revenue" ->
      """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q5_region_revenue" ->
      s"""SELECT n_name, $REVENUE AS revenue, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_broadcast_enrich" ->
      s"""SELECT p_brand, count(*) AS n_items, ${dsum("l_extendedprice")} AS total_price,
         |  max(l_quantity) AS max_qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_order_customer" ->
      s"""SELECT c_mktsegment, o_orderstatus, count(*) AS n_orders,
         |  ${dsum("o_totalprice")} AS total, ${davg("o_totalprice")} AS avg_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_running_drawdown" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, running_max,
        |  CAST(CAST(running_max AS DECIMAL(18,6)) - CAST(o_totalprice AS DECIMAL(18,6)) AS DOUBLE) AS drawdown
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |    max(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_max
        |  FROM orders WHERE o_custkey < 50)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q_topn_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_tagged_union" ->
      s"""SELECT user_id, tag, count(*) AS n, ${dsum("value")} AS total_value
         |FROM (
         |  SELECT user_id, 'PURCHASE' AS tag, value FROM events WHERE event_type = 'purchase'
         |  UNION ALL
         |  SELECT user_id, 'ERROR' AS tag, value FROM events WHERE event_type = 'error')
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT user_id, event_type FROM events ORDER BY 1, 2",
    "q_set_ops"            -> Relational.sqlSetOps,
    "q_asof_join"          -> Temporal.sqlAsofJoin,
    "q_range_join"         -> Temporal.sqlRangeJoin,
    "q_gap_fill"           -> Temporal.sqlGapFill,
    "q_scd2"               -> Temporal.sqlScd2,
    "q_pagerank"           -> Graph.sqlPagerank,
    "q_ppr_suppliers"      -> Graph.sqlPprSuppliers,
    "q_khop_suppliers"     -> Graph.sqlKhopSuppliers,
    "q_triangles"          -> Graph.sqlTriangles,
    "q_copurchase"         -> Graph.sqlCoPurchase,
    "q_rendezvous_shard"   -> Scale.sqlRendezvousShard,
    "q_bucketed_join"      -> Scale.sqlBucketedJoin,
    "q_bucketed_append"    -> Scale.sqlBucketedJoin,
    "q_time_prune"         -> Scale.sqlTimePrune,
    "q_provenance"         -> Packing.sqlProvenance,
    "q_trend_slope"        -> Analytics.sqlTrendSlope,
    "q_token_efficiency"   -> TextOps.sqlTokenEfficiency,
    "q_fd_audit"           -> Analytics.sqlFdAudit,
    "q_outlier_days"       -> Analytics.sqlOutlierDays,
    "q_interarrival"       -> Analytics.sqlInterarrival,
    "q_canonical_pick"     -> Clustering.sqlCanonicalPick,
    "q_quantile_norm"      -> Analytics.sqlQuantileNorm,
    "q_cdc_chunks"         -> Corpus.sqlCdcChunks,
    "q_cluster_stats"      -> Clustering.sqlClusterStats,
    "q_session_window"     -> EventWindows.sqlSessionWindow,
    "q_source_overlap"     -> Corpus.sqlSourceOverlap,
    "q_source_copying"     -> Graph.sqlSourceCopying,
    "q_shard_digest"       -> Ingestion.sqlShardDigest,
    "q_edge_support"       -> Graph.sqlEdgeSupport,
    "q_top_paths"          -> Behavior.sqlTopPaths,
    "q_edit_verify"        -> Dedup.sqlEditVerify,
    "q_k_anonymity"        -> Analytics.sqlKAnonymity,
    "q_dup_clusters"       -> Clustering.sqlDupClusters,
    "q_incremental_clusters" -> Clustering.sqlIncrementalClusters,
    "q_retract_doc"        -> Clustering.sqlRetractDoc,
    "q_dedup_decision"     -> Clustering.sqlDedupDecision,
    "q_kmeans"             -> Clustering.sqlKmeans,
    "q_chunk_docs"         -> Corpus.sqlChunkDocs,
    "q_chunk_quality"      -> Corpus.sqlChunkQuality,
    "q_repetition"         -> Corpus.sqlRepetition,
    "q_segment_dedup"      -> Corpus.sqlSegmentDedup,
    "q_corpus_rewrite"     -> Corpus.sqlCorpusRewrite,
    "q_intra_doc_dedup"    -> Corpus.sqlIntraDocDedup,
    "q_shingle_novelty"    -> Corpus.sqlShingleNovelty,
    "q_boilerplate_strip"  -> Corpus.sqlBoilerplateStrip,
    "q_incremental_dedup"  -> Dedup.sqlIncrementalDedup,
    "q_pii_redact"         -> Corpus.sqlPiiRedact,
    "q_pii_luhn"           -> Corpus.sqlPiiLuhn,
    "q_decontaminate"      -> Corpus.sqlDecontaminate,
    "q_contam_spans"       -> Corpus.sqlContamSpans,
    "q_source_health"      -> Corpus.sqlSourceHealth,
    "q_dist_shift"         -> Corpus.sqlDistShift,
    "q_filter_funnel"      -> Corpus.sqlFilterFunnel,
    "q_gopher_rules"       -> Corpus.sqlGopherRules,
    "q_corpus_verdict"     -> Corpus.sqlCorpusVerdict,
    "q_emb_norm"           -> Embeddings.sqlEmbNorm,
    "q_emb_centroid"       -> Embeddings.sqlEmbCentroid,
    "q_emb_centroid_dist"  -> Embeddings.sqlEmbCentroidDist,
    "q_emb_quantize"       -> Embeddings.sqlEmbQuantize,
    "q_hash_sample"        -> Sampling.sqlHashSample,
    "q_stratified_sample"  -> Sampling.sqlStratifiedSample,
    "q_epoch_shuffle"      -> Sampling.sqlEpochShuffle,
    "q_mixture_rebalance"  -> Sampling.sqlMixtureRebalance,
    "q_temperature_mix"    -> Sampling.sqlTemperatureMix,
    "q_dsir_weights"       -> Sampling.sqlDsirWeights,
    "q_budget_select"      -> Sampling.sqlBudgetSelect,
    "q_quality_tiers"      -> Sampling.sqlQualityTiers,
    "q_domain_cap"         -> Sampling.sqlDomainCap,
    "q_priority_sample"    -> Sampling.sqlPrioritySample,
    "q_unimax_alloc"       -> Sampling.sqlUnimaxAlloc,
    "q_wfq_interleave"     -> Sampling.sqlWfqInterleave,
    "q_leakage_split"      -> Sampling.sqlLeakageSplit,
    "q_split_audit"        -> Sampling.sqlSplitAudit,
    "q_profile"            -> Analytics.sqlProfile,
    "q_heavy_hitters"      -> Scale.sqlHeavyHitters,
    "q_skew_audit"         -> Scale.sqlSkewAudit,
    "q_salted_agg"         -> Scale.sqlSaltedAgg,
    "q_zorder_audit"       -> Scale.sqlZorderAudit,
    "q_winsorize"          -> Analytics.sqlWinsorize,
    "q_length_histogram"   -> TextOps.sqlLengthHistogram,
    "q_sequence_pack"      -> Packing.sqlSequencePack,
    "q_sequence_pack_wide" -> Packing.sqlSequencePackWide,
    "q_pack_stats"         -> Packing.sqlPackStats,
    "q_length_buckets"     -> Packing.sqlLengthBuckets,
    "q_tfidf"              -> TextOps.sqlTfidf,
    "q_bm25"               -> TextOps.sqlBm25,
    "q_vocab_coverage"     -> TextOps.sqlVocabCoverage,
    "q_inverted_index"     -> TextOps.sqlInvertedIndex,
    "q_phrase_search"      -> TextOps.sqlPhraseSearch,
    "q_pmi_bigrams"        -> TextOps.sqlPmiBigrams,
    "q_winnow"             -> TextOps.sqlWinnow,
    "q_bpe_train"         -> TextOps.sqlBpeTrain,
    "q_bpe_pairs"          -> TextOps.sqlBpePairs,
    "q_bpe_encode"         -> TextOps.sqlBpeEncode,
    "q_quality_logit"      -> TextOps.sqlQualityLogit,
    "q_passage_bm25"       -> TextOps.sqlPassageBm25,
    "q_type_counts" ->
      s"""SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
         |  ${dsum("value")} AS total_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sliding_window"     -> EventWindows.sqlSlidingWindow,
    "q_trailing_baseline"  -> EventWindows.sqlTrailingBaseline,
    "q_window_trend"       -> EventWindows.sqlWindowTrend,
    "q_decline_trend"      -> EventWindows.sqlDeclineTrend,
    "q_sessionize"         -> EventWindows.sqlSessionize,
    "q_funnel"             -> EventWindows.sqlFunnel,
    "q_funnel4"            -> EventWindows.sqlFunnel4,
    "q_funnel_steps"       -> EventWindows.sqlFunnelSteps,
    "q_event_flow"         -> Behavior.sqlEventFlow,
    "q_attribution"        -> Behavior.sqlAttribution,
    "q_salted_join"        -> Scale.sqlSaltedJoin,
    "q_funnel_abandon"     -> EventWindows.sqlFunnelAbandon,
    "q_retention"          -> Behavior.sqlRetention,
    "q_decay_score"        -> Behavior.sqlDecayScore,
    "q_srm_check"          -> Behavior.sqlSrmCheck,
    "q_fraud_alerts"       -> FraudDetection.sqlFraudAlerts,
    "q_spoofing"           -> SpoofingDetector.sqlSpoofing,
    "q_word_count"         -> TextOps.sqlWordCount,
    "q_token_count"        -> TextOps.sqlTokenCount,
    "q_text_stats"         -> TextOps.sqlTextStats,
    "q_lang_id"            -> TextOps.sqlLangId,
    "q_fingerprint"        -> TextOps.sqlFingerprint,
    "q_exact_dedup"        -> Dedup.sqlExactDedup,
    "q_substring_dedup"    -> Dedup.sqlSubstringDedup,
    "q_containment_pairs"  -> Dedup.sqlContainmentPairs,
    "q_bbit_minhash"       -> Dedup.sqlBbitMinhash,
    "q_lm_score"           -> TextOps.sqlLmScore,
    "q_dedup_masks"        -> Dedup.sqlDedupMasks,
    "q_naive_split_leak"   -> Sampling.sqlNaiveSplitLeakage,
    "q_novelty_curve"      -> Corpus.sqlNoveltyCurve,
    "q_dedup_savings"      -> Clustering.sqlDedupSavings,
    "q_pq_encode"          -> Embeddings.sqlPqEncode,
    "q_pq_adc"             -> Embeddings.sqlPqAdc,
    "q_ann_ivfpq"          -> Embeddings.sqlAnnIvfPq,
    "q_pq_rerank"          -> Embeddings.sqlPqRerank,
    "q_minhash_sig"        -> Dedup.sqlMinhashSignature,
    "q_minhash_lsh_pairs"  -> Dedup.sqlMinhashLshPairs,
    "q_lsh_audit"          -> Dedup.sqlLshAudit,
    "q_simhash"            -> Dedup.sqlSimhash,
    "q_simhash_pairs"      -> Dedup.sqlSimhashPairs,
    "q_ngram_jaccard"      -> Dedup.sqlNgramJaccard,
    "q_knn_brute"          -> Similarity.sqlKnnBruteForce,
    "q_hard_negatives"     -> Similarity.sqlHardNegatives,
    "q_rrf_fusion"         -> Similarity.sqlRrfFusion,
    "q_mmr_rerank"         -> Similarity.sqlMmr,
    "q_margin_mine"        -> Similarity.sqlMarginMine,
    "q_maxsim"             -> Similarity.sqlMaxSim,
    "q_ann_lsh"            -> Similarity.sqlAnnLsh,
    "q_semantic_dedup"     -> Similarity.sqlSemanticDedup,
    "q_ann_lsh_banded"     -> Similarity.sqlAnnLshBanded,
    "q_ann_eval"           -> Similarity.sqlAnnEval,
    "q_mrl_eval"           -> Similarity.sqlMrlEval,
    "q_near_dup_banded"    -> Similarity.sqlNearDupBanded,
    "q_incremental_rollup" -> IncrementalAgg.sqlIncrementalRollup,
    "q_ann_ivf"            -> Similarity.sqlAnnIvf,
    "q_ann_artifact"       -> Similarity.sqlAnnIvf,
    "q_embedding_near_dup" -> Similarity.sqlEmbeddingNearDup,
    "q_json_enrich"        -> Ingestion.sqlJsonEnrich,
    "q_validation_split"   -> Ingestion.sqlValidationSplit,
    "q_scalar_funcs"       -> Ingestion.sqlScalarFuncs,
    "q_date_funcs"         -> Ingestion.sqlDateFuncs,
    "q_url_funcs"          -> Ingestion.sqlUrlFuncs,
    "q_url_dedup"          -> Ingestion.sqlUrlDedup,
    "q_snapshot_diff"      -> Ingestion.sqlSnapshotDiff,
    "q_blocklist_filter"   -> Corpus.sqlBlocklistFilter,
    "q_book_depth"         -> OrderBookOps.sqlBookDepth,
    "q_kpi_segment"        -> Kpi.sqlKpiSegment,
    "q_kpi_sharpe"         -> Kpi.sqlKpiSharpe,
    "q_kpi_holding"        -> Kpi.sqlKpiHolding,
    "q_kpi_slippage"       -> Kpi.sqlKpiSlippage,
    "q_quantiles"          -> Analytics.sqlQuantiles,
    "q_sketch_stats"       -> Sketches.sqlSketchStats,
    "q_bloom_filter"       -> Sketches.sqlBloomFilter,
    "q_countmin"           -> Sketches.sqlCountMin,
    "q_corpus_overlap"     -> Sketches.sqlCorpusOverlap,
    "q_kpi_rollup"         -> Analytics.sqlKpiRollup,
    "q_status_pivot"       -> Analytics.sqlStatusPivot,
    "q_density_signals"    -> DensitySignals.sqlDensitySignals,
    "q_multimodal"         -> Multimodal.sqlMultimodalFeatures,
    "q_image_phash"        -> Multimodal.sqlImagePhash,
    "q_image_neardup_pairs" -> Multimodal.sqlImageNeardupPairs,
    "q_frame_phash"        -> Multimodal.sqlFramePhash,
    "q_video_neardup"      -> Multimodal.sqlVideoNeardup,
    "q_modal_dedup"        -> Multimodal.sqlModalDedup,
    "q_incremental_phash"  -> Multimodal.sqlIncrementalPhash,
    "q_incremental_modal"  -> Multimodal.sqlIncrementalModal,
    "q_incremental_semdedup" -> Similarity.sqlIncrementalSemdedup,
    "q_wire_ingest"        -> WireIngest.sqlWireIngest,
    "q_wire_books"         -> WireIngest.sqlWireBooks,
    "q_position_events"    -> PositionTracker.sqlPositionEvents,
  )
}
