package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{Cdc, Graph, Ingest, Llm, LlmEmbed, LlmKnn, LlmMix, LlmRetrieval, LlmText, Relational, Scalars, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2); each entry is a
  * pure `(SparkSession, sfDir) => DataFrame`. SQL-expressible queries carry
  * DuckDB oracle SQL in [[Oracle.sql]]; the rest are covered by scalatest.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.qAggHash(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_parquet"  -> (Relational.qScanParquet _),
    "q_scan_csv"      -> (Ingest.qScanCsv _), // no-oracle: self-auditing CSV round trip (DuckDB can't observe the temp files); lossless flag + IngestSpec
    "q_scan_fixedwidth" -> (Ingest.qScanFixedwidth _), // no-oracle: self-auditing FINWIRE round trip; per-type lossless flags + IngestSpec
    "q_filter_pred"   -> (Relational.qFilterPred _),
    "q_proj_derived"  -> (Relational.qProjDerived _),
    "q_case_null"     -> (Relational.qCaseNull _),
    "q_join_broadcast" -> (Relational.qJoinBroadcast _),
    "q_join_shuffle"  -> (Relational.qJoinShuffle _),
    "q_join_left"     -> (Relational.qJoinLeft _),
    "q_join_semi"     -> (Relational.qJoinSemi _),
    "q_join_anti"     -> (Relational.qJoinAnti _),
    "q_agg_hash"      -> (Relational.qAggHash _),
    "q_agg_distinct"  -> (Relational.qAggDistinct _),
    "q_agg_having"    -> (Relational.qAggHaving _),
    "q_agg_approx_distinct" -> (Relational.qAggApproxDistinct _), // no-oracle: HLL estimate; ±5% test in RelationalSpec
    "q_batch_validation" -> (Relational.qBatchValidation _),
    "q_agg_rollup"    -> (Relational.qAggRollup _),
    "q_agg_cube"      -> (Relational.qAggCube _),
    "q_agg_groupsets" -> (Relational.qAggGroupSets _),
    "q_audit_referential" -> (Relational.qAuditReferential _),
    "q_agg_percentile" -> (Relational.qAggPercentile _),
    "q_agg_approx_percentile" -> (Relational.qAggApproxPercentile _), // no-oracle: sketch differs per engine; bounded vs exact in RelationalSpec
    "q_pivot_segment" -> (Relational.qPivotSegment _),
    "q_sort_limit"    -> (Relational.qSortLimit _),
    "q_sort_nulls"    -> (Relational.qSortNulls _),
    "q_union_batches" -> (Relational.qUnionBatches _),
    "q_except"        -> (Relational.qExcept _),
    "q_except_all"    -> (Relational.qExceptAll _),
    "q_intersect"     -> (Relational.qIntersect _),
    "q_intersect_all" -> (Relational.qIntersectAll _),
    "q_join_full"     -> (Relational.qJoinFull _),
    "q_agg_collect"   -> (Relational.qAggCollect _),
    "q_unpivot"       -> (Relational.qUnpivot _),
    "q_skew_salt"     -> (Relational.qSkewSalt _),
    "q_skew_profile"  -> (Relational.qSkewProfile _),
    "q_agg_ohlc"      -> (Relational.qAggOhlc _),
    "q_histogram"     -> (Relational.qHistogram _),
    "q_stats_moments" -> (Relational.qStatsMoments _),
    "q_agg_topk"      -> (Relational.qAggTopk _),
    "q_topk_plan_native" -> (Relational.qTopkPlanNative _),
    "q_sql_text"      -> (Relational.qSqlText _),
    "q_sql_lateral"   -> (Relational.qSqlLateral _),
    "q_sql_recursive" -> (Relational.qSqlRecursive _),
    "q_zorder_layout" -> (Relational.qZorderLayout _),
    "q_zorder_probe"  -> (Relational.qZorderProbe _),
    "q_win_rank"          -> (Windows.qWinRank _),
    "q_win_navigation"    -> (Windows.qWinNavigation _),
    "q_win_scd2_enddate"  -> (Windows.qWinScd2EndDate _),
    "q_win_running"       -> (Windows.qWinRunning _),
    "q_win_range_frame"   -> (Windows.qWinRangeFrame _),
    "q_win_topk_group"    -> (Windows.qWinTopkGroup _),
    "q_join_range_scd2"   -> (Windows.qJoinRangeScd2 _),
    "q_join_conditional_key" -> (Windows.qJoinConditionalKey _),
    "q_self_join_pairing" -> (Windows.qSelfJoinPairing _),
    "q_join_asof"         -> (Windows.qJoinAsof _),
    "q_win_ntile"         -> (Windows.qWinNtile _),
    "q_gap_fill"          -> (Windows.qGapFill _),
    "q_interpolate"       -> (Windows.qInterpolate _),
    "q_win_moving_avg"    -> (Windows.qWinMovingAvg _),
    // §2.8 scalar functions
    "q_str_funcs"   -> (Scalars.qStrFuncs _),
    "q_regex_funcs" -> (Scalars.qRegexFuncs _),
    "q_date_funcs"  -> (Scalars.qDateFuncs _),
    "q_math_funcs"  -> (Scalars.qMathFuncs _),
    "q_json_funcs"  -> (Scalars.qJsonFuncs _),
    "q_variant_funcs" -> (Scalars.qVariantFuncs _),
    "q_array_funcs" -> (Scalars.qArrayFuncs _),
    "q_struct_funcs" -> (Scalars.qStructFuncs _),
    "q_map_funcs" -> (Scalars.qMapFuncs _),
    // §2.10 CDC / event-time (batch forms; stream wrappers in graft.stream)
    "q_cdc_apply"       -> (Cdc.qCdcApply _),
    "q_cdc_scd2"        -> (Cdc.qCdcScd2 _),
    "q_cdc_batches"     -> (Cdc.qCdcBatches _),
    "q_warehouse_etl"   -> (graft.etl.WarehouseEtl.qWarehouseEtl _),
    "q_snapshot_diff"   -> (Cdc.qSnapshotDiff _),
    "q_stream_tumbling" -> (Cdc.qStreamTumbling _),
    "q_sliding_window"  -> (Cdc.qSlidingWindow _),
    "q_session_window"  -> (Cdc.qSessionWindow _),
    "q_event_dedup"     -> (Cdc.qEventDedup _),
    "q_event_funnel"    -> (Cdc.qEventFunnel _),
    "q_retention_cohorts" -> (Cdc.qRetentionCohorts _),
    "q_markov_transitions" -> (Cdc.qMarkovTransitions _),
    // §2.9 LLM-data-pipeline block
    "q_dedup_exact"    -> (Llm.qDedupExact _),
    "q_dedup_bloom"    -> (Llm.qDedupBloom _),
    "q_dedup_minhash"  -> (Llm.qDedupMinhash _),
    "q_dedup_groups"   -> (Llm.qDedupGroups _),
    "q_dedup_keep"     -> (Llm.qDedupKeep _),
    "q_dedup_simhash"  -> (Llm.qDedupSimhash _),
    "q_ngram_jaccard"  -> (Llm.qNgramJaccard _),
    "q_dedup_cosine"   -> (Llm.qDedupCosine _),
    "q_knn_cosine"     -> (LlmKnn.qKnnCosine _),
    "q_knn_batch"      -> (LlmKnn.qKnnBatch _),
    "q_embed_normalize" -> (LlmEmbed.qEmbedNormalize _),
    "q_embed_covariance" -> (LlmEmbed.qEmbedCovariance _),
    "q_embed_drift" -> (LlmEmbed.qEmbedDrift _),
    "q_embed_whiten" -> (LlmEmbed.qEmbedWhiten _),
    "q_embed_pca" -> (LlmEmbed.qEmbedPca _), // no-oracle: eigenbasis not SQL-expressible; contracts in LlmSpec
    "q_hard_negatives" -> (LlmKnn.qHardNegatives _),
    "q_hard_negatives_ann" -> (LlmKnn.qHardNegativesAnn _),
    "q_quality_nb" -> (LlmText.qQualityNb _),
    "q_semdedup" -> (Llm.qSemDedup _),
    "q_sample_decay" -> (LlmMix.qSampleDecay _),
    "q_knn_cosine_lsh" -> (LlmKnn.qKnnCosineLsh _), // no-oracle: rows-only check + LlmSpec recall test
    "q_knn_cosine_ivf" -> (LlmKnn.qKnnCosineIvf _), // no-oracle: rows-only check + LlmSpec recall test
    "q_knn_batch_ivf"  -> (LlmKnn.qKnnBatchIvf _),  // no-oracle: per-probe parity with single-probe IVF in LlmSpec
    "q_knn_batch_lsh"  -> (LlmKnn.qKnnBatchLsh _),  // no-oracle: per-probe parity with single-probe LSH in LlmSpec
    "q_text_stats"     -> (LlmText.qTextStats _),
    "q_text_clean"     -> (LlmText.qTextClean _),
    "q_doc_chunk"      -> (LlmText.qDocChunk _),
    "q_profile_columns" -> (Relational.qProfileColumns _),
    "q_token_count"    -> (LlmText.qTokenCount _),
    "q_text_quality"   -> (LlmText.qTextQuality _),
    "q_char_entropy"   -> (LlmText.qCharEntropy _),
    "q_lang_id"        -> (LlmText.qLangId _),
    "q_doc_fingerprint" -> (LlmText.qDocFingerprint _),
    "q_sample_hash"    -> (LlmMix.qSampleHash _),
    "q_top_ngrams"     -> (LlmText.qTopNgrams _),
    "q_seq_pack"       -> (LlmMix.qSeqPack _),
    "q_mix_interleave" -> (LlmMix.qMixInterleave _),
    "q_fuzzy_match"    -> (LlmRetrieval.qFuzzyMatch _),
    "q_tfidf"          -> (LlmRetrieval.qTfidf _),
    "q_clip_outliers"  -> (LlmMix.qClipOutliers _),
    "q_label_balance"  -> (LlmMix.qLabelBalance _),
    "q_entity_groups"  -> (Llm.qEntityGroups _),
    "q_multimodal_features" -> (graft.sources.Multimodal.qMultimodalFeatures _), // no-oracle: synthetic corpus; contracts in MultimodalSpec
    "q_image_dedup"    -> (graft.sources.Multimodal.qImageDedup _), // no-oracle: synthetic planted-dup corpus; recall in MultimodalSpec
    "q_audio_dedup"    -> (graft.sources.Multimodal.qAudioDedup _), // no-oracle: synthetic planted-dup corpus; recall in MultimodalSpec
    "q_video_dedup"    -> (graft.sources.Multimodal.qVideoDedup _), // no-oracle: synthetic planted-dup corpus; recall in MultimodalSpec
    "q_join_interval_bin" -> (Windows.qJoinIntervalBin _),
    "q_repetition_filter" -> (LlmText.qRepetitionFilter _),
    "q_decontaminate"  -> (Llm.qDecontaminate _),
    "q_mix_temperature" -> (LlmMix.qMixTemperature _),
    "q_heavy_hitters"  -> (LlmText.qHeavyHitters _),
    "q_heavy_hitters_grouped" -> (LlmText.qHeavyHittersGrouped _),
    "q_word_pmi"       -> (LlmText.qWordPmi _),
    "q_source_overlap" -> (Llm.qSourceOverlap _),
    "q_embed_outliers" -> (LlmEmbed.qEmbedOutliers _),
    "q_quality_score"  -> (LlmText.qQualityScore _),
    "q_span_dup"       -> (Llm.qSpanDup _),
    "q_corpus_curate"  -> (graft.etl.CorpusPipeline.qCorpusCurate _),
    "q_curation_audit" -> (graft.etl.CorpusPipeline.qCurationAudit _),
    "q_lm_perplexity"  -> (LlmText.qLmPerplexity _),
    "q_lm_perplexity2" -> (LlmText.qLmPerplexity2 _),
    "q_content_chunks" -> (LlmText.qContentChunks _),
    "q_chunk_dedup"    -> (Llm.qChunkDedup _),
    "q_split_assign"   -> (LlmMix.qSplitAssign _),
    "q_sample_stratified" -> (LlmMix.qSampleStratified _),
    "q_source_budget"  -> (LlmMix.qSourceBudget _),
    "q_pseudonymize"   -> (Relational.qPseudonymize _),
    "q_pii_scrub"      -> (Relational.qPiiScrub _),
    "q_dp_counts"      -> ((s: org.apache.spark.sql.SparkSession, d: String) => Relational.qDpCounts(s, d)),
    "q_k_anonymity"    -> (Relational.qKAnonymity _),
    "q_knn_cosine_int8" -> (LlmKnn.qKnnCosineInt8 _), // no-oracle: recall + int8-error bound in LlmSpec
    "q_knn_batch_int8"  -> (LlmKnn.qKnnBatchInt8 _),  // no-oracle: per-probe parity with single-probe SQ8 in LlmSpec
    "q_knn_cosine_pq"   -> (LlmKnn.qKnnCosinePq _),   // no-oracle: recall + ADC/codebook contracts in LlmSpec
    "q_knn_batch_pq"    -> (LlmKnn.qKnnBatchPq _),    // no-oracle: per-probe parity with single-probe PQ in LlmSpec
    "q_knn_cosine_ivfpq" -> (LlmKnn.qKnnCosineIvfPq _), // no-oracle: recall + pruning + code-parity in LlmSpec
    "q_knn_batch_ivfpq" -> (LlmKnn.qKnnBatchIvfPq _),   // no-oracle: per-probe parity with single-probe IVF-PQ in LlmSpec
    "q_cross_source_keep" -> (Llm.qCrossSourceKeep _),
    "q_bm25"           -> (LlmRetrieval.qBm25 _),
    "q_hybrid_rrf"     -> (LlmRetrieval.qHybridRrf _),
    "q_mmr_rerank"     -> (LlmRetrieval.qMmrRerank _),
    "q_token_bpe"      -> (LlmText.qTokenBpe _),
    "q_bpe_train"      -> (LlmText.qBpeTrain _), // no-oracle: iterative training not SQL-expressible; contracts in LlmSpec
    "q_containment"    -> (Llm.qContainment _),
    "q_block_dedup"    -> (Llm.qBlockDedup _),
    "q_substring_dedup" -> (Llm.qSubstringDedup _),
    "q_substring_excise" -> (Llm.qSubstringExcise _),
    "q_pagerank"       -> (Graph.qPagerank _),
    "q_graph_triangles" -> (Graph.qTriangles _),
    "q_event_anomaly"  -> (Cdc.qEventAnomaly _),
    "q_anomaly_mad"    -> (Cdc.qAnomalyMad _),
    "q_sample_weighted" -> (LlmMix.qSampleWeighted _),
    "q_count_min"      -> (LlmText.qCountMin _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracle.sql
}
