package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CurationQueries, DedupQueries, PipelineQueries, Relational, SimilarityQueries, TemporalQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` with a matching `oracleSql` key is
  * hash-checked against DuckDB on the same parquet tables; entries
  * without an oracle get a weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.regionalRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.pricingSummary _),
    "q02_filter_project" -> (Relational.filterProject _),
    "q03_conditional_agg" -> (Relational.conditionalAgg _),
    "q04_count_distinct" -> (Relational.countDistinctAgg _),
    "q05_timestamp_range" -> (Relational.timestampRange _),
    "q06_topk_customers" -> (Relational.topKCustomers _),
    "q07_broadcast_enrich" -> (Relational.broadcastEnrich _),
    "q08_regional_revenue" -> (Relational.regionalRevenue _),
    "q09_anti_join" -> (Relational.antiJoinDormant _),
    "q10_latest_per_key" -> (Relational.latestOrderPerCustomer _),
    "q11_union_entities" -> (Relational.unionEntities _),
    "q12_stable_ids" -> (Relational.stableIds _),
    "q13_json_extract" -> (Relational.jsonExtractAgg _),
    "q14_hourly_rollup" -> (Relational.hourlyEventRollup _),
    "q15_top_tokens" -> (TextQueries.topTokens _),
    "q16_exact_dedup" -> (TextQueries.exactDedup _),
    "q17_doc_stats" -> (TextQueries.docStats _),
    "q18_lang_profile" -> (TextQueries.langProfile _),
    "q19_knn_cosine" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.knnBruteForce(s, d)),
    "q20_minhash_signature" -> (DedupQueries.minhashSignature _),
    "q21_minhash_lsh_dedup" -> (DedupQueries.minhashLshDedup _),
    "q22_ngram_jaccard" -> (DedupQueries.ngramJaccard _),
    "q23_simhash" -> (DedupQueries.simhash _),
    "q24_embedding_topk_pairs" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.topKPairs(s, d)),
    "q25_ann_lsh_knn" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.annLshKnn(s, d)),
    "q26_lang_id" -> (TextQueries.langId _),
    "q27_winnow_fingerprint" -> (TextQueries.winnowFingerprint _),
    "q28_bpe_token_count" -> (TextQueries.bpeTokenCount _),
    "q29_quality_score" -> (TextQueries.qualityScore _),
    "q30_multimodal_meta" -> (PipelineQueries.multimodalMeta _),
    "q31_multimodal_decode" -> (PipelineQueries.multimodalDecode _),
    "q32_incremental_merge" -> (PipelineQueries.incrementalMerge _),
    "q33_sessionize" -> (PipelineQueries.sessionize _),
    "q34_ivf_knn" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.ivfKnn(s, d)),
    "q35_dedup_clusters" -> (DedupQueries.dedupClusters _),
    "q36_blame_rollup" -> (Relational.blameRollup _),
    "q37_salted_join" -> (Relational.saltedJoinRollup _),
    "q38_selective_enrich" -> (PipelineQueries.selectiveEnrich _),
    "q39_ivf_kmeans_knn" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.kmeansIvfKnn(s, d)),
    "q40_embedding_near_dup" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.embeddingNearDupPairs(s, d)),
    "q41_multimodal_frame_sample" ->
      (PipelineQueries.multimodalFrameSample(_, _)),
    "q42_ann_multiprobe_knn" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.annMultiProbeKnn(s, d)),
    "q43_embedding_near_dup_multiprobe" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.embeddingNearDupPairsMultiProbe(s, d)),
    "q44_simhash_near_dup" -> (DedupQueries.simhashNearDup _),
    "q45_asof_join" -> (TemporalQueries.asofJoin _),
    "q46_range_join" -> (TemporalQueries.rangeJoin _),
    "q47_revenue_rollup" -> (Relational.revenueRollup _),
    "q48_event_pivot" -> (Relational.eventPivot _),
    "q49_length_quantiles" -> (TextQueries.lengthQuantiles _),
    "q50_simhash64_near_dup" -> (DedupQueries.simhashNearDup64 _),
    "q51_bm25_search" -> (TextQueries.bm25Search _),
    "q52_pq_ann_knn" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.pqAnnKnn(s, d)),
    "q53_curation_funnel" -> (PipelineQueries.curationFunnel _),
    "q54_dataset_split" -> (PipelineQueries.datasetSplit _),
    "q55_ivfpq_ann_knn" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.ivfPqAnnKnn(s, d)),
    "q56_order_cube" -> (Relational.orderCube _),
    "q57_decontaminate" -> ((s: SparkSession, d: String) =>
      CurationQueries.decontaminate(s, d)),
    "q58_repetition_filter" -> (CurationQueries.repetitionFilter _),
    "q59_pii_redaction" -> (CurationQueries.piiRedaction _),
    "q60_semantic_dedup" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.semanticDedup(s, d)),
    "q61_lm_score" -> ((s: SparkSession, d: String) =>
      CurationQueries.lmScore(s, d)),
    "q62_lm_score_split" -> ((s: SparkSession, d: String) =>
      CurationQueries.lmScoreSplit(s, d)),
    "q63_curation_sweep" -> ((s: SparkSession, d: String) =>
      PipelineQueries.curationSweep(s, d)),
    "q64_ivfpq_residual_knn" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.ivfPqResidualKnn(s, d)),
    "q65_line_filter" -> (CurationQueries.lineFilter _),
    "q66_sequence_pack" -> ((s: SparkSession, d: String) =>
      PipelineQueries.sequencePack(s, d)),
    "q67_mixture_sample" -> (PipelineQueries.mixtureSample _),
    "q68_incremental_near_dup" -> ((s: SparkSession, d: String) =>
      DedupQueries.incrementalNearDup(s, d)),
    "q69_contamination_coverage" -> ((s: SparkSession, d: String) =>
      CurationQueries.contaminationCoverage(s, d)),
    "q70_paragraph_dedup" -> ((s: SparkSession, d: String) =>
      CurationQueries.paragraphDedup(s, d)),
    "q72_nb_quality" -> (CurationQueries.nbQuality _),
    "q74_source_drift" -> (TextQueries.sourceDrift _),
    "q75_bpe_pair_merge" -> (TextQueries.bpePairMerge _),
    "q76_normalized_dedup" -> (DedupQueries.normalizedDedup _),
    "q77_tfidf_topk" -> ((s: SparkSession, d: String) =>
      TextQueries.tfidfTopTerms(s, d)),
    "q78_embedding_outliers" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.embeddingOutliers(s, d)),
    "q79_zipf_slope" -> ((s: SparkSession, d: String) =>
      TextQueries.zipfSlope(s, d)),
    "q80_near_dup_by_source" -> (DedupQueries.nearDupBySource _),
    "q81_tokenizer_fertility" -> (TextQueries.tokenizerFertility _),
    "q82_minhash_calibration" -> (DedupQueries.minhashCalibrationReport _),
    "q83_markup_filter" -> (CurationQueries.markupFilter _),
    "q84_conversion_funnel" -> (Relational.conversionFunnel _),
    "q85_retention_cohorts" -> ((s: SparkSession, d: String) =>
      Relational.retentionCohorts(s, d)),
    "q86_lexical_diversity" -> (TextQueries.lexicalDiversity _),
    "q88_url_domains" -> (CurationQueries.urlDomainReport _),
    "q90_sq_ann_knn" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.sqAnnKnn(s, d)),
    "q89_containment_dedup" -> (DedupQueries.containmentDedup _),
    "q87_pmi_collocations" -> ((s: SparkSession, d: String) =>
      TextQueries.pmiCollocations(s, d)),
    "q73_dsir_weights" -> ((s: SparkSession, d: String) =>
      CurationQueries.dsirWeights(s, d)),
    "q71_substring_dedup" -> ((s: SparkSession, d: String) =>
      DedupQueries.substringDedup(s, d)),
    "q91_perplexity_buckets" -> (CurationQueries.perplexityBuckets _),
    "q92_edit_distance_dedup" -> ((s: SparkSession, d: String) =>
      DedupQueries.editDistanceDedup(s, d)),
    "q93_weighted_sample" -> ((s: SparkSession, d: String) =>
      PipelineQueries.weightedSample(s, d)),
    "q94_cross_source_overlap" -> (TextQueries.crossSourceOverlap _),
    "q95_bloom_decontaminate" -> ((s: SparkSession, d: String) =>
      CurationQueries.bloomDecontaminate(s, d)),
    "q96_event_anomalies" -> ((s: SparkSession, d: String) =>
      Relational.eventAnomalies(s, d)),
    "q97_snapshot_diff" -> (PipelineQueries.snapshotDiff _),
    "q98_phrase_search" -> ((s: SparkSession, d: String) =>
      TextQueries.phraseSearch(s, d)),
    "q99_fuzzy_search" -> ((s: SparkSession, d: String) =>
      TextQueries.fuzzySearch(s, d)),
    "q100_more_like_this" -> ((s: SparkSession, d: String) =>
      TextQueries.moreLikeThis(s, d)),
    "q101_significant_terms" -> ((s: SparkSession, d: String) =>
      TextQueries.significantTerms(s, d)),
    "q102_multi_match" -> ((s: SparkSession, d: String) =>
      TextQueries.multiMatchSearch(s, d)),
    "q103_ann_calibration" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.annCalibrationCard(s, d)),
    "q104_imi_ivf_knn" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.imiIvfKnn(s, d)),
    "q105_hybrid_rrf" -> ((s: SparkSession, d: String) =>
      TextQueries.hybridRrfSearch(s, d)),
    "q106_incremental_ann" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.incrementalAnnIndex(s, d)),
    "q107_function_score" -> ((s: SparkSession, d: String) =>
      TextQueries.functionScoreSearch(s, d)),
    "q108_term_suggest" -> ((s: SparkSession, d: String) =>
      TextQueries.termSuggest(s, d)),
    "q109_dense_histogram" -> (Relational.hourlyRollupDense _),
    "q110_percentile_ranks" -> ((s: SparkSession, d: String) =>
      Relational.percentileRanks(s, d)),
    "q111_chunk_documents" -> ((s: SparkSession, d: String) =>
      PipelineQueries.chunkDocuments(s, d)),
    "q112_collapsed_search" -> ((s: SparkSession, d: String) =>
      TextQueries.collapsedSearch(s, d)),
    "q113_filtered_knn" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.filteredKnn(s, d)),
    "q114_knn_batch" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.knnBatch(s, d)),
    "q115_excise_contaminated" -> ((s: SparkSession, d: String) =>
      CurationQueries.exciseContaminated(s, d)),
    "q116_imi_multiseq" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.imiIvfKnnMultiSeq(s, d)),
    "q117_cluster_retention" -> ((s: SparkSession, d: String) =>
      DedupQueries.clusterRetention(s, d)),
    "q118_rescore" -> ((s: SparkSession, d: String) =>
      TextQueries.rescoreSearch(s, d)),
    "q119_composite_agg" -> ((s: SparkSession, d: String) =>
      Relational.compositeAggPage(s, d)),
    "q120_multi_bench_contamination" -> ((s: SparkSession, d: String) =>
      CurationQueries.multiBenchContamination(s, d)),
    "q121_mixture_plan" -> ((s: SparkSession, d: String) =>
      PipelineQueries.mixturePlan(s, d)),
    "q122_padding_plan" -> ((s: SparkSession, d: String) =>
      PipelineQueries.paddingPlan(s, d)),
    "q123_bool_query" -> ((s: SparkSession, d: String) =>
      TextQueries.boolQuerySearch(s, d)),
    "q124_prefix_query" -> ((s: SparkSession, d: String) =>
      TextQueries.prefixSearch(s, d)),
    "q125_pipeline_aggs" -> ((s: SparkSession, d: String) =>
      Relational.pipelineAggs(s, d)),
    "q126_match_phrase_prefix" -> ((s: SparkSession, d: String) =>
      TextQueries.matchPhrasePrefix(s, d)),
    "q127_mixture_realize" -> ((s: SparkSession, d: String) =>
      PipelineQueries.mixtureRealize(s, d)),
    "q128_simple_query_string" -> ((s: SparkSession, d: String) =>
      TextQueries.simpleQueryString(s, d)),
    "q129_span_near" -> ((s: SparkSession, d: String) =>
      TextQueries.spanNearSearch(s, d)),
    "q130_highlight_search" -> ((s: SparkSession, d: String) =>
      TextQueries.highlightSearch(s, d)),
    "q131_wildcard_query" -> ((s: SparkSession, d: String) =>
      TextQueries.wildcardSearch(s, d)),
    "q132_phrase_suggest" -> ((s: SparkSession, d: String) =>
      TextQueries.phraseSuggest(s, d)),
    "q133_shard_plan" -> ((s: SparkSession, d: String) =>
      PipelineQueries.shardPlan(s, d)),
    "q134_budget_select" -> ((s: SparkSession, d: String) =>
      PipelineQueries.budgetSelect(s, d)),
    "q135_fim_transform" -> ((s: SparkSession, d: String) =>
      PipelineQueries.fimTransform(s, d)),
    "q136_adjacency_matrix" -> ((s: SparkSession, d: String) =>
      TextQueries.adjacencyMatrix(s, d)),
    "q137_classifier_calibration" -> ((s: SparkSession, d: String) =>
      CurationQueries.classifierCalibration(s, d)),
    "q138_index_stats" -> ((s: SparkSession, d: String) =>
      TextQueries.indexStats(s, d)),
    "q139_score_explain" -> ((s: SparkSession, d: String) =>
      TextQueries.scoreExplain(s, d)),
    "q140_min_should_match" -> ((s: SparkSession, d: String) =>
      TextQueries.minShouldMatch(s, d)),
    "q141_boosting_query" -> ((s: SparkSession, d: String) =>
      TextQueries.boostingSearch(s, d)),
    "q142_msearch" -> ((s: SparkSession, d: String) =>
      TextQueries.msearch(s, d)),
    "q143_percolate" -> ((s: SparkSession, d: String) =>
      TextQueries.percolate(s, d)),
    "q144_search_after" -> ((s: SparkSession, d: String) =>
      TextQueries.searchAfterPages(s, d)),
    "q145_stored_lifecycle" -> ((s: SparkSession, d: String) =>
      TextQueries.storedTextLifecycle(s, d)),
    "q146_vector_lifecycle" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.storedVectorLifecycle(s, d)),
    "q147_hybrid_stored" -> ((s: SparkSession, d: String) =>
      TextQueries.hybridStoredLifecycle(s, d)),
    "q148_filtered_knn_stored" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.filteredKnnStored(s, d)),
    "q149_knn_batch_stored" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.knnBatchStored(s, d)),
    "q150_residual_lifecycle" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.storedVectorLifecycle(s, d, codec = "residual")),
    "q151_opq_lifecycle" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.storedVectorLifecycle(s, d, codec = "opq")),
    "q152_sq8_lifecycle" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.storedVectorLifecycle(s, d, codec = "sq8")),
    "q153_imi_lifecycle" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.storedVectorLifecycle(s, d, codec = "residual",
        coarse = "imi")),
    "q154_pgroup_lifecycle" -> ((s: SparkSession, d: String) =>
      SimilarityQueries.storedVectorLifecycle(s, d, pgroups = 4)),
    "q155_rebucket_lifecycle" -> ((s: SparkSession, d: String) =>
      TextQueries.rebucketTextLifecycle(s, d)),
    "q156_multifield_lifecycle" -> ((s: SparkSession, d: String) =>
      TextQueries.multiFieldTextLifecycle(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextQueries.oracles ++ SimilarityQueries.oracles ++
      DedupQueries.oracles ++ PipelineQueries.oracles ++
      TemporalQueries.oracles ++ CurationQueries.oracles
}
