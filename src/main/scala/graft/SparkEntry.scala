package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] with a matching [[oracleSql]] is hash-checked by
  * the driver against DuckDB on the same parquet tables (sf0.01). Column names
  * are aliased identically on both sides.
  */
object SparkEntry {

  /** Flagship: Q1 pricing summary over lineitem round-tripped through the 4mc
    * container — exercises the format writer, the splittable reader, line
    * framing, typed parsing, and Catalyst agg in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    RoundTrip.q1OverFourMc(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational (SURVEY §2 C + Catalyst operators over the testdata tables)
    "q1_pricing_summary" -> (Queries.q1PricingSummary _),
    "q6_forecast" -> (Queries.q6Forecast _),
    "q3_shipping_priority" -> (Queries.q3ShippingPriority _),
    "q4_order_priority" -> (Queries.q4OrderPriority _),
    "q5_local_supplier" -> (Queries.q5LocalSupplier _),
    "q10_returned_items" -> (Queries.q10ReturnedItems _),
    "q_anti_join" -> (Queries.qAntiCustomersNoOrders _),
    "q_window_top_orders" -> (Queries.qWindowTopOrders _),
    "q_rollup_revenue" -> (Queries.qRollupRevenue _),
    "q_distinct_counts" -> (Queries.qDistinctParts _),
    "q_parts_above_avg" -> (Queries.qPartsAboveAvg _),
    "q_nations_except" -> (Queries.qNationsExcept _),
    "q_explode_part_words" -> (Queries.qExplodePartWords _),
    "q7_nation_volume" -> (Queries.q7NationVolume _),
    "q17_small_quantity" -> (Queries.q17SmallQuantity _),
    "q14_promo_revenue" -> (Queries.q14PromoRevenue _),
    "q_having_suppliers" -> (Queries.qHavingSuppliers _),
    "q_events_hourly" -> (Queries.qEventsHourly _),
    "q_events_sessions" -> (Queries.qEventsSessions _),
    "q8_market_share" -> (Queries2.q8MarketShare _),
    "q9_profit_nation" -> (Queries2.q9ProfitNation _),
    "q12_priority_class" -> (Queries2.q12PriorityClass _),
    "q13_order_distribution" -> (Queries2.q13OrderDistribution _),
    "q15_top_supplier" -> (Queries2.q15TopSupplier _),
    "q16_supplier_variety" -> (Queries2.q16SupplierVariety _),
    "q18_large_orders" -> (Queries2.q18LargeOrders _),
    "q19_disjunctive" -> (Queries2.q19Disjunctive _),
    "q22_wealthy_inactive" -> (Queries2.q22WealthyInactive _),
    "q_cube_revenue" -> (Queries2.qCubeRevenue _),
    "q_grouping_sets" -> (Queries2.qGroupingSets _),
    "q_percentiles" -> (Queries2.qPercentiles _),
    "q_pivot_status" -> (Queries2.qPivotStatus _),
    "q_json_props" -> (Queries2.qJsonProps _),
    "q_intersect_nations" -> (Queries2.qIntersectNations _),
    "q_window_running" -> (Queries2.qWindowRunning _),
    "q2_min_cost_supplier" -> (Queries3.q2MinCostSupplier _),
    "q11_important_parts" -> (Queries3.q11ImportantParts _),
    "q20_promotion_suppliers" -> (Queries3.q20PromotionSuppliers _),
    "q21_waiting_suppliers" -> (Queries3.q21WaitingSuppliers _),
    "asof_purchase_attribution" -> (graft.ops.TemporalJoins.asofPurchaseAttribution _),
    "range_join_view_click" -> (graft.ops.TemporalJoins.rangeViewClick _),
    // format layer: queries over 4mc/4mz round-tripped tables
    "fourmc_lineitem_q1" -> (RoundTrip.q1OverFourMc _),
    "fourmz_lineitem_q1" -> (RoundTrip.q1OverFourMz _),
    "fourmz_document_stats" -> (RoundTrip.documentStats _),
    "fourmz_events_hourly" -> (RoundTrip.eventsHourlyOverFourMz _),
    "fourmz_events_window_skipped" -> (RoundTrip.eventsWindowSkipped _),
    "fourmc_orders_selfjoin" -> (RoundTrip.ordersSelfJoinCheck _),
    "fourmc_partition_pruned" -> (RoundTrip.docsPartitionPruned _),
    "fourmc_q6_selective" -> (RoundTrip.q6OverFourMc _),
    "fourmc_q6_skipped" -> (RoundTrip.q6OverFourMcSkipped _),
    // LLM-pipeline operators (SURVEY §2 D)
    "dedup_exact_docs" -> (PipelineQueries.dedupExactDocs _),
    "dedup_ngram_pairs" -> (PipelineQueries.dedupNgramPairs _),
    "dedup_simhash" -> (PipelineQueries.dedupSimhash _),
    "dedup_minhash_pairs" -> (PipelineQueries.dedupMinhashPairs _),
    "dedup_clusters" -> ((s: SparkSession, d: String) => PipelineQueries.dedupClusters(s, d)),
    "dedup_keep_canonical" -> (PipelineQueries.dedupKeepCanonical _),
    "pack_training_sequences" -> (PipelineQueries.packTrainingSequences _),
    "sample_token_budget" -> (PipelineQueries.sampleTokenBudget _),
    "mixture_weights" -> (PipelineQueries.mixtureWeights _),
    "mixture_resample" -> (PipelineQueries.mixtureResample _),
    "span_dup_coverage" -> (PipelineQueries.spanDupCoverage _),
    "span_dedup_rewrite" -> (PipelineQueries.spanDedupRewrite _),
    "corpus_materialize" -> (PipelineQueries.corpusMaterialize _),
    "incremental_dedup" -> (PipelineQueries.incrementalDedup _),
    "incremental_dedup_steady" -> (PipelineQueries.incrementalDedupSteady _),
    "quality_curriculum" -> (PipelineQueries.qualityCurriculum _),
    "domain_cap_sample" -> (PipelineQueries.domainCapSample _),
    "dedup_embedding_pairs_exact_baseline" -> (PipelineQueries.dedupEmbeddingPairsExactBaseline _),
    "dedup_embedding_pairs_tight" -> (PipelineQueries.dedupEmbeddingPairsTight _),
    "semantic_dedup" -> (PipelineQueries.semanticDedup _),
    "unigram_logprob" -> (PipelineQueries.unigramLogProb _),
    "dsir_select" -> (PipelineQueries.dsirSelect _),
    "ann_brute_force" -> (PipelineQueries.annBruteForce _),
    "ann_lsh" -> (PipelineQueries.annLsh _),
    "ann_ivf" -> (PipelineQueries.annIvf _),
    "ann_pq" -> (PipelineQueries.annPq _),
    "text_stats" -> (PipelineQueries.textStats _),
    "lang_id_confusion" -> (PipelineQueries.langIdConfusion _),
    "doc_fingerprints" -> (PipelineQueries.docFingerprints _),
    "quality_filter" -> (PipelineQueries.qualityFilter _),
    "vocab_stats" -> (PipelineQueries.vocabStats _),
    "token_counts_subword" -> (PipelineQueries.tokenCountsSubword _),
    "multimodal_pipeline" -> (PipelineQueries.multimodalPipeline _),
    "media_header_parse" -> (PipelineQueries.mediaHeaderParse _),
    "protobuf_tag_counts" -> (PipelineQueries.protobufTagCounts _),
    "topk_event_types" -> (PipelineQueries.topkEventTypes _),
    "skew_salted_join" -> (PipelineQueries.skewSaltedJoin _),
    "skew_hot_keys" -> (PipelineQueries.skewHotKeys _),
    "bucketed_join_revenue" -> (PipelineQueries.bucketedJoinRevenue _),
    "protobuf_packed_lens" -> (PipelineQueries.protobufPackedLens _),
    "decontaminate_eval" -> (PipelineQueries.decontaminateEval _),
    "decontaminate_eval_capped" -> (PipelineQueries.decontaminateEvalCapped _),
    "sample_stratified" -> (PipelineQueries.sampleStratified _),
    "split_assignment" -> (PipelineQueries.splitAssignmentCounts _),
    "doc_chunk_stats" -> (PipelineQueries.docChunkStats _),
    "tfidf_top_terms" -> (PipelineQueries.tfidfTopTerms _),
    "repetition_signals" -> (PipelineQueries.repetitionSignals _),
    "pii_scrub_events" -> (PipelineQueries.piiScrubEvents _),
    "bm25_top_docs" -> (PipelineQueries.bm25TopDocs _),
    "bloom_filtered_join" -> (PipelineQueries.bloomFilteredJoin _),
    "streaming_ingest_fourmc" -> (graft.streaming.StreamingQueries.streamingIngestFourMc _),
    "streaming_ingest_partitioned" -> (graft.streaming.StreamingQueries.streamingIngestPartitioned _),
    // D7: Structured Streaming over a 4mz dir, drained to a batch result
    "streaming_events_hourly" -> (graft.streaming.StreamingQueries.streamingEventsHourly _),
    "streaming_events_watermarked" -> (graft.streaming.StreamingQueries.streamingEventsWatermarked _),
    "streaming_sessions_stateful" -> (graft.streaming.StreamingQueries.streamingSessionsStateful _),
    "streaming_dedup_ingest" -> (graft.streaming.StreamingQueries.streamingDedupIngest _),
    "streaming_interval_join" -> (graft.streaming.StreamingQueries.streamingIntervalJoin _)
  )

  /** Resolve the SPARK_GRAFT_ONLY filter (comma-separated names; blank or
    * unset = everything). Warnings for unknown names go through `warn`;
    * callers decide the empty-selection policy (both entry points treat it
    * as fatal — benching or verifying zero queries would silently zero a
    * round).
    */
  def selectQueries(only: Option[String], warn: String => Unit): Map[String, (SparkSession, String) => DataFrame] = {
    val names = only
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    names.foreach { ns =>
      val unknown = ns -- queries.keySet
      if (unknown.nonEmpty) warn(s"unknown query names in SPARK_GRAFT_ONLY: ${unknown.mkString(",")}")
    }
    names match {
      case Some(ns) => queries.filter { case (n, _) => ns(n) }
      case None     => queries
    }
  }

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> Queries.q1Sql,
    "q6_forecast" -> Queries.q6Sql,
    "q3_shipping_priority" -> Queries.q3Sql,
    "q4_order_priority" -> Queries.q4Sql,
    "q5_local_supplier" -> Queries.q5Sql,
    "q10_returned_items" -> Queries.q10Sql,
    "q_anti_join" -> Queries.qAntiSql,
    "q_window_top_orders" -> Queries.qWindowSql,
    "q_rollup_revenue" -> Queries.qRollupSql,
    "q_distinct_counts" -> Queries.qDistinctSql,
    "q_parts_above_avg" -> Queries.qPartsAboveAvgSql,
    "q_nations_except" -> Queries.qNationsExceptSql,
    "q_explode_part_words" -> Queries.qExplodeSql,
    "q7_nation_volume" -> Queries.q7Sql,
    "q17_small_quantity" -> Queries.q17Sql,
    "q14_promo_revenue" -> Queries.q14Sql,
    "q_having_suppliers" -> Queries.qHavingSql,
    "q_events_hourly" -> Queries.qEventsHourlySql,
    "q_events_sessions" -> Queries.qEventsSessionsSql,
    "q8_market_share" -> Queries2.q8Sql,
    "q9_profit_nation" -> Queries2.q9Sql,
    "q12_priority_class" -> Queries2.q12Sql,
    "q13_order_distribution" -> Queries2.q13Sql,
    "q15_top_supplier" -> Queries2.q15Sql,
    "q16_supplier_variety" -> Queries2.q16Sql,
    "q18_large_orders" -> Queries2.q18Sql,
    "q19_disjunctive" -> Queries2.q19Sql,
    "q22_wealthy_inactive" -> Queries2.q22Sql,
    "q_cube_revenue" -> Queries2.qCubeSql,
    "q_grouping_sets" -> Queries2.qGroupingSetsSql,
    "q_percentiles" -> Queries2.qPercentilesSql,
    "q_pivot_status" -> Queries2.qPivotSql,
    "q_json_props" -> Queries2.qJsonSql,
    "q_intersect_nations" -> Queries2.qIntersectSql,
    "q_window_running" -> Queries2.qWindowRunningSql,
    "q2_min_cost_supplier" -> Queries3.q2Sql,
    "q11_important_parts" -> Queries3.q11Sql,
    "q20_promotion_suppliers" -> Queries3.q20Sql,
    "q21_waiting_suppliers" -> Queries3.q21Sql,
    "asof_purchase_attribution" -> graft.ops.TemporalJoins.asofPurchaseAttributionSql,
    "range_join_view_click" -> graft.ops.TemporalJoins.rangeViewClickSql,
    "fourmc_lineitem_q1" -> Queries.q1Sql,
    "fourmz_lineitem_q1" -> Queries.q1Sql,
    "fourmz_document_stats" -> RoundTrip.documentStatsSql,
    "fourmz_events_hourly" -> Queries.qEventsHourlySql,
    "fourmz_events_window_skipped" -> RoundTrip.eventsWindowSkippedSql,
    "fourmc_orders_selfjoin" -> RoundTrip.ordersSelfJoinSql,
    "fourmc_partition_pruned" -> RoundTrip.docsPartitionPrunedSql,
    "fourmc_q6_selective" -> Queries.q6Sql,
    "fourmc_q6_skipped" -> Queries.q6Sql,
    // pipeline operators with DuckDB-expressible semantics
    "dedup_exact_docs" -> PipelineQueries.dedupExactSql,
    "dedup_ngram_pairs" -> PipelineQueries.dedupNgramSql,
    "dedup_simhash" -> PipelineQueries.dedupSimhashSql,
    "dedup_minhash_pairs" -> PipelineQueries.dedupMinhashSql,
    "dedup_clusters" -> PipelineQueries.dedupClustersSql,
    "dedup_keep_canonical" -> PipelineQueries.dedupKeepCanonicalSql,
    "pack_training_sequences" -> PipelineQueries.packTrainingSequencesSql,
    "sample_token_budget" -> PipelineQueries.sampleTokenBudgetSql,
    "mixture_weights" -> PipelineQueries.mixtureWeightsSql,
    "mixture_resample" -> PipelineQueries.mixtureResampleSql,
    "span_dup_coverage" -> PipelineQueries.spanDupCoverageSql,
    "span_dedup_rewrite" -> PipelineQueries.spanDedupRewriteSql,
    "corpus_materialize" -> PipelineQueries.corpusMaterializeSql,
    "incremental_dedup" -> PipelineQueries.incrementalDedupSql,
    "incremental_dedup_steady" -> PipelineQueries.incrementalDedupSteadySql,
    "quality_curriculum" -> PipelineQueries.qualityCurriculumSql,
    "domain_cap_sample" -> PipelineQueries.domainCapSampleSql,
    "dedup_embedding_pairs_exact_baseline" -> PipelineQueries.dedupEmbeddingPairsExactBaselineSql,
    "dedup_embedding_pairs_tight" -> PipelineQueries.dedupEmbeddingPairsTightSql,
    "semantic_dedup" -> PipelineQueries.semanticDedupSql,
    "unigram_logprob" -> PipelineQueries.unigramLogProbSql,
    "dsir_select" -> PipelineQueries.dsirSelectSql,
    "ann_brute_force" -> PipelineQueries.annBruteForceSql,
    "ann_lsh" -> PipelineQueries.annLshSql,
    "ann_ivf" -> PipelineQueries.annIvfSql,
    "ann_pq" -> PipelineQueries.annPqSql,
    "text_stats" -> PipelineQueries.textStatsSql,
    "lang_id_confusion" -> PipelineQueries.langIdConfusionSql,
    "doc_fingerprints" -> PipelineQueries.docFingerprintsSql,
    "quality_filter" -> PipelineQueries.qualityFilterSql,
    "vocab_stats" -> PipelineQueries.vocabStatsSql,
    "token_counts_subword" -> PipelineQueries.tokenCountsSubwordSql,
    "multimodal_pipeline" -> PipelineQueries.multimodalSql,
    "media_header_parse" -> PipelineQueries.mediaHeaderParseSql,
    "protobuf_tag_counts" -> PipelineQueries.protobufTagCountsSql,
    "topk_event_types" -> PipelineQueries.topkEventTypesSql,
    "skew_salted_join" -> PipelineQueries.skewSaltedJoinSql,
    "skew_hot_keys" -> PipelineQueries.skewHotKeysSql,
    "bucketed_join_revenue" -> PipelineQueries.bucketedJoinRevenueSql,
    "protobuf_packed_lens" -> PipelineQueries.protobufPackedLensSql,
    "decontaminate_eval" -> PipelineQueries.decontaminateEvalSql,
    "decontaminate_eval_capped" -> PipelineQueries.decontaminateEvalCappedSql,
    "sample_stratified" -> PipelineQueries.sampleStratifiedSql,
    "split_assignment" -> PipelineQueries.splitAssignmentSql,
    "doc_chunk_stats" -> PipelineQueries.docChunkStatsSql,
    "tfidf_top_terms" -> PipelineQueries.tfidfTopTermsSql,
    "repetition_signals" -> PipelineQueries.repetitionSignalsSql,
    "pii_scrub_events" -> PipelineQueries.piiScrubEventsSql,
    "bm25_top_docs" -> PipelineQueries.bm25TopDocsSql,
    "bloom_filtered_join" -> PipelineQueries.bloomFilteredJoinSql,
    "streaming_ingest_fourmc" -> graft.streaming.StreamingQueries.streamingIngestFourMcSql,
    "streaming_ingest_partitioned" -> graft.streaming.StreamingQueries.streamingIngestPartitionedSql,
    "streaming_events_hourly" -> graft.streaming.StreamingQueries.streamingEventsHourlySql,
    "streaming_events_watermarked" -> graft.streaming.StreamingQueries.streamingEventsWatermarkedSql,
    "streaming_sessions_stateful" -> graft.streaming.StreamingQueries.streamingSessionsStatefulSql,
    "streaming_dedup_ingest" -> graft.streaming.StreamingQueries.streamingDedupIngestSql,
    "streaming_interval_join" -> graft.streaming.StreamingQueries.streamingIntervalJoinSql
  )
}
