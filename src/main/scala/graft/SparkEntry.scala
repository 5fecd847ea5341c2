package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  *
  * Every implemented operator has a `queries` entry; `oracleSql` carries the
  * DuckDB-equivalent SQL the driver cross-checks against at sf=0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference pipeline end-to-end: ingest → layout → clause graph
    * → schema-guided extract → recover → validate → finalize, one row per
    * document.
    */
  def entry(spark: SparkSession): DataFrame =
    Orchestrator.pipelineOutput(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §A relational core
    "q1_pricing_summary"   -> (Relational.q1PricingSummary _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_local_supplier"    -> (Relational.q5LocalSupplier _),
    "q10_returned_items"   -> (Relational.q10ReturnedItems _),
    "q4_order_priority"    -> (Relational.q4OrderPriority _),
    "q18_large_orders"     -> (Relational.q18LargeOrders _),
    "q_market_share"       -> (Relational.qMarketShare _),
    "q_window_topn"        -> (Relational.qWindowTopN _),
    "q_rollup_agg"         -> (Relational.qRollupAgg _),
    "q_semi_anti"          -> (Relational.qSemiAnti _),
    "q_scalar_subquery"    -> (Relational.qScalarSubquery _),
    // §B form-schema ETL pipeline
    "ingest_blocks"        -> (Ingestion.ingestBlocks _),
    "ocr_route"            -> (Ingestion.ocrRoute _),
    "tokenize_words"       -> (Ingestion.tokenizeWords _),
    "bbox_normalize"       -> (Ingestion.bboxNormalize _),
    "layout_classify"      -> (Layout.layoutClassify _),
    "clause_graph"         -> (Layout.clauseGraph _),
    "extract_fields"       -> (SchemaExtract.extractFields _),
    "extract_json_fields"  -> (SchemaExtract.extractJsonFields _),
    "parse_typed"          -> (SchemaExtract.parseTyped _),
    "validate_fields"      -> (Validation.validateFields _),
    "form_field_validate"  -> (Validation.formFieldValidate _),
    "form_complete"        -> (Validation.formComplete _),
    "form_recovered"       -> (Orchestrator.formRecovered _),
    "pipeline_output"      -> (Orchestrator.pipelineOutput _),
    "evaluate_extraction"  -> (Evaluation.evaluateExtraction _),
    "evaluate_vs_baseline" -> (Evaluation.evaluateVsBaseline _),
    // §C LLM-training-data operators
    "dedup_exact"          -> (Dedup.dedupExact _),
    "dedup_ngram_jaccard"  -> (Dedup.dedupNgramJaccard _),
    "dedup_minhash_lsh"    -> (Dedup.dedupMinhashLsh _),
    "dedup_simhash"        -> (Dedup.dedupSimhash _),
    "dedup_simhash_pairs"  -> (Dedup.dedupSimhashPairs _),
    "dedup_embedding"      -> (Dedup.dedupEmbedding _),
    "dedup_clusters"       -> (Dedup.dedupClusters _),
    "ann_topk"             -> (Similarity.annTopK _),
    "ann_topk_ivf"         -> (Similarity.annTopKIvf _),
    "bm25_search"          -> (Similarity.bm25Search _),
    "retrieve_similar_docs" -> (Similarity.retrieveSimilarDocs _),
    "lang_id"              -> (TextAnalysis.langId _),
    "quality_score"        -> (TextAnalysis.qualityScore _),
    "token_count"          -> (TextAnalysis.tokenCount _),
    "doc_fingerprint"      -> (TextAnalysis.docFingerprint _),
    "multimodal_features"  -> (Multimodal.multimodalFeatures _),
    "split_assign"         -> (CorpusOps.splitAssign _),
    "stratified_sample"    -> (CorpusOps.stratifiedSample _),
    "text_normalize"       -> (CorpusOps.textNormalize _),
    "corpus_stats"         -> (CorpusOps.corpusStats _),
    "bottomk_sample"       -> (CorpusOps.bottomkSample _),
    "quality_filter"       -> (Curation.qualityFilter _),
    "decontaminate"        -> (Curation.decontaminate _),
    "pack_sequences"       -> (Curation.packSequences _),
    "domain_mix_sample"    -> (Curation.domainMixSample _),
    // §D events
    "events_windowed"      -> (Events.eventsWindowed _),
    "events_sessionize"    -> (Events.eventsSessionize _),
    "events_session_window" -> (Events.eventsSessionWindow _),
    "events_funnel"        -> (Events.eventsFunnel _),
    "events_top_users"     -> (Events.eventsTopUsers _),
    "events_enrich_join"   -> (Events.eventsEnrichJoin _),
    "events_asof_join"     -> (AsOf.eventsAsofJoin _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary"   -> Relational.q1Sql,
    "q3_shipping_priority" -> Relational.q3Sql,
    "q5_local_supplier"    -> Relational.q5Sql,
    "q10_returned_items"   -> Relational.q10Sql,
    "q4_order_priority"    -> Relational.q4Sql,
    "q18_large_orders"     -> Relational.q18Sql,
    "q_market_share"       -> Relational.qMarketShareSql,
    "q_window_topn"        -> Relational.qWindowTopNSql,
    "q_rollup_agg"         -> Relational.qRollupAggSql,
    "q_semi_anti"          -> Relational.qSemiAntiSql,
    "q_scalar_subquery"    -> Relational.qScalarSubquerySql,
    "ingest_blocks"        -> Ingestion.ingestBlocksSql,
    "ocr_route"            -> Ingestion.ocrRouteSql,
    "tokenize_words"       -> Ingestion.tokenizeWordsSql,
    "bbox_normalize"       -> Ingestion.bboxNormalizeSql,
    "layout_classify"      -> Layout.layoutClassifySql,
    "clause_graph"         -> Layout.clauseGraphSql,
    "extract_fields"       -> SchemaExtract.extractFieldsSql,
    "extract_json_fields"  -> SchemaExtract.extractJsonFieldsSql,
    "parse_typed"          -> SchemaExtract.parseTypedSql,
    "validate_fields"      -> Validation.validateFieldsSql,
    "form_field_validate"  -> Validation.formFieldValidateSql,
    "form_complete"        -> Validation.formCompleteSql,
    "form_recovered"       -> Orchestrator.formRecoveredSql,
    "pipeline_output"      -> Orchestrator.pipelineOutputSql,
    "evaluate_extraction"  -> Evaluation.evaluateExtractionSql,
    "evaluate_vs_baseline" -> Evaluation.evaluateVsBaselineSql,
    "dedup_exact"          -> Dedup.dedupExactSql,
    "dedup_ngram_jaccard"  -> Dedup.dedupNgramJaccardSql,
    "dedup_minhash_lsh"    -> Dedup.dedupMinhashLshSql,
    "dedup_simhash"        -> Dedup.dedupSimhashSql,
    "dedup_simhash_pairs"  -> Dedup.dedupSimhashPairsSql,
    "dedup_embedding"      -> Dedup.dedupEmbeddingSql,
    "dedup_clusters"       -> Dedup.dedupClustersSql,
    "ann_topk"             -> Similarity.annTopKSql,
    "ann_topk_ivf"         -> Similarity.annTopKIvfSql,
    "bm25_search"          -> Similarity.bm25SearchSql,
    "retrieve_similar_docs" -> Similarity.retrieveSimilarDocsSql,
    "lang_id"              -> TextAnalysis.langIdSql,
    "quality_score"        -> TextAnalysis.qualityScoreSql,
    "token_count"          -> TextAnalysis.tokenCountSql,
    "doc_fingerprint"      -> TextAnalysis.docFingerprintSql,
    "multimodal_features"  -> Multimodal.multimodalFeaturesSql,
    "split_assign"         -> CorpusOps.splitAssignSql,
    "stratified_sample"    -> CorpusOps.stratifiedSampleSql,
    "text_normalize"       -> CorpusOps.textNormalizeSql,
    "corpus_stats"         -> CorpusOps.corpusStatsSql,
    "bottomk_sample"       -> CorpusOps.bottomkSampleSql,
    "quality_filter"       -> Curation.qualityFilterSql,
    "decontaminate"        -> Curation.decontaminateSql,
    "pack_sequences"       -> Curation.packSequencesSql,
    "domain_mix_sample"    -> Curation.domainMixSampleSql,
    "events_windowed"      -> Events.eventsWindowedSql,
    "events_sessionize"    -> Events.eventsSessionizeSql,
    "events_session_window" -> Events.eventsSessionWindowSql,
    "events_funnel"        -> Events.eventsFunnelSql,
    "events_top_users"     -> Events.eventsTopUsersSql,
    "events_enrich_join"   -> Events.eventsEnrichJoinSql,
    "events_asof_join"     -> AsOf.eventsAsofJoinSql,
  )
}
