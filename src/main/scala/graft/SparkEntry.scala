package graft

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Checks, DqEngine, EventOps, ExecMetrics, GoldViews, GraphOps, IncrementalGold, MultimodalOps, Pipeline, SketchOps, SnapshotQueries, StreamingOps, TextOps, Upsert, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    GoldViews.claimsSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * `ListMap`, deliberately: iteration order IS declaration order, so
    * Bench executes (and reports) queries in a stable, declared order —
    * a hash-ordered Map reshuffles execution order whenever a key is
    * added, which confounds cross-round per-query timing comparison
    * (round-4 VERDICT item 4). Append new queries at the end of their
    * section; never reorder existing entries between rounds. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    // gold views (SURVEY.md §2.11)
    "q_claims_summary" -> GoldViews.claimsSummary _,
    "q_monthly_trend" -> GoldViews.monthlyTrend _,
    "q_provider_performance" -> GoldViews.providerPerformance _,
    "q_dq_dashboard" -> GoldViews.dqDashboard _,
    "q_member_activity" -> GoldViews.memberActivity _,
    "q_recent_activity" -> GoldViews.recentActivity _,
    // trino_checks transplants + star-schema joins
    "q_category_histogram" -> Checks.categoryHistogram _,
    "q_quality_histogram" -> Checks.qualityHistogram _,
    "q_top_members" -> Checks.topMembers _,
    "q_null_audit" -> Checks.nullAudit _,
    "q_table_stats" -> Checks.tableStats _,
    "q_geo_rollup" -> Checks.geoRollup _,
    "q_fact_join" -> Checks.factJoin _,
    // declarative DQ expectation engine (SURVEY.md §2.10, 23 expectations)
    "q_dq_expectations" -> DqEngine.silverReport _,
    // streaming-shaped tumbling-window aggregation (batch entry; the
    // same transform serves the file-source stream in StreamingOps)
    "q_event_windows" -> StreamingOps.eventWindowsBatch _,
    // multimodal: opaque binary payload + typed metadata rollup
    "q_multimodal_meta" -> MultimodalOps.multimodalMeta _,
    // training-data pipeline: text analysis + dedup (documents table)
    "q_token_stats" -> TextOps.tokenStats _,
    "q_token_bpe" -> TextOps.tokenBpe _,
    "q_lang_confusion" -> TextOps.langConfusion _,
    "q_text_quality" -> TextOps.textQualityBySource _,
    "q_dedup_exact" -> TextOps.dedupExact _,
    "q_dedup_unicode" -> ((s: SparkSession, d: String) => TextOps.dedupUnicode(s, d)),
    "q_neardup_pairs" -> ((s: SparkSession, d: String) => TextOps.nearDupPairs(s, d)),
    "q_dedup_minhash" -> ((s: SparkSession, d: String) => TextOps.dedupMinhash(s, d)),
    "q_dedup_simhash" -> TextOps.simhashDocs _,
    "q_simhash_pairs" -> ((s: SparkSession, d: String) => TextOps.simhashPairs(s, d)),
    "q_fingerprint" -> TextOps.fingerprintDocs _,
    "q_vocab_topk" -> ((s: SparkSession, d: String) => TextOps.vocabTopK(s, d)),
    "q_quality_rules" -> TextOps.qualityRules _,
    "q_data_mix" -> ((s: SparkSession, d: String) => TextOps.dataMix(s, d)),
    "q_decontaminate" -> ((s: SparkSession, d: String) => TextOps.decontaminate(s, d)),
    "q_corpus_clean" -> ((s: SparkSession, d: String) => TextOps.corpusClean(s, d)),
    "q_dedup_overflow" -> TextOps.dedupOverflow _,
    "q_corpus_audit" -> ((s: SparkSession, d: String) => TextOps.corpusCleanAudit(s, d)),
    "q_doc_chunks" -> ((s: SparkSession, d: String) => TextOps.chunkDocs(s, d)),
    "q_doc_sample" -> ((s: SparkSession, d: String) => TextOps.sampleDocs(s, d)),
    "q_containment" -> ((s: SparkSession, d: String) => TextOps.containmentPairs(s, d)),
    "q_stratified_sample" -> ((s: SparkSession, d: String) => TextOps.stratifiedSample(s, d)),
    "q_tfidf_terms" -> ((s: SparkSession, d: String) => TextOps.tfidfTopTerms(s, d)),
    "q_mix_sample" -> ((s: SparkSession, d: String) => TextOps.mixSample(s, d)),
    "q_token_deciles" -> TextOps.tokenDeciles _,
    "q_pii_audit" -> TextOps.piiAudit _,
    "q_training_shards" -> ((s: SparkSession, d: String) => TextOps.trainingShards(s, d)),
    "q_chunk_dedup" -> ((s: SparkSession, d: String) => TextOps.chunkDedup(s, d)),
    "q_repetition_audit" -> ((s: SparkSession, d: String) => TextOps.repetitionAudit(s, d)),
    "q_split_manifest" -> ((s: SparkSession, d: String) => TextOps.splitManifest(s, d)),
    "q_hamming_histogram" -> ((s: SparkSession, d: String) => TextOps.hammingHistogram(s, d)),
    "q_lsh_calibration" -> ((s: SparkSession, d: String) => TextOps.lshCalibration(s, d)),
    "q_incremental_dedup" -> ((s: SparkSession, d: String) => TextOps.incrementalDedup(s, d)),
    // training-data pipeline: similarity search (embeddings table)
    "q_embedding_norms" -> VectorOps.embeddingNorms _,
    "q_ann_bruteforce" -> ((s: SparkSession, d: String) => VectorOps.annBruteForce(s, d)),
    "q_ann_lsh" -> ((s: SparkSession, d: String) => VectorOps.annLsh(s, d)),
    "q_ann_ivf" -> ((s: SparkSession, d: String) => VectorOps.annIvf(s, d)),
    "q_ann_ivf_trained" -> ((s: SparkSession, d: String) => VectorOps.annIvfTrained(s, d)),
    "q_neardup_embedding" -> ((s: SparkSession, d: String) => VectorOps.embeddingNearDup(s, d)),
    "q_embed_quantize" -> VectorOps.embedQuantize _,
    "q_ann_recall" -> ((s: SparkSession, d: String) => VectorOps.annRecall(s, d)),
    "q_cluster_tightness" -> VectorOps.clusterTightness _,
    "q_quantize_error" -> VectorOps.quantizeError _,
    "q_cluster_profile" -> VectorOps.clusterProfile _,
    "q_modality_overlap" -> ((s: SparkSession, d: String) => VectorOps.modalityOverlap(s, d)),
    "q_modality_sweep" -> ((s: SparkSession, d: String) => VectorOps.modalitySweep(s, d)),
    "q_ivf_sweep" -> ((s: SparkSession, d: String) => VectorOps.ivfSweep(s, d)),

    // temporal event operators (EventOps)
    "q_asof_join" -> EventOps.asofJoin _,
    "q_sessionize" -> EventOps.sessionize _,
    "q_asof_tolerance" -> ((s: SparkSession, d: String) => EventOps.asofJoinTolerance(s, d)),
    "q_event_funnel" -> ((s: SparkSession, d: String) => EventOps.eventFunnel(s, d)),
    "q_retention" -> EventOps.retention _,
    "q_session_stats" -> ((s: SparkSession, d: String) => EventOps.sessionStats(s, d)),
    "q_interarrival_deciles" -> EventOps.interarrivalDeciles _,

    // graph: near-dup transitive closure (GraphOps)
    "q_dup_components" -> GraphOps.dupComponents _,

    // round-8 additions (appended — see ListMap note above)
    "q_pack_sequences" -> ((s: SparkSession, d: String) => TextOps.packSequences(s, d)),
    "q_pack_cuts" -> ((s: SparkSession, d: String) => TextOps.packCuts(s, d)),
    "q_range_join" -> ((s: SparkSession, d: String) => EventOps.rangeJoin(s, d)),
    "q_session_overlap" -> ((s: SparkSession, d: String) => EventOps.sessionOverlap(s, d)),
    "q_pack_clean" -> ((s: SparkSession, d: String) => TextOps.packClean(s, d)),
    "q_active_time" -> ((s: SparkSession, d: String) => EventOps.activeTime(s, d)),

    // round-9 additions (appended — see ListMap note above)
    "q_bucket_audit" -> ((s: SparkSession, d: String) => EventOps.bucketAudit(s, d)),
    "q_retention_matrix" -> EventOps.retentionMatrix _,
    "q_asof_forward" -> EventOps.asofJoinForward _,
    "q_asof_nearest" -> EventOps.asofJoinNearest _,
    "q_idle_gaps" -> ((s: SparkSession, d: String) => EventOps.idleGaps(s, d)),
    "q_pq_codes" -> ((s: SparkSession, d: String) => VectorOps.pqCodes(s, d)),
    "q_ann_pq" -> ((s: SparkSession, d: String) => VectorOps.annPq(s, d)),
    "q_shipping_priority" -> ((s: SparkSession, d: String) => Checks.shippingPriority(s, d)),
    "q_pq_recall" -> ((s: SparkSession, d: String) => VectorOps.pqRecall(s, d)),
    "q_geo_cube" -> Checks.geoCube _,
    "q_segment_pivot" -> Checks.segmentPivot _,
    "q_region_unpivot" -> Checks.regionUnpivot _,
    "q_ivfpq_codes" -> ((s: SparkSession, d: String) => VectorOps.ivfPqCodes(s, d)),
    "q_ivfpq_search" -> ((s: SparkSession, d: String) => VectorOps.ivfPqSearch(s, d)),

    // round-10 additions (appended — see ListMap note above)
    "q_ivfpq_build" -> ((s: SparkSession, d: String) => VectorOps.ivfPqBuild(s, d)),
    "q_ivfpq_query" -> ((s: SparkSession, d: String) => VectorOps.ivfPqQuery(s, d)),
    "q_claims_summary_approx" -> SketchOps.claimsSummaryApprox _,
    "q_approx_error" -> SketchOps.approxError _,
    "q_hll_distinct" -> SketchOps.hllDistinct _,
    "q_approx_quantiles" -> SketchOps.approxQuantiles _,
    "q_pipeline_e2e" -> Pipeline.e2eGold _,
    "q_monthly_trend_approx" -> SketchOps.monthlyTrendApprox _,
    "q_cm_heavy_hitters" -> ((s: SparkSession, d: String) => SketchOps.cmHeavyHitters(s, d)),
    "q_user_overlap_kmv" -> ((s: SparkSession, d: String) => SketchOps.userOverlapKmv(s, d)),

    // round-11 additions (appended — see ListMap note above)
    "q_incremental_gold" -> IncrementalGold.incrementalGoldE2e _,
    "q_upsert_claims" -> Upsert.upsertClaimsE2e _,
    "q_exec_metrics" -> ExecMetrics.execMetricsProbe _,
    "q_sketch_build" -> ((s: SparkSession, d: String) => SketchOps.sketchBuild(s, d)),
    "q_sketch_query" -> SketchOps.sketchQuery _,
    "q_sketch_probe" -> ((s: SparkSession, d: String) => SketchOps.sketchProbe(s, d)),
    "q_incremental_trend" -> IncrementalGold.incrementalTrend _,
    "q_incremental_dq" -> IncrementalGold.incrementalDq _,
    "q_stream_publish" -> IncrementalGold.streamPublishE2e _,
    "q_upsert_moving" -> Upsert.upsertMovingE2e _,
    "q_metrics_history" -> ExecMetrics.metricsHistory _,
    "q_time_travel" -> SnapshotQueries.timeTravelE2e _,
    "q_snapshot_publish" -> IncrementalGold.snapshotPublishE2e _,
    "q_data_skipping" -> SnapshotQueries.dataSkippingE2e _,
    "q_stream_upsert" -> Upsert.upsertStreamE2e _,
    "q_snapshot_cdc" -> IncrementalGold.snapshotCdc _,
    "q_concurrent_commits" -> SnapshotQueries.concurrentCommitsE2e _,
    "q_date_skipping" -> SnapshotQueries.dateSkippingE2e _,
    "q_pipeline_snapshot" -> Pipeline.e2eSnapshotGold _,
    "q_snapshot_merge" -> SnapshotQueries.mergeE2e _,
    "q_snapshot_delete" -> SnapshotQueries.deleteE2e _,
    "q_snapshot_history" -> IncrementalGold.snapshotHistory _,

    // round-12 additions (appended — see ListMap note above)
    "q_scan_planner" -> SnapshotQueries.scanPlannerE2e _,
    "q_snapshot_wap" -> SnapshotQueries.wapE2e _,
    "q_schema_evolution" -> SnapshotQueries.schemaEvolutionE2e _,
    "q_snapshot_rollback" -> SnapshotQueries.rollbackE2e _,
    "q_manifest_compact" -> SnapshotQueries.manifestCompactE2e _,
    "q_snapshot_stats" -> SnapshotQueries.statsE2e _,
    "q_snapshot_ndv" -> SnapshotQueries.ndvE2e _,
    "q_snapshot_cbo" -> SnapshotQueries.cboE2e _,
    "q_catalog_txn" -> SnapshotQueries.catalogTxnE2e _,
    "q_partition_evolution" -> SnapshotQueries.partitionEvolutionE2e _,
    "q_hidden_partitioning" -> SnapshotQueries.hiddenPartitioningE2e _,
    "q_stream_snapshot" -> SnapshotQueries.streamSnapshotE2e _,
    "q_zorder_scan" -> SnapshotQueries.zorderScanE2e _,
    "q_catalog_wap" -> SnapshotQueries.catalogWapE2e _,

    // round-14 additions (appended — see ListMap note above)
    "q_snapshot_delete_mor" -> SnapshotQueries.deleteMorE2e _,
    "q_snapshot_merge_file_cow" -> SnapshotQueries.mergeFileCowE2e _,
    "q_stream_source" -> SnapshotQueries.streamSourceE2e _,
    "q_stream_catalog_txn" -> SnapshotQueries.streamCatalogTxnE2e _,
    "q_snapshot_merge_mor" -> SnapshotQueries.mergeMorE2e _,
    "q_snapshot_delete_where" -> SnapshotQueries.deleteWhereE2e _,

    // round-15 additions
    "q_stream_cdc" -> SnapshotQueries.streamCdcE2e _,
    "q_read_where" -> SnapshotQueries.readWhereE2e _,
    "q_bloom_lookup" -> SnapshotQueries.bloomLookupE2e _,
    "q_change_feed" -> SnapshotQueries.changeFeedE2e _,
    "q_stream_change_feed" -> SnapshotQueries.streamChangeFeedE2e _,
    "q_cdc_bulk_erase" -> SnapshotQueries.cdcBulkEraseE2e _,
    "q_stream_replicate_maintained" ->
      SnapshotQueries.streamReplicateMaintainedE2e _,
    "q_stream_replicate" -> SnapshotQueries.streamReplicateE2e _,
    "q_maintain" -> SnapshotQueries.maintainE2e _,
    // round-16 additions
    "q_change_recompute" -> SnapshotQueries.changeRecomputeE2e _,
    "q_replicate_chain" -> SnapshotQueries.replicateChainE2e _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.all
}
