package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Analytics, AsOfJoin, DeletionOps, HeavyHitters, RangeJoin}
import graft.pipeline.{AnnIndex, Audio, Chunking, CorpusDiff, Curation, DataQuality, Decontaminate, Dedup, EntityResolution, GraphRank, HybridSearch, ImportanceSampling, IncrementalDedup, LanguageModel, LayoutAudit, Manifest, MaterializedView, Multimodal, Ngrams, Packing, Pii, ProductQuant, Quantization, QualityModel, Repetition, Sampling, Search, SemanticDedup, Similarity, SubstringDedup, Subword, Takedown, TextAnalysis, Vocab}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 or a
  * training-data-pipeline extension; every entry has a matching
  * [[oracleSql]] hash-checked against DuckDB on the same parquet tables
  * (oracle SQL is DuckDB dialect). Hash-based operators (MinHash, SimHash,
  * hyperplane-LSH) use arithmetic hashes ([[graft.functions.Hashes]]) so
  * their oracles reproduce the exact values — no Spark-internal
  * murmur3/xxhash anywhere in a query contract.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // deletion-engine relational semantics (SURVEY.md §2.2/§2.7)
    "del_retain_complement" -> (DeletionOps.retainComplement _),
    "del_dryrun_counts" -> (DeletionOps.dryRunCounts _),
    "del_affected_partitions" -> (DeletionOps.affectedPartitions _),
    "del_partition_filter" -> (DeletionOps.partitionFilterScan _),
    "del_time_window" -> (DeletionOps.timeWindowCounts _),
    "partition_parse" -> (DeletionOps.partitionParse _),
    // general Spark SQL capability surface (SURVEY.md §2.8) / bench headliners
    "q1_pricing_summary" -> (Analytics.q1PricingSummary _),
    "q3_top_orders" -> (Analytics.q3TopOrders _),
    "q5_nation_revenue" -> (Analytics.q5NationRevenue _),
    "top_parts_window" -> (Analytics.topPartsPerBrand _),
    "customers_without_orders" -> (Analytics.customersWithoutOrders _),
    "events_hourly" -> (Analytics.eventsHourly _),
    "events_sessionize" -> (Analytics.sessionize _),
    "events_asof_join" -> (AsOfJoin.eventsAsOf _),
    "events_rollup" -> (Analytics.eventsRollup _),
    "events_cube" -> (Analytics.eventsCube _),
    "events_grouping_sets" -> (Analytics.eventsGroupingSets _),
    "events_props_json" -> (Analytics.eventsPropsJson _),
    "events_pivot" -> (Analytics.eventsPivot _),
    "orders_sliding_revenue" -> (Analytics.ordersSlidingRevenue _),
    "events_purchaser_cohort" -> (Analytics.purchaserCohort _),
    // sequential conversion funnel (the MATCH_RECOGNIZE-shaped query)
    "events_funnel" -> (Analytics.eventsFunnel _),
    // non-equi interval join made scalable by binning (equi-key restore)
    "orders_interval_join" -> ((s, d) => RangeJoin.shipmentsInOrderWindows(s, d)),
    // sketch aggregates (HLL++, approx percentile) with in-query audit bounds
    "events_approx_profile" -> (Analytics.eventsApproxProfile _),
    // compute-weighted CPU scaling probe (round-16: makes the driver's
    // 8-vs-32-core comparison demonstrable on a surface that is
    // otherwise fixed-overhead bound at the bench SF)
    "scaling_hash_chain" -> (graft.operators.ScalingProbe.hashChain _),
    // streaming definitions in batch form, gated by the SAME oracles
    "events_hourly_stream_def" -> (graft.streaming.EventStream.hourlyCountsBatch _),
    "events_sessionize_stateful" -> (graft.streaming.EventStream.sessionizeBatchSummary _),
    // Spark-native session_window aggregate (third sessionization form)
    "events_session_window" -> ((s, d) => graft.streaming.EventStream.sessionWindows(s, d)),
    "events_attribution" -> ((s, d) => graft.streaming.EventStream.attributionBatch(s, d)),
    // sliding-window trending top-k (streaming def in batch form)
    "events_trending" -> ((s, d) => graft.streaming.EventStream.trendingTopKBatch(s, d)),
    // stream-static dimension enrichment (left join keeps dimension-less events)
    "events_enriched" -> (graft.streaming.EventStream.enrichedByNationBatch _),
    // text analysis
    "text_stats" -> (TextAnalysis.stats _),
    "text_quality" -> (TextAnalysis.quality _),
    "text_langid" -> (TextAnalysis.langId _),
    "text_fingerprint" -> (TextAnalysis.fingerprint _),
    "text_token_count" -> (TextAnalysis.tokenCount _),
    "text_tfidf_top_terms" -> ((s, d) => TextAnalysis.tfidfTopTerms(s, d)),
    "text_length_quantiles" -> (TextAnalysis.lengthQuantiles _),
    // Gopher repetition signals (dup lines, top/dup n-gram char fractions)
    "text_repetition" -> (Repetition.repetition _),
    // CCNet-shaped LM quality score: per-doc mean surprisal in integer
    // bits under a reference-slice bigram model trained in the engine
    "text_lm_score" -> ((s, d) => LanguageModel.perplexityProxy(s, d)),
    // the trigram upgrade: Stupid Backoff (Brants 2007) with a flat +1
    // bit per backed-off level — exact integer scores in both engines
    "text_lm_trigram" -> ((s, d) => LanguageModel.stupidBackoff(s, d)),
    // CCNet's head/middle/tail per-language split by LM score — exact
    // integer thirds over a total order, per-(lang,bucket) census
    "text_lm_buckets" -> ((s, d) => LanguageModel.perplexityBuckets(s, d)),
    // the 100 TB form: approx_percentile cutoffs (partial-aggregable, no
    // per-language total order), rank-window audit booleans pinned TRUE
    "text_lm_buckets_approx" -> ((s, d) => LanguageModel.perplexityBucketsApprox(s, d)),
    // BM25-form ranked keyword retrieval (rational idf, integer score sum)
    "text_bm25_topk" -> ((s, d) => Search.bm25TopK(s, d)),
    // the same retrieval served from a PERSISTED inverted index (postings
    // + stats parquet), probed with the term IN-list pushed to the scan
    "text_bm25_store" -> ((s, d) => Search.bm25TopKStore(s, d)),
    // takedown path: delete a doc_id slice from the persisted index
    // (affected shard leaves + journaled negative stats delta), probe
    "text_bm25_delete" -> ((s, d) => Search.bm25TopKDelete(s, d)),
    // hybrid lexical+vector retrieval fused by reciprocal-rank fusion
    "search_hybrid_rrf" -> ((s, d) => HybridSearch.rrf(s, d)),
    // corpus-wide frequent-5-gram mining + boilerplate doc flagging
    "text_top_ngrams" -> ((s, d) => Ngrams.topNgrams(s, d)),
    "text_boilerplate" -> ((s, d) => Ngrams.boilerplateDocs(s, d)),
    // deterministic sampling: map-only hash filter / exact per-stratum quotas
    "sample_hash" -> ((s, d) => Sampling.hashSample(s, d)),
    "sample_stratified" -> ((s, d) => Sampling.stratifiedSample(s, d)),
    // per-source training-mixture weights as a map-only hash cutoff
    "sample_mixture" -> ((s, d) => Sampling.mixtureSample(s, d)),
    // deterministic train/val/test split report (hash-slot assignment)
    "sample_split" -> ((s, d) => Sampling.sampleSplit(s, d)),
    // fractional per-source epoch upsampling, materialized map-only
    "sample_epochs" -> ((s, d) => Sampling.epochsUpsample(s, d)),
    // DSIR-shaped data selection: hashed-bigram importance weights
    // between a curated target slice and the raw corpus (integer-log2
    // estimator), top-k selected deterministically
    "sample_importance" -> ((s, d) => ImportanceSampling.importanceTopK(s, d)),
    // vocabulary coverage curve (tokenizer budgeting)
    "vocab_coverage" -> ((s, d) => Vocab.coverage(s, d)),
    // deterministic subword (BPE) tokenizer: per-language fertility
    // profile, token-faithful chunking, and piece-coverage curve — the
    // merge chain is one codegen'd expression, oracle-identical in DuckDB
    "text_subword_stats" -> ((s, d) => Subword.stats(s, d)),
    "doc_chunks_subword" -> ((s, d) => Subword.chunk(s, d)),
    "vocab_subword_coverage" -> ((s, d) => Subword.coverage(s, d)),
    // BPE merge training IN the engine (deterministic rounds, oracle
    // replay) — reproduces the frozen Merges table's prefix from the corpus
    "subword_train" -> ((s, d) => Subword.train(s, d)),
    // linear quality-classifier margin (stub weights, real dataflow)
    "text_quality_model" -> ((s, d) => QualityModel.score(s, d)),
    // the trained upgrade: deterministic integer perceptron on a planted
    // labeled split; the oracle replays the training rounds bit-for-bit
    "text_quality_trained" -> ((s, d) => QualityModel.trained(s, d)),
    // training-sequence prep: fixed-size token windows with stride
    "doc_chunks" -> ((s, d) => Chunking.chunk(s, d)),
    // PII scrub: email/phone/IPv4 detection counts + chained redaction
    "text_pii_scrub" -> (Pii.scrub _),
    // k-anonymity release census: per-segment suppression accounting of
    // quasi-identifier groups below k
    "privacy_k_anonymity" -> ((s, d) => Pii.kAnonymity(s, d)),
    // homogeneity-attack audit: distinct sensitive classes per QI group
    "privacy_l_diversity" -> ((s, d) => Pii.lDiversity(s, d)),
    // publishable view: pseudonymize / generalize / pass-through policy
    "privacy_mask_columns" -> ((s, d) => Pii.maskColumns(s, d)),
    // GPT-style packing layout: global prefix-sum offsets, two-phase plan
    "doc_pack_bins" -> ((s, d) => Packing.packBins(s, d)),
    // deterministic resumable training-order manifest: mixture replicas ×
    // seeded shuffle × packed stream offsets → global step per replica
    "train_manifest" -> ((s, d) => Manifest.trainManifest(s, d)),
    // daily-arrival extension: new docs pack AFTER the base stream's end,
    // every already-published step keeps its data byte-for-byte
    "train_manifest_extend" -> ((s, d) => Manifest.trainManifestExtend(s, d)),
    // deduplication
    "dedup_exact" -> (Dedup.exact _),
    "dedup_bag_of_words" -> (Dedup.bagOfWords _),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.minHashLsh(s, d)),
    // daily-ingestion shape: batch probed against the PERSISTED corpus store
    "dedup_incremental" -> ((s, d) => IncrementalDedup.dedupIncremental(s, d)),
    // takedown path: delete a corpus slice from the persisted signature
    // store (doc-sharded leaves named directly by the id list), then probe
    "dedup_incremental_delete" -> ((s, d) => IncrementalDedup.dedupIncrementalDelete(s, d)),
    // train/test contamination guard: exact n-gram overlap vs the eval slice
    "decontaminate" -> ((s, d) => Decontaminate.overlaps(s, d)),
    // same result via a Bloom runtime prefilter on the corpus side
    "decontaminate_semantic" -> ((s, d) => Decontaminate.semantic(s, d)),
    "knn_filtered" -> ((s, d) => Similarity.knnFiltered(s, d)),
    // Spark's runtime bloom-filter join: row-level sibling of DPP
    "orders_bloom_join" -> ((s, d) => LayoutAudit.bloomJoin(s, d)),
    // bounded-shuffle top-k per group: local heaps, candidate-only window
    "top_parts_two_phase" -> ((s, d) => Analytics.topPartsTwoPhase(s, d)),
    "decontaminate_bloom" -> ((s, d) => Decontaminate.overlapsBloom(s, d)),
    // snapshot diff: added/removed/changed/unchanged by content fingerprint
    "corpus_diff" -> ((s, d) => CorpusDiff.diff(s, d)),
    // manifest-versioned table with partition-granular copy-on-write
    // deletes: create → append → delete, then TIME-TRAVEL all 3 versions
    "snapshot_asof" -> ((s, d) => graft.sources.VersionedTable.snapshotAsOf(s, d)),
    // MERGE (upsert) by key with partition-granular rewrite, then read
    "snapshot_merge" -> ((s, d) => graft.sources.VersionedTable.snapshotMerge(s, d)),
    // CDC between versions: added/changed/unchanged census of the merge
    "snapshot_changes" -> ((s, d) => graft.sources.VersionedTable.snapshotChanges(s, d)),
    // merge-on-read position-delete vectors + compaction fold (time travel)
    "snapshot_delete_mor" -> ((s, d) => graft.sources.VersionedTable.snapshotDeleteMor(s, d)),
    // DESCRIBE HISTORY: per-version manifest footprint, leaf counts
    // recomputed independently by the oracle from the slice predicates
    "snapshot_history" -> ((s, d) => graft.sources.VersionedTable.snapshotHistory(s, d)),
    // zero-copy hardlink CLONE, then both sides diverge independently
    "snapshot_clone" -> ((s, d) => graft.sources.VersionedTable.snapshotClone(s, d)),
    // per-partition count(*) from footer-stats sidecars + DV cardinality
    // alone — no scan of the base data
    "snapshot_count_meta" -> ((s, d) => graft.sources.VersionedTable.snapshotCountMeta(s, d)),
    // global min/max per column from the sidecars alone (typed merge,
    // unsigned-UTF-8 string order) — count(*)'s metadata-query siblings
    "snapshot_bounds_meta" -> ((s, d) => graft.sources.VersionedTable.snapshotBoundsMeta(s, d)),
    // add-nullable-column schema evolution: evolved head reads
    // pre-evolution leaves with nulls; old snapshots keep their schema
    "snapshot_evolve" -> ((s, d) => graft.sources.VersionedTable.snapshotEvolve(s, d)),
    // CHECK constraints: add-gated on head data, atomic batch refusal,
    // dry-run violation probe — all accounting oracle-recomputed
    "snapshot_constraints" -> ((s, d) => graft.sources.VersionedTable.snapshotConstraints(s, d)),
    // metadata-only count/min/max through the SQL surface, plan-audited
    "snapshot_agg_pushdown" -> ((s, d) => graft.sources.VersionedTable.snapshotAggPushdown(s, d)),
    "snapshot_count_by_sql" -> ((s, d) => graft.sources.VersionedTable.snapshotCountBySql(s, d)),
    "snapshot_group_stats" -> ((s, d) => graft.sources.VersionedTable.snapshotGroupStats(s, d)),
    // dead-letter ingestion: violators route to a quarantine table
    "snapshot_quarantine" -> ((s, d) => graft.sources.VersionedTable.snapshotQuarantine(s, d)),
    // the external read surface: spark.read.format("graft-snapshot") with
    // manifest-driven file listing + leaf pruning + versionAsOf travel
    "snapshot_connector" -> ((s, d) => graft.sources.SnapshotConnector.connectorRead(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.clusters(s, d)),
    "corpus_curation" -> ((s, d) => Curation.curate(s, d)),
    // every filter family composed on one scan: quality + repetition +
    // near-dup drop + PII redaction + per-language release report
    "corpus_curation_full" -> ((s, d) => Curation.curateFull(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simHashPairs(s, d)),
    // exact-substring SPAN dedup (Lee et al. ExactSubstr, Spark-reshaped):
    // maximal ≥L-token spans duplicated across docs, hash-keyed windows
    "dedup_substring_spans" -> ((s, d) => SubstringDedup.substringSpans(s, d)),
    // the apply layer: cut all-but-one occurrence of every duplicated
    // span, emit the cleaned corpus (canonical = min doc_id per window)
    "dedup_substring_scrub" -> ((s, d) => SubstringDedup.substringScrub(s, d)),
    // per-language duplication-exposure profile (the go/no-go number for
    // a span-level rewrite pass)
    "text_dup_span_profile" -> ((s, d) => SubstringDedup.dupSpanProfile(s, d)),
    // exact O(n²) AUDIT tool, named as such and row-capped (refuses corpus-
    // sized input loudly); the scale path is dedup_embedding_ann
    "dedup_embedding_exact_audit" -> ((s, d) => Dedup.embeddingCosine(s, d)),
    // flagship embedding-dedup: hyperplane-LSH candidates in the high-cosine
    // regime, exact-cosine verified — shuffle O(vectors × tables), not O(n²).
    // Runs over the corpus + deterministic planted near-dups so the oracle
    // row exercises the candidate join with real rows (non-vacuous)
    "dedup_embedding_ann" -> ((s, d) => Similarity.cosineLshPairsPlanted(s, d)),
    // SemDeDup: k-means cells confine the pairwise compare to Σ|cell|²
    "dedup_semantic" -> ((s, d) => SemanticDedup.semanticPairs(s, d)),
    // similarity search
    "knn_brute_force" -> ((s, d) => Similarity.knnBruteForce(s, d)),
    // 1-bit quantization: 16-byte sign signatures, Hamming (popcount)
    // shortlist, exact cosine rerank on the shortlist only
    "knn_binary_hamming" -> ((s, d) => Similarity.knnBinaryHamming(s, d)),
    "knn_ivf" -> ((s, d) => Similarity.knnIvf(s, d)),
    "knn_ivf_nprobe" -> ((s, d) => Similarity.knnIvfProbe(s, d)),
    // k-means-trained cells (deterministic integer Lloyd rounds)
    "knn_ivf_trained" -> ((s, d) => Similarity.knnIvfTrained(s, d)),
    // int8 embedding storage: per-vector fidelity report, hash-gated
    "embedding_quantize_int8" -> (Quantization.int8Report _),
    // product-quantized exhaustive ADC search (integer codebooks + scores)
    "knn_pq_adc" -> ((s, d) => ProductQuant.knnPqAdc(s, d)),
    // composed IVF cells + residual-PQ codes (the FAISS IVFPQ layout)
    "knn_ivfpq" -> ((s, d) => ProductQuant.knnIvfPq(s, d)),
    // build-once/probe-many: the SAME index persisted to a parquet store
    // (centroids + codebooks + codes), probed without retraining
    "knn_ivfpq_store" -> ((s, d) => AnnIndex.knnIvfPqStore(s, d)),
    // the store's recall knob: each query probes its 2 nearest cells
    "knn_ivfpq_store_nprobe" -> ((s, d) => AnnIndex.knnIvfPqStore(s, d, nProbe = 2)),
    // two-stage search: ADC shortlist from the store, EXACT integer-dot
    // re-rank of just the shortlisted vectors (id IN-list pushed to scan)
    "knn_ivfpq_refine" -> ((s, d) => AnnIndex.knnIvfPqRefine(s, d)),
    // ingest-time batch probe: planted near-dup batch vs the store,
    // cell-blocked exact-dot matches (the streaming dedup kernel)
    "ann_ingest_matches" -> ((s, d) => AnnIndex.annIngestMatches(s, d)),
    // takedown path: delete a vec_id slice from the PERSISTED store
    // (affected shard leaves rewritten only), then probe — params keep
    // their full-corpus training, codes hold only survivors
    "ann_store_delete" -> ((s, d) => AnnIndex.annStoreDelete(s, d)),
    // store-maintenance audit: per-cell count + residual-energy drift of
    // the current codes vs the build-time baseline (after a delete)
    "ann_store_health" -> ((s, d) => AnnIndex.annStoreHealth(s, d)),
    // recall@k of the IVF-PQ index vs exact brute force — the quality
    // audit an ANN deployment tracks alongside latency
    "ann_recall_audit" -> ((s, d) => ProductQuant.annRecall(s, d)),
    // the nProbe recall/latency trade quantified: one store build, the
    // probe at two widths, both intersected with exact brute force
    "ann_recall_nprobe" -> ((s, d) => AnnIndex.annRecallNprobe(s, d)),
    // one-call GDPR/takedown propagation through ALL persisted derived
    // stores (BM25, ANN, MinHash) with per-artifact accounting
    "takedown_propagate" -> ((s, d) => Takedown.takedownPropagate(s, d)),
    // GDPR subject-access report: read-only per-artifact hit counts,
    // including every retained snapshot of the versioned base
    "takedown_access_report" -> ((s, d) => Takedown.takedownAccessReport(s, d)),
    // incrementally-maintained materialized aggregate with RETRACTION
    // support: build → append delta → deletion retraction → read; the
    // maintained view must equal a recompute over the post-delete table
    "mv_incremental" -> ((s, d) => MaterializedView.mvIncremental(s, d)),
    "knn_lsh_pairs" -> ((s, d) => Similarity.cosineLshPairs(s, d)),
    // multimodal: real javax.imageio decode (PNG/BMP round trip)
    "multimodal_features" -> (Multimodal.features _),
    "multimodal_frame_sample" -> ((s, d) => Multimodal.frameSampleQuery(s, d)),
    // video near-dup detection: frame signatures (inverted match, df-cap,
    // integer permille overlap) with planted clipped copies — catches a
    // prefix-clipped re-upload whole-file fingerprints never match
    "multimodal_frame_dedup" -> ((s, d) => Multimodal.frameDedup(s, d)),
    // link-graph ranking: integer fixed-point PageRank (8 power
    // iterations as join+agg rounds; bit-exact across engines)
    "docs_pagerank" -> ((s, d) => GraphRank.pagerank(s, d)),
    // topic-conditioned: teleport mass lands only on the seed set
    "docs_pagerank_seeded" -> ((s, d) => GraphRank.pagerankSeeded(s, d)),
    // structural health check: in-degree histogram of the link graph
    "docs_graph_degrees" -> ((s, d) => GraphRank.degreeProfile(s, d)),
    // audio: real RIFF/WAVE codec round trips (chunk-walking parser)
    "audio_features" -> (Audio.features _),
    "audio_silence" -> (Audio.silence _),
    "audio_downsample" -> (Audio.downsample _),
    // physical layout: z-order multi-dim skipping + shuffle-free
    // bucketed co-located join (the amortize-the-shuffle-once design)
    "events_zorder_layout" -> ((s, d) => LayoutAudit.zorderLayout(s, d)),
    "orders_bucketed_join" -> ((s, d) => LayoutAudit.bucketedJoin(s, d)),
    "events_dpp_join" -> ((s, d) => LayoutAudit.dppJoin(s, d)),
    // the composed deployment layout: date partitions + in-partition
    // z-order on one table; DPP and footer min/max skipping on one scan
    "events_layout_composed" -> ((s, d) => LayoutAudit.composedLayoutJoin(s, d)),
    // hot-key salted join gated by a plain-join oracle; CBO stats census
    "events_salted_join" -> (Analytics.eventsSaltedJoin _),
    // the load-bearing variant: hot key (50% of rows on one key) x a
    // non-broadcast fact-derived side -> salted SORT-MERGE join
    "events_salted_join_heavy" -> (Analytics.eventsSaltedJoinHeavy _),
    // the same regime handled by AQE's runtime skew split, unsalted —
    // the executed plan's skew flag rides the oracle-gated row
    "events_aqe_skew_join" -> (Analytics.eventsAqeSkewJoin _),
    "table_stats" -> (Analytics.tableStats _),
    // the 100 TB NDV leg: 6x HLL in ONE narrow-scan aggregate (no
    // Expand, no distinct shuffle), exact NDV kept as in-query audit
    "table_stats_approx" -> (Analytics.tableStatsApprox _),
    // Deequ-style constraint suite: row-local checks fused into ONE scan
    "table_quality_report" -> (DataQuality.qualityReport _),
    // violation-counting path gated on a deterministically dirtied table
    "table_quality_dirty" -> (DataQuality.qualityReportDirty _),
    // complete dist<=1 record linkage via masked-position blocking
    "er_name_match" -> (EntityResolution.nameMatchPairs _),
    // exact heavy hitters: map-only Misra-Gries candidates + exact pass
    "events_heavy_hitters" -> ((s, d) => HeavyHitters.userHeavyHitters(s, d)),
    // per-file bloom skipping: point lookups on a layout-decorrelated key
    "snapshot_point_lookup" -> (sources.BloomSkipIndex.pointLookup _),
    // cohort retention matrix: permille week-over-week survival
    "events_retention_matrix" -> (Analytics.retentionMatrix _),
    // day-sketch cube: range NDV from HLL merge, no corpus rescan
    "events_hll_cube" -> (Analytics.hllCube _),
    // Iceberg-style partition-spec evolution: mixed-spec reads + deletes
    "snapshot_spec_evolve" -> (sources.VersionedTable.snapshotSpecEvolve _),
    "snapshot_multicol_spec" -> (sources.VersionedTable.snapshotMultiCol _),
    "snapshot_orc" -> (sources.VersionedTable.snapshotOrc _),
    "snapshot_convert_format" -> (sources.VersionedTable.snapshotConvertFormat _),
    "snapshot_sql_dml" -> (sources.VersionedTable.snapshotSqlDml _),
    "snapshot_sql_subquery" -> (sources.VersionedTable.snapshotSqlSubquery _),
    "snapshot_sql_evolution" -> (sources.VersionedTable.snapshotSqlEvolution _),
    "snapshot_change_feed" -> (sources.VersionedTable.snapshotChangeFeed _),
    "snapshot_hidden_partition" ->
      (sources.VersionedTable.snapshotHiddenPartition _),
    "snapshot_row_tracking" ->
      (sources.VersionedTable.snapshotRowTracking _)
  )

  /** For each key in queries, equivalent SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "del_retain_complement" -> DeletionOps.retainComplementSql,
    "del_dryrun_counts" -> DeletionOps.dryRunCountsSql,
    "del_affected_partitions" -> DeletionOps.affectedPartitionsSql,
    "del_partition_filter" -> DeletionOps.partitionFilterScanSql,
    "del_time_window" -> DeletionOps.timeWindowCountsSql,
    "partition_parse" -> DeletionOps.partitionParseSql,
    "q1_pricing_summary" -> Analytics.q1Sql,
    "q3_top_orders" -> Analytics.q3Sql,
    "q5_nation_revenue" -> Analytics.q5Sql,
    "top_parts_window" -> Analytics.topPartsSql,
    "customers_without_orders" -> Analytics.customersWithoutOrdersSql,
    "events_hourly" -> Analytics.eventsHourlySql,
    "events_sessionize" -> Analytics.sessionizeSql,
    "events_asof_join" -> AsOfJoin.eventsAsOfSql,
    "events_rollup" -> Analytics.eventsRollupSql,
    "events_cube" -> Analytics.eventsCubeSql,
    "events_grouping_sets" -> Analytics.eventsGroupingSetsSql,
    "events_props_json" -> Analytics.eventsPropsJsonSql,
    "events_pivot" -> Analytics.eventsPivotSql,
    "orders_sliding_revenue" -> Analytics.ordersSlidingRevenueSql,
    "events_purchaser_cohort" -> Analytics.purchaserCohortSql,
    "events_funnel" -> Analytics.eventsFunnelSql,
    "orders_interval_join" -> RangeJoin.shipmentsInOrderWindowsSql(),
    "events_approx_profile" -> Analytics.eventsApproxProfileSql,
    "scaling_hash_chain" -> graft.operators.ScalingProbe.hashChainSql(),
    "events_hourly_stream_def" -> Analytics.eventsHourlySql,
    "events_sessionize_stateful" -> Analytics.sessionizeSql,
    "events_session_window" -> graft.streaming.EventStream.sessionWindowsSql(),
    "events_attribution" -> graft.streaming.EventStream.attributionBatchSql(),
    "events_trending" -> graft.streaming.EventStream.trendingTopKBatchSql(),
    "events_enriched" -> graft.streaming.EventStream.enrichedByNationSql,
    "text_stats" -> TextAnalysis.statsSql,
    "text_quality" -> TextAnalysis.qualitySql,
    "text_langid" -> TextAnalysis.langIdSql,
    "text_fingerprint" -> TextAnalysis.fingerprintSql,
    "text_token_count" -> TextAnalysis.tokenCountSql,
    "text_tfidf_top_terms" -> TextAnalysis.tfidfTopTermsSql(),
    "text_length_quantiles" -> TextAnalysis.lengthQuantilesSql,
    "text_repetition" -> Repetition.repetitionSql,
    "text_lm_score" -> LanguageModel.perplexityProxySql(),
    "text_lm_trigram" -> LanguageModel.stupidBackoffSql(),
    "text_lm_buckets" -> LanguageModel.perplexityBucketsSql(),
    "text_lm_buckets_approx" -> LanguageModel.perplexityBucketsApproxSql(),
    "text_bm25_topk" -> Search.bm25TopKSql(),
    // identical result contract — the store is a plan-level change
    "text_bm25_store" -> Search.bm25TopKSql(),
    // no trained parameters in the lexical store, so delete ≡ rebuild
    // over the survivors — the same chain filtered at the source
    "text_bm25_delete" -> Search.bm25TopKSql(docWhere = Some("NOT (doc_id % 13 = 5)")),
    "search_hybrid_rrf" -> HybridSearch.rrfSql(),
    "text_top_ngrams" -> Ngrams.topNgramsSql(),
    "text_boilerplate" -> Ngrams.boilerplateDocsSql(),
    "sample_hash" -> Sampling.hashSampleSql(),
    "sample_stratified" -> Sampling.stratifiedSampleSql(),
    "sample_mixture" -> Sampling.mixtureSampleSql(),
    "sample_split" -> Sampling.sampleSplitSql(),
    "sample_epochs" -> Sampling.epochsUpsampleSql(),
    "sample_importance" -> ImportanceSampling.importanceTopKSql(),
    "vocab_coverage" -> Vocab.coverageSql(),
    "text_subword_stats" -> Subword.statsSql,
    "doc_chunks_subword" -> Subword.chunkSql(),
    "vocab_subword_coverage" -> Subword.coverageSql(),
    "subword_train" -> Subword.trainSql(),
    "text_quality_model" -> QualityModel.scoreSql(),
    "text_quality_trained" -> QualityModel.trainedSql(),
    "doc_chunks" -> Chunking.chunkSql(),
    "text_pii_scrub" -> Pii.scrubSql,
    "privacy_k_anonymity" -> Pii.kAnonymitySql(),
    "privacy_l_diversity" -> Pii.lDiversitySql(),
    "privacy_mask_columns" -> Pii.maskColumnsSql(),
    "doc_pack_bins" -> Packing.packBinsSql(),
    "train_manifest" -> Manifest.trainManifestSql(),
    "train_manifest_extend" -> Manifest.trainManifestExtendSql(),
    "dedup_exact" -> Dedup.exactSql,
    "dedup_bag_of_words" -> Dedup.bagOfWordsSql,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "dedup_minhash_lsh" -> Dedup.minHashLshSql(),
    "dedup_incremental" -> IncrementalDedup.dedupIncrementalSql(),
    // parameter-free store ⇒ delete ≡ rebuild over surviving corpus docs
    "dedup_incremental_delete" -> IncrementalDedup.dedupIncrementalSql(
      corpusDeleteWhere = Some("c.doc_id % 7 = 1")),
    "decontaminate" -> Decontaminate.overlapsSql(),
    // exact same semantics — the Bloom prefilter changes the PLAN, not
    // the result, so the oracle is the same SQL
    "decontaminate_bloom" -> Decontaminate.overlapsSql(),
    "corpus_diff" -> CorpusDiff.diffSql,
    "snapshot_asof" -> graft.sources.VersionedTable.snapshotAsOfSql(),
    "snapshot_merge" -> graft.sources.VersionedTable.snapshotMergeSql(),
    "snapshot_changes" -> graft.sources.VersionedTable.snapshotChangesSql(),
    "snapshot_delete_mor" -> graft.sources.VersionedTable.snapshotDeleteMorSql(),
    "snapshot_history" -> graft.sources.VersionedTable.snapshotHistorySql(),
    "snapshot_clone" -> graft.sources.VersionedTable.snapshotCloneSql(),
    "snapshot_count_meta" -> graft.sources.VersionedTable.snapshotCountMetaSql(),
    "snapshot_bounds_meta" -> graft.sources.VersionedTable.snapshotBoundsMetaSql(),
    "snapshot_evolve" -> graft.sources.VersionedTable.snapshotEvolveSql(),
    "snapshot_constraints" -> graft.sources.VersionedTable.snapshotConstraintsSql(),
    "snapshot_agg_pushdown" -> graft.sources.VersionedTable.snapshotAggPushdownSql(),
    "snapshot_count_by_sql" -> graft.sources.VersionedTable.snapshotCountBySqlSql(),
    "snapshot_group_stats" -> graft.sources.VersionedTable.snapshotGroupStatsSql(),
    "snapshot_quarantine" -> graft.sources.VersionedTable.snapshotQuarantineSql(),
    "snapshot_connector" -> graft.sources.SnapshotConnector.connectorReadSql(),
    "dedup_clusters" -> Dedup.clustersSql(),
    "corpus_curation" -> Curation.curateSql,
    "corpus_curation_full" -> Curation.curateFullSql,
    "dedup_simhash" -> Dedup.simHashPairsSql(),
    "dedup_substring_spans" -> SubstringDedup.substringSpansSql(),
    "dedup_substring_scrub" -> SubstringDedup.substringScrubSql(),
    "text_dup_span_profile" -> SubstringDedup.dupSpanProfileSql(),
    "dedup_embedding_exact_audit" -> Dedup.embeddingCosineSql,
    "dedup_embedding_ann" -> Similarity.cosineLshPairsPlantedSql(),
    "dedup_semantic" -> SemanticDedup.semanticPairsSql(),
    "knn_brute_force" -> Similarity.knnBruteForceSql(),
    "knn_binary_hamming" -> Similarity.knnBinaryHammingSql(),
    "knn_ivf" -> Similarity.knnIvfSql(),
    "knn_ivf_nprobe" -> Similarity.knnIvfProbeSql(),
    "knn_ivf_trained" -> Similarity.knnIvfTrainedSql(),
    "embedding_quantize_int8" -> Quantization.int8ReportSql,
    "knn_pq_adc" -> ProductQuant.knnPqAdcSql(),
    "knn_ivfpq" -> ProductQuant.knnIvfPqSql(),
    // bit-identical to the one-shot form — shares its oracle
    "knn_ivfpq_store" -> ProductQuant.knnIvfPqSql(),
    "knn_ivfpq_store_nprobe" -> ProductQuant.knnIvfPqSql(nProbe = 2),
    "knn_ivfpq_refine" -> ProductQuant.knnIvfPqRefineSql(),
    "ann_ingest_matches" -> AnnIndex.annIngestMatchesSql(),
    // same build chain, codes filtered by the delete predicate only —
    // centroid/codebook CTEs stay full-corpus (delete-in-place semantics)
    "ann_store_delete" -> ProductQuant.knnIvfPqSql(deleteWhere = Some("vec_id % 17 = 3")),
    "ann_store_health" -> AnnIndex.annStoreHealthSql(),
    "ann_recall_audit" -> ProductQuant.annRecallSql(),
    "ann_recall_nprobe" -> AnnIndex.annRecallNprobeSql(),
    "takedown_propagate" -> Takedown.takedownPropagateSql(),
    "takedown_access_report" -> Takedown.takedownAccessReportSql(),
    // maintained view ≡ direct recompute over the post-delete base table
    "mv_incremental" -> MaterializedView.mvIncrementalSql(),
    "knn_lsh_pairs" -> Similarity.cosineLshPairsSql(),
    "multimodal_features" -> Multimodal.featuresSql,
    "multimodal_frame_sample" -> Multimodal.frameSampleSql(),
    "multimodal_frame_dedup" -> Multimodal.frameDedupSql(),
    "docs_pagerank" -> GraphRank.pagerankSql(),
    "docs_pagerank_seeded" -> GraphRank.pagerankSeededSql(),
    "docs_graph_degrees" -> GraphRank.degreeProfileSql(),
    "audio_features" -> Audio.featuresSql,
    "audio_silence" -> Audio.silenceSql,
    "audio_downsample" -> Audio.downsampleSql,
    "events_zorder_layout" -> LayoutAudit.zorderLayoutSql(),
    "orders_bucketed_join" -> LayoutAudit.bucketedJoinSql(),
    "events_dpp_join" -> LayoutAudit.dppJoinSql(),
    "events_layout_composed" -> LayoutAudit.composedLayoutJoinSql(),
    "events_salted_join" -> Analytics.eventsSaltedJoinSql,
    "events_salted_join_heavy" -> Analytics.eventsSaltedJoinHeavySql,
    "events_aqe_skew_join" -> Analytics.eventsAqeSkewJoinSql,
    "table_stats" -> Analytics.tableStatsSql,
    "table_stats_approx" -> Analytics.tableStatsApproxSql,
    "decontaminate_semantic" -> Decontaminate.semanticSql(),
    "knn_filtered" -> Similarity.knnFilteredSql(),
    "orders_bloom_join" -> LayoutAudit.bloomJoinSql,
    "top_parts_two_phase" -> Analytics.topPartsSql,
    "table_quality_report" -> DataQuality.qualityReportSql,
    "table_quality_dirty" -> DataQuality.qualityReportDirtySql,
    "er_name_match" -> EntityResolution.nameMatchPairsSql,
    "events_heavy_hitters" -> HeavyHitters.userHeavyHittersSql(),
    "snapshot_point_lookup" -> sources.BloomSkipIndex.pointLookupSql,
    "events_retention_matrix" -> Analytics.retentionMatrixSql,
    "events_hll_cube" -> Analytics.hllCubeSql,
    "snapshot_spec_evolve" -> sources.VersionedTable.snapshotSpecEvolveSql(),
    "snapshot_multicol_spec" -> sources.VersionedTable.snapshotMultiColSql(),
    "snapshot_orc" -> sources.VersionedTable.snapshotOrcSql(),
    "snapshot_convert_format" -> sources.VersionedTable.snapshotConvertFormatSql(),
    "snapshot_sql_dml" -> sources.VersionedTable.snapshotSqlDmlSql(),
    "snapshot_sql_subquery" -> sources.VersionedTable.snapshotSqlSubquerySql(),
    "snapshot_sql_evolution" -> sources.VersionedTable.snapshotSqlEvolutionSql(),
    "snapshot_change_feed" -> sources.VersionedTable.snapshotChangeFeedSql(),
    "snapshot_hidden_partition" ->
      sources.VersionedTable.snapshotHiddenPartitionSql(),
    "snapshot_row_tracking" ->
      sources.VersionedTable.snapshotRowTrackingSql()
  )
}
