package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Curation, Dedup, Multimodal, Pipeline, Relational, Search, Similarity, TextAnalysis, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator declared done in SURVEY.md §2 has a `queries` entry here;
  * SQL-expressible ones also carry a DuckDB oracle in `oracleSql` with
  * IDENTICAL output column names and a total deterministic ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"  -> Relational.pricingSummary _,
    "q02_top_orders"       -> Relational.topOrders _,
    "q03_revenue_by_nation" -> Relational.revenueByNation _,
    "q04_window_rank"      -> Relational.topCustomersPerSegment _,
    "q05_window_lag_lead"  -> Relational.eventDeltas _,
    "q06_running_balance"  -> Relational.runningBalance _,
    "q07_rollup"           -> Relational.rollupReturns _,
    "q08_cube"             -> Relational.cubeOrders _,
    "q09_semi_join"        -> Relational.customersWithOrders _,
    "q10_anti_join"        -> Relational.ordersWithoutLineitems _,
    "q11_outer_join_agg"   -> Relational.orderCountsPerCustomer _,
    "q12_theta_join"       -> Relational.richerCustomersSameNation _,
    "q13_asof_join"        -> Relational.lastClickBeforePurchase _,
    "q14_set_ops"          -> Relational.setOpsCustomers _,
    "q15_distinct"         -> Relational.distinctFlags _,
    "q16_string_funcs"     -> Relational.partNameAnalysis _,
    "q17_date_funcs"       -> Relational.orderDateBreakdown _,
    "q18_math_funcs"       -> Relational.mathOnBalances _,
    "q19_json_extract"     -> Relational.eventPropsExtract _,
    "q20_conditional_agg"  -> Relational.conditionalAgg _,
    "q21_count_distinct"   -> Relational.distinctCounts _,
    "q22_grouping_sets"    -> Relational.groupingSets _,
    "q23_scalar_subquery"  -> Relational.aboveAvgOrders _,
    "q24_custom_udaf"      -> graft.operators.Udaf.weightedMeanQuery _,
    "q25_window_misc"      -> Relational.windowMisc _,
    "q26_array_funcs"      -> Relational.arrayFuncs _,
    "q27_pivot"            -> Relational.pivotOrders _,
    "q28_percentiles"      -> Relational.percentiles _,
    "q29_correlated_subq"  -> Relational.aboveNationAvg _,
    "q30_pushdown"         -> Relational.pushdownShowcase _,
    // q31: sketch aggregates with an EMBEDDED oracle-checkable bounds
    // audit (round-13). The sketch estimates themselves have no
    // cross-engine equality oracle (HLL++/KLL bit layouts are Spark's
    // own), so the query emits the exact twin's values plus *_ok flags
    // (1 iff each sketch landed inside its documented bound — rsd 0.02
    // at 5 sigma, rank accuracy 1/1000); the DuckDB oracle recomputes
    // the exact columns and asserts the flags literally. A sketch
    // regression flips a flag and fails the hash match — the bounds
    // check IS the oracle now. q42_exact_stats remains the standalone
    // exact twin; Round6cOpsSpec pins the same contract in-process.
    "q31_approx_stats"     -> Relational.approxStats _,
    "q32_range_frame"      -> Relational.rangeFrame _,
    "q33_map_funcs"        -> Relational.mapFuncs _,
    "q34_window_dist"      -> Relational.windowDist _,
    "q35_full_outer"       -> Relational.nationPresence _,
    "q36_tpch_q5"          -> Relational.localSupplierRevenue _,
    "q37_ignore_nulls"     -> Relational.ignoreNullsWindow _,
    "q38_latest_snapshot"  -> Relational.latestSnapshot _,
    // LLM-data-pipeline operators (dedup / text analysis / similarity)
    "dd01_exact_dedup"     -> Dedup.exactDedup _,
    "dd02_ngram_jaccard"   -> Dedup.ngramJaccardPairs _,
    "dd03_minhash_lsh"     -> Dedup.minhashLshPairs _,
    "dd04_simhash"         -> Dedup.simhashPairs _,
    "dd05_dup_clusters"    -> Dedup.dupClusters _,
    "dd06_dedup_apply"     -> Dedup.dedupApply _,
    "dd07_repeated_spans"  -> ((s: SparkSession, d: String) => Dedup.repeatedSpans(s, d)),
    "dd08_decontaminate"   -> ((s: SparkSession, d: String) => Dedup.decontaminate(s, d)),
    "dd09_incremental_dedup" -> Dedup.incrementalDedup _,
    "dd10_dup_source_matrix" -> Dedup.dupSourceMatrix _,
    "dd11_substring_dedup" -> ((s: SparkSession, d: String) => Dedup.substringDedup(s, d)),
    "dd12_streaming_neardup" -> graft.state.NearDupStream.streamingNearDup _,
    "dd13_semdedup"        -> ((s: SparkSession, d: String) => Similarity.semDedup(s, d)),
    "ta01_langid"          -> TextAnalysis.langIdQuery _,
    "ta02_quality"         -> TextAnalysis.qualityQuery _,
    "ta03_token_stats"     -> TextAnalysis.tokenStatsQuery _,
    "ta04_fingerprint"     -> TextAnalysis.fingerprintQuery _,
    "ta05_rolling_hash"    -> TextAnalysis.rollingHashQuery _,
    "ta06_curation"        -> graft.operators.Curation.curationQuery _,
    "ta07_unigram_logprob" -> TextAnalysis.unigramLogProbQuery _,
    "ta12_bigram_logprob"  -> TextAnalysis.bigramLogProbQuery _,
    "ta13_bpe_pairs"       -> ((s: SparkSession, d: String) => TextAnalysis.bpePairsQuery(s, d)),
    "ta08_vocab_encode"    -> ((s: SparkSession, d: String) => TextAnalysis.vocabEncodeQuery(s, d)),
    "ta09_repetition"      -> TextAnalysis.repetitionQuery _,
    "ta10_chunking"        -> ((s: SparkSession, d: String) => TextAnalysis.chunkQuery(s, d)),
    "ta11_pack_windows"    -> ((s: SparkSession, d: String) => Curation.packWindowsQuery(s, d)),
    "ta14_source_overlap"  -> TextAnalysis.sourceOverlapQuery _,
    "ta15_pii"             -> TextAnalysis.piiQuery _,
    "sa01_stratified_sample" -> ((s: SparkSession, d: String) => Curation.stratifiedSampleQuery(s, d)),
    "sa02_domain_reweight" -> Curation.domainReweightQuery _,
    "sa03_hash_sample"     -> ((s: SparkSession, d: String) => Curation.hashSampleQuery(s, d)),
    "sa04_mixture_sample"  -> ((s: SparkSession, d: String) => Curation.mixtureSampleQuery(s, d)),
    "sa05_shard_assign"    -> ((s: SparkSession, d: String) => Curation.shardAssignQuery(s, d)),
    "sa06_dsir_weight"     -> ((s: SparkSession, d: String) => Curation.dsirWeightQuery(s, d)),
    "pl01_pipeline"        -> ((s: SparkSession, d: String) => Pipeline.pipelineQuery(s, d)),
    "pl02_funnel"          -> Pipeline.funnelQuery _,
    // model-based quality filtering: full-batch logistic GD (lr=1.0,
    // 6dp-rounded gradients — engine-portable by the kmeans recipe)
    "cl01_quality_classifier" -> ((s: SparkSession, d: String) => graft.operators.Classifier.qualityClassifierQuery(s, d)),
    "ir01_bm25_topk"       -> ((s: SparkSession, d: String) => Search.bm25TopK(s, d)),
    "ir02_inverted_index"  -> ((s: SparkSession, d: String) => Search.invertedIndex(s, d)),
    "ir03_tfidf_terms"     -> ((s: SparkSession, d: String) => Search.tfIdfTopTerms(s, d)),
    "dq01_profile"         -> graft.operators.DataQuality.profileOrders _,
    "dq02_constraints"     -> graft.operators.DataQuality.constraintChecks _,
    "ev01_funnel"          -> Windows.funnelQuery _,
    "ev02_retention"       -> Windows.retentionQuery _,
    "ev03_transitions"     -> Windows.transitionsQuery _,
    "ev04_rolling_zscore"  -> Windows.rollingZscoreQuery _,
    "sim01_cosine_topk"    -> ((s: SparkSession, d: String) => Similarity.bruteForceTopK(s, d)),
    "sim02_ann_lsh"        -> ((s: SparkSession, d: String) => Similarity.lshTopK(s, d)),
    "sim03_embed_neardup"  -> ((s: SparkSession, d: String) => Similarity.embeddingNearDupPairs(s, d)),
    "sim04_ivf_ann"        -> ((s: SparkSession, d: String) => Similarity.ivfTopK(s, d)),
    "sim05_embed_neardup_lsh" -> ((s: SparkSession, d: String) => Similarity.embeddingNearDupPairsBucketed(s, d)),
    "sim06_kmeans"         -> ((s: SparkSession, d: String) => Similarity.kmeansAssign(s, d)),
    // dim declared to match pqOracleSql's literal — skips the probe job;
    // generic callers omit it and pqTopK probes the data instead
    "sim07_pq_ann"         -> ((s: SparkSession, d: String) => Similarity.pqTopK(s, d, dim = 64)),
    // stateful dataflow (the reference's core surface) — batch-mode run of
    // the flatMapGroupsWithState facade, oracle-checked against SQL
    "st01_stateful_balance" -> graft.streaming.BalanceApp.runningBalanceQuery _,
    // event-time windowing (batch twins of the streaming aggregations)
    "w01_tumbling_window"  -> Windows.tumblingQuery _,
    "w02_session_window"   -> Windows.sessionQuery _,
    "w03_sliding_window"   -> Windows.slidingQuery _,
    // multimodal binary-column pipeline (decode is a deterministic stub)
    "mm01_media_features"  -> Multimodal.mediaFeaturesQuery _,
    "mm02_frame_sample"    -> Multimodal.frameSampleQuery _,
    "mm03_media_embed_topk" -> ((s: SparkSession, d: String) => Multimodal.mediaEmbedTopK(s, d)),
    "mm04_image_neardup"   -> ((s: SparkSession, d: String) => Multimodal.imageNearDupQuery(s, d)),
    "mm05_scene_cut"       -> ((s: SparkSession, d: String) => Multimodal.sceneCutQuery(s, d)),
    // round-6 additions: session analytics, quality-policy dedup,
    // duplicate-aware reweighting, drift monitoring, mixture planning,
    // boolean retrieval, lexical diversity
    "ev05_sessionize"      -> ((s: SparkSession, d: String) => Windows.sessionizeQuery(s, d)),
    "dd14_canonical_select" -> Dedup.canonicalSelect _,
    "dd15_soft_dedup"      -> Dedup.softDedup _,
    "dq03_drift_psi"       -> graft.operators.DataQuality.driftPsiQuery _,
    "sa07_temperature_mix" -> Curation.temperatureMixQuery _,
    "ir04_boolean_retrieval" -> ((s: SparkSession, d: String) => Search.booleanRetrieval(s, d)),
    "ta16_lexical_stats"   -> TextAnalysis.lexicalStatsQuery _,
    "pl03_training_weights" -> Pipeline.trainingWeightsQuery _,
    // round-6 second batch: attribution, volume anomaly, perplexity
    // buckets, phrase search, epoch planning, audio framing, naive Bayes
    "ev06_attribution"     -> ((s: SparkSession, d: String) => Windows.attributionQuery(s, d)),
    "dq04_volume_anomaly"  -> graft.operators.DataQuality.volumeAnomalyQuery _,
    "ta17_ppl_buckets"     -> TextAnalysis.pplBucketsQuery _,
    "ir05_phrase_search"   -> ((s: SparkSession, d: String) => Search.phraseSearch(s, d)),
    "sa08_epoch_plan"      -> ((s: SparkSession, d: String) => Curation.epochPlanQuery(s, d)),
    "mm06_audio_frames"    -> ((s: SparkSession, d: String) => Multimodal.audioFramesQuery(s, d)),
    "cl02_naive_bayes_langid" -> ((s: SparkSession, d: String) => graft.operators.Classifier.naiveBayesLangQuery(s, d)),
    "gr01_dup_hub_rank"    -> ((s: SparkSession, d: String) => graft.operators.Graph.dupHubRankQuery(s, d)),
    "sim08_mips_topk"      -> ((s: SparkSession, d: String) => Similarity.mipsTopK(s, d)),
    "sim09_mips_lsh"       -> ((s: SparkSession, d: String) => Similarity.mipsLshTopK(s, d)),
    "ev07_heavy_hitters"   -> ((s: SparkSession, d: String) => Windows.heavyHittersQuery(s, d)),
    "ta18_zipf_fit"        -> ((s: SparkSession, d: String) => TextAnalysis.zipfFitQuery(s, d)),
    // deterministic-hash sketches: exact cross-engine oracles for
    // approximate structures (unlike q31's engine-specific HLL++/KLL)
    "sk01_kmv_distinct"    -> ((s: SparkSession, d: String) => graft.operators.Sketch.kmvDistinctQuery(s, d)),
    "dd16_bloom_decontam"  -> ((s: SparkSession, d: String) => graft.operators.Sketch.bloomDecontaminateQuery(s, d)),
    "er01_fuzzy_match"     -> ((s: SparkSession, d: String) => graft.operators.Resolution.fuzzyMatchQuery(s, d)),
    "er02_fuzzy_clusters"  -> ((s: SparkSession, d: String) => graft.operators.Resolution.fuzzyClustersQuery(s, d)),
    "er03_golden_record"   -> ((s: SparkSession, d: String) => graft.operators.Resolution.goldenRecordQuery(s, d)),
    "ev08_path_ngrams"     -> ((s: SparkSession, d: String) => graft.operators.Windows.pathNgramsQuery(s, d)),
    "ir06_pmi_cooccur"     -> ((s: SparkSession, d: String) => graft.operators.Search.pmiCooccurQuery(s, d)),
    "sk02_cms_heavy"       -> ((s: SparkSession, d: String) => graft.operators.Sketch.cmsHeavyQuery(s, d)),
    "cl03_knn_classifier"  -> ((s: SparkSession, d: String) => graft.operators.Classifier.knnClassifierQuery(s, d)),
    "sa09_cluster_split"   -> ((s: SparkSession, d: String) => graft.operators.Curation.clusterSplitQuery(s, d)),
    "sk03_minhash_est"     -> ((s: SparkSession, d: String) => graft.operators.Sketch.minhashEstimateQuery(s, d)),
    "ev09_ewma_anomaly"    -> ((s: SparkSession, d: String) => graft.operators.Windows.ewmaAnomalyQuery(s, d)),
    "cl04_confusion"       -> ((s: SparkSession, d: String) => graft.operators.Classifier.confusionReportQuery(s, d)),
    "q39_unpivot"          -> Relational.unpivotLineitem _,
    "q40_array_hof"        -> Relational.arrayHofQuery _,
    "q41_set_ops_all"      -> Relational.setOpsAllQuery _,
    "q42_exact_stats"      -> Relational.exactStats _,
    "pl04_dataset_card"    -> ((s: SparkSession, d: String) => graft.operators.Pipeline.datasetCardQuery(s, d)),
    "sk04_sample_quantiles" -> ((s: SparkSession, d: String) => graft.operators.Sketch.sampleQuantilesQuery(s, d)),
    "ir07_kwic"            -> ((s: SparkSession, d: String) => graft.operators.Search.kwicQuery(s, d)),
    "gr02_triangles"       -> ((s: SparkSession, d: String) => graft.operators.Graph.triangleCountQuery(s, d)),
    "ev10_session_bounce"  -> ((s: SparkSession, d: String) => graft.operators.Windows.sessionBounceQuery(s, d)),
    "dd17_boilerplate_strip" -> ((s: SparkSession, d: String) => Dedup.boilerplateStrip(s, d)),
    "sim10_margin_mining"  -> ((s: SparkSession, d: String) => Similarity.marginMining(s, d)),
    "dd18_semantic_decontam" -> ((s: SparkSession, d: String) => Dedup.semanticDecontaminate(s, d)),
    "sa10_weighted_sample" -> ((s: SparkSession, d: String) => Curation.weightedSampleQuery(s, d)),
    "ir08_lm_dirichlet"    -> ((s: SparkSession, d: String) => Search.lmDirichletTopK(s, d)),
    "cl05_centroid_classifier" -> ((s: SparkSession, d: String) => graft.operators.Classifier.centroidClassifierQuery(s, d)),
    "cl06_calibration"     -> ((s: SparkSession, d: String) => graft.operators.Classifier.calibrationReportQuery(s, d)),
    "ev11_markov_next"     -> ((s: SparkSession, d: String) => Windows.markovNextQuery(s, d)),
    "sim11_maxsim"         -> ((s: SparkSession, d: String) => Similarity.maxSimTopK(s, d)),
    "gr03_adamic_adar"     -> ((s: SparkSession, d: String) => graft.operators.Graph.adamicAdarQuery(s, d)),
    "ta19_char_entropy"    -> ((s: SparkSession, d: String) => TextAnalysis.charEntropyQuery(s, d)),
    "sk05_ams_f2"          -> ((s: SparkSession, d: String) => graft.operators.Sketch.amsF2Query(s, d)),
    "ev12_cadence"         -> ((s: SparkSession, d: String) => Windows.cadenceQuery(s, d)),
    "mm07_video_neardup"   -> ((s: SparkSession, d: String) => Multimodal.videoNearDupQuery(s, d)),
    "ir09_ann_recall"      -> ((s: SparkSession, d: String) => Similarity.annRecallQuery(s, d)),
    "dq06_ref_integrity"   -> ((s: SparkSession, d: String) => graft.operators.DataQuality.refIntegrityQuery(s, d)),
    "dq05_completeness"    -> ((s: SparkSession, d: String) => graft.operators.DataQuality.completenessQuery(s, d)),
    "ev13_conversion_lag"  -> ((s: SparkSession, d: String) => Windows.conversionLagQuery(s, d)),
    "ir10_rank_fusion"     -> ((s: SparkSession, d: String) => Search.rrfFusionTopK(s, d)),
    "ta20_rouge_overlap"   -> ((s: SparkSession, d: String) => TextAnalysis.rougeQuery(s, d)),
    "ir11_query_expansion" -> ((s: SparkSession, d: String) => Search.queryExpansionTerms(s, d)),
    "ta21_readability"     -> ((s: SparkSession, d: String) => TextAnalysis.readabilityQuery(s, d)),
    "ev14_decay_engagement" -> ((s: SparkSession, d: String) => Windows.decayEngagementQuery(s, d)),
    "gr04_kcore"           -> ((s: SparkSession, d: String) => graft.operators.Graph.kcoreQuery(s, d)),
    "sk06_kmv_setops"      -> ((s: SparkSession, d: String) => graft.operators.Sketch.kmvSetOpsQuery(s, d)),
    "ir12_ndcg_eval"       -> ((s: SparkSession, d: String) => Search.ndcgEvalQuery(s, d)),
    "dd19_containment"     -> ((s: SparkSession, d: String) => Dedup.containmentPairs(s, d)),
    "dd21_containment_sampled" -> ((s: SparkSession, d: String) => Dedup.containmentPairsSampled(s, d)),
    "dd22_sketch_containment" -> ((s: SparkSession, d: String) => Dedup.sketchContainmentQuery(s, d)),
    "dd23_containment_funnel" -> ((s: SparkSession, d: String) => Dedup.containmentFunnelQuery(s, d)),
    "sa12_token_budget" -> ((s: SparkSession, d: String) => Curation.tokenBudgetQuery(s, d)),
    // sa13: continuous ingestion admission — stateless ta01/ta02/sa03 gates
    // + a stateful per-source token budget; deterministic batch replay of
    // the transformWithState backend (the dd12 harness pattern)
    "sa13_streaming_admission" -> graft.state.AdmissionStream.streamingAdmission _,
    "cl09_threshold_sweep" -> ((s: SparkSession, d: String) => graft.operators.Classifier.thresholdSweepQuery(s, d)),
    "ta22_novelty"         -> ((s: SparkSession, d: String) => TextAnalysis.noveltyQuery(s, d)),
    "dq07_snapshot_diff"   -> ((s: SparkSession, d: String) => graft.operators.DataQuality.snapshotDiffQuery(s, d)),
    "ev15_cusum"           -> ((s: SparkSession, d: String) => Windows.cusumQuery(s, d)),
    "ir13_bm25f"           -> ((s: SparkSession, d: String) => Search.bm25fTopK(s, d)),
    "ev16_ab_test"         -> ((s: SparkSession, d: String) => Windows.abTestQuery(s, d)),
    "cl07_ensemble"        -> ((s: SparkSession, d: String) => graft.operators.Classifier.ensembleQuery(s, d)),
    "dd20_hamming_sweep"   -> ((s: SparkSession, d: String) => Dedup.hammingSweepQuery(s, d)),
    "ir14_snippets"        -> ((s: SparkSession, d: String) => Search.snippetQuery(s, d)),
    "ta23_bpe_merges"      -> ((s: SparkSession, d: String) => TextAnalysis.bpeMergesQuery(s, d)),
    "dq08_key_uniqueness"  -> ((s: SparkSession, d: String) => graft.operators.DataQuality.keyUniquenessQuery(s, d)),
    "q43_salted_join"      -> ((s: SparkSession, d: String) => Relational.saltedJoinQuery(s, d)),
    "mm08_audio_neardup"   -> ((s: SparkSession, d: String) => Multimodal.audioNearDupQuery(s, d)),
    // mm09: the quarantine report — empty on the clean corpus (its oracle
    // asserts zero false quarantines); corrupt-fixture behavior is pinned
    // in MultimodalSpec where the parquet corpus can't express it
    "mm09_media_quarantine" -> Multimodal.mediaQuarantineQuery _,
    // mm10: the NON-vacuous twin — deterministic corruption injection, so
    // quarantined rows (and their exact verdicts) are hash-checked against
    // DuckDB; Verify-only (duplicates mm09's decode cost in bench terms)
    "mm10_quarantine_injected" -> Multimodal.mediaQuarantineInjectedQuery _,
    "cl08_langid_agreement" -> ((s: SparkSession, d: String) => graft.operators.Classifier.langAgreementQuery(s, d)),
    "pl05_tokenizer_apply"  -> ((s: SparkSession, d: String) => TextAnalysis.tokenizerApplyQuery(s, d)),
    "sa11_temporal_split"   -> ((s: SparkSession, d: String) => Curation.temporalSplitQuery(s, d)),
  )

  /** DuckDB-runnable oracle SQL per query (same parquet tables, same column
    * names, same ORDER BY). Integer SUMs are cast to BIGINT (DuckDB would
    * widen to HUGEINT); order-dependent double aggregates are rounded on
    * both sides; passthrough doubles stay raw (bitwise-identical). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 4) AS avg_qty,
             min(l_extendedprice) AS min_price,
             max(l_extendedprice) AS max_price,
             count(1) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q02_top_orders" -> """
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q03_revenue_by_nation" -> """
      SELECT n_name,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             count(1) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",
    "q04_window_rank" -> """
      SELECT * FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rnk
        FROM customer) t
      WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""",
    "q05_window_lag_lead" -> """
      SELECT user_id, event_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
             lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
      FROM events ORDER BY user_id, event_id""",
    "q06_running_balance" -> """
      SELECT user_id, event_id,
             round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS balance
      FROM events ORDER BY user_id, event_id""",
    "q07_rollup" -> """
      SELECT l_returnflag, l_linestatus, count(1) AS n,
             round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q08_cube" -> """
      SELECT o_orderstatus, o_orderpriority, count(1) AS n,
             round(sum(o_totalprice), 2) AS sum_price
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "q09_semi_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",
    "q10_anti_join" -> """
      SELECT o_orderkey, o_orderstatus FROM orders
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      ORDER BY o_orderkey""",
    "q11_outer_join_agg" -> """
      SELECT c_custkey, count(o_orderkey) AS n_orders,
             round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""",
    "q12_theta_join" -> """
      SELECT s_suppkey, count(1) AS n_richer
      FROM supplier JOIN customer
        ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
      GROUP BY s_suppkey ORDER BY s_suppkey""",
    "q13_asof_join" -> """
      SELECT p.user_id, p.event_id, c.value AS last_click_value
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.user_id, p.event_id""",
    "q14_set_ops" -> """
      WITH hi AS (SELECT c_custkey FROM customer WHERE c_acctbal > 4000),
           seg AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      SELECT c_custkey, 'union' AS op FROM (SELECT c_custkey FROM hi UNION SELECT c_custkey FROM seg)
      UNION ALL
      SELECT c_custkey, 'intersect' AS op FROM (SELECT c_custkey FROM hi INTERSECT SELECT c_custkey FROM seg)
      UNION ALL
      SELECT c_custkey, 'except' AS op FROM (SELECT c_custkey FROM hi EXCEPT SELECT c_custkey FROM seg)
      ORDER BY op, c_custkey""",
    "q15_distinct" -> """
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""",
    "q16_string_funcs" -> """
      SELECT p_partkey, upper(p_brand) AS brand_up,
             substr(p_name, 1, 8) AS name_prefix,
             length(p_name) AS name_len,
             concat_ws('|', p_brand, p_type) AS brand_type,
             replace(p_name, ' ', '_') AS name_snake
      FROM part WHERE p_size >= 25 ORDER BY p_partkey""",
    "q17_date_funcs" -> """
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(quarter(o_orderdate) AS INT) AS o_quarter,
             count(1) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
      FROM orders GROUP BY 1, 2 ORDER BY o_year, o_quarter""",
    "q18_math_funcs" -> """
      SELECT c_custkey, abs(c_acctbal) AS abs_bal,
             CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
             CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
             sqrt(abs(c_acctbal)) AS sqrt_bal,
             CAST(c_custkey % 7 AS BIGINT) AS key_mod7
      FROM customer ORDER BY c_custkey""",
    "q19_json_extract" -> """
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
      FROM events
      WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 90
      ORDER BY event_id""",
    "q20_conditional_agg" -> """
      SELECT o_orderpriority,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
             CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
             round(avg(CASE WHEN o_totalprice > 1000 THEN o_totalprice END), 2) AS avg_big_price
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q21_count_distinct" -> """
      SELECT l_returnflag,
             count(DISTINCT l_orderkey) AS n_orders,
             count(DISTINCT l_partkey) AS n_parts
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q22_grouping_sets" -> """
      SELECT o_orderstatus, o_orderpriority, count(1) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "q23_scalar_subquery" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
      ORDER BY o_orderkey""",
    "q32_range_frame" -> """
      SELECT user_id, event_id,
             round(sum(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 2) AS hour_sum
      FROM events ORDER BY user_id, event_id""",
    "q33_map_funcs" -> """
      SELECT event_id,
             CAST(len(json_keys(props)) + 1 AS BIGINT) AS map_size,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
             event_type AS etype,
             array_to_string(list_sort(list_append(json_keys(props), 'type')), ',')
               AS keys_sorted
      FROM events ORDER BY event_id""",
    "q34_window_dist" -> """
      SELECT c_mktsegment, c_custkey, c_acctbal,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cume,
             nth_value(c_custkey, 3) OVER w AS third_key
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_mktsegment, c_custkey""",
    "q35_full_outer" -> """
      SELECT coalesce(c.nationkey, s.skey) AS nationkey,
             coalesce(n_customers, 0) AS n_customers,
             coalesce(n_suppliers, 0) AS n_suppliers,
             (n_customers IS NULL OR n_suppliers IS NULL) AS one_sided
      FROM (SELECT c_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n_customers
            FROM customer GROUP BY 1) c
      FULL OUTER JOIN (SELECT s_nationkey AS skey, CAST(count(*) AS BIGINT) AS n_suppliers
            FROM supplier GROUP BY 1) s
        ON c.nationkey = s.skey
      ORDER BY nationkey""",
    "q36_tpch_q5" -> """
      SELECT n_name,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             count(1) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "st01_stateful_balance" -> """
      SELECT user_id, event_id,
             round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS balance
      FROM events ORDER BY user_id, event_id""",
    "q24_custom_udaf" -> """
      SELECT l_returnflag,
             round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS w_mean_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q25_window_misc" -> """
      SELECT c_mktsegment, c_custkey, c_acctbal,
             dense_rank() OVER w AS drnk,
             ntile(4) OVER w AS quartile,
             first_value(c_custkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
               AND UNBOUNDED FOLLOWING) AS seg_top_key,
             last_value(c_custkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
               AND UNBOUNDED FOLLOWING) AS seg_bottom_key
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_mktsegment, c_custkey""",
    "q26_array_funcs" -> """
      SELECT l_returnflag,
             array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
             CAST(len(list(DISTINCT l_linestatus)) AS BIGINT) AS n_statuses
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q27_pivot" -> """
      SELECT o_orderpriority,
             count(1) FILTER (o_orderstatus = 'F') AS n_f,
             count(1) FILTER (o_orderstatus = 'O') AS n_o,
             count(1) FILTER (o_orderstatus = 'P') AS n_p
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q28_percentiles" -> """
      SELECT o_orderpriority,
             round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
             round(quantile_cont(o_totalprice, 0.9), 2) AS p90
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q29_correlated_subq" -> """
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer o
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
                         WHERE i.c_nationkey = o.c_nationkey)
      ORDER BY c_custkey""",
    "q30_pushdown" -> """
      SELECT p_partkey, p_retailprice FROM part
      WHERE p_size BETWEEN 10 AND 20
        AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        AND p_name LIKE 'small%'
      ORDER BY p_partkey""",
    "w01_tumbling_window" -> """
      SELECT CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS window_start,
             event_type, count(1) AS n, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "w02_session_window" -> """
      WITH o AS (SELECT user_id, ts, event_id, value,
                        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
                 FROM events),
      m AS (SELECT *, CASE WHEN pts IS NULL OR epoch(ts)-epoch(pts) >= 1800
                           THEN 1 ELSE 0 END AS brk FROM o),
      g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS sid FROM m)
      SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
             count(1) AS n_events, round(sum(value), 2) AS sum_value
      FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "w03_sliding_window" -> """
      WITH e AS (SELECT CAST(floor(epoch(ts)/1800) AS BIGINT) AS b, value FROM events),
      x AS (SELECT (b - i.i)*1800 AS window_start, value FROM e, range(0, 2) i(i))
      SELECT window_start, count(1) AS n, round(sum(value), 2) AS sum_value
      FROM x GROUP BY 1 ORDER BY 1""",
    "dd01_exact_dedup" -> """
      SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
             min(doc_id) AS keep_id, count(1) AS n_copies
      FROM documents GROUP BY 1 ORDER BY keep_id""",
    "dd02_ngram_jaccard" -> ngramJaccardSql,
    // dd03 is LSH + exact verification; with 32x4 banding its recall at the
    // 0.8 threshold is 1-5e-8, so the brute-force SQL is its exact oracle.
    "dd03_minhash_lsh" -> ngramJaccardSql,
    // dd04's portable md5-based fingerprint is re-derived in pure SQL and
    // compared brute-force — checks fingerprint, banding recall and the
    // hamming cut end to end. (The operator's hot-bucket guard is exact on
    // this corpus: no band bucket approaches HotBucketCap, so the star
    // approximation documented on Dedup.HotBucketCap never engages here.)
    "dd04_simhash" -> Dedup.simhashOracleSql,
    // C4-style repeated-span stats over token 8-grams; span construction,
    // the distinct-doc cut and the ratio are all re-derived in SQL
    "dd07_repeated_spans" -> Dedup.repeatedSpansOracleSql,
    "dd08_decontaminate" -> Dedup.decontaminateOracleSql(),
    "dd09_incremental_dedup" -> Dedup.incrementalDedupOracleSql,
    // continuous near-dup dedup: the batch-mode run of the stateful LSH
    // store; ground truth = brute-force prefix-ordered near-dup (same
    // recall argument as dd03's oracle)
    "dd12_streaming_neardup" -> graft.state.NearDupStream.oracleSql,
    "dd10_dup_source_matrix" -> s"""
      WITH pairs AS MATERIALIZED (${pairsSubquerySql})
      SELECT least(a.source, b.source) AS source_a,
             greatest(a.source, b.source) AS source_b,
             CAST(count(*) AS BIGINT) AS n_dup_pairs
      FROM pairs p JOIN documents a ON p.doc_a = a.doc_id
      JOIN documents b ON p.doc_b = b.doc_id
      GROUP BY 1, 2 ORDER BY source_a, source_b""",
    "dd11_substring_dedup" -> Dedup.substringDedupOracleSql,
    "dd05_dup_clusters" -> s"""
      WITH RECURSIVE $ccCtesSql
      SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""",
    "dd06_dedup_apply" -> s"""
      WITH pairs AS MATERIALIZED (${pairsSubquerySql})
      SELECT doc_id, n_chars FROM documents
      WHERE doc_id NOT IN (SELECT doc_b FROM pairs)
      ORDER BY doc_id""",
    // mm01/mm03 run a REAL PNG decode (javax.imageio) over fixtures whose pixel
    // i = text byte (i mod len); the oracle re-derives the decoded-raster
    // pooling straight from that pixel function (ASCII corpus: char ord ==
    // UTF-8 byte, which mm01's old byte-pooling oracle already relied on)
    "mm01_media_features" -> """
      SELECT doc_id AS media_id, 'image' AS kind,
             CAST(256 AS BIGINT) AS n_px,
             CAST(coalesce(list_sum(list_transform(range(0, 256, 8),
               i -> CASE WHEN length(text) = 0 THEN 0
                         ELSE ord(substr(text, CAST((i % length(text)) + 1 AS INT), 1)) END)), 0) AS BIGINT) AS f0,
             CAST(coalesce(list_sum(list_transform(range(1, 256, 8),
               i -> CASE WHEN length(text) = 0 THEN 0
                         ELSE ord(substr(text, CAST((i % length(text)) + 1 AS INT), 1)) END)), 0) AS BIGINT) AS f1,
             CAST(coalesce(list_sum(list_transform(range(2, 256, 8),
               i -> CASE WHEN length(text) = 0 THEN 0
                         ELSE ord(substr(text, CAST((i % length(text)) + 1 AS INT), 1)) END)), 0) AS BIGINT) AS f2
      FROM documents ORDER BY media_id""",
    // mm02 (round-12): the oracle re-derives each SAMPLED frame's decoded
    // pixel sum from the GIF fixtures' known per-frame pixel function
    // (frame f pixel i = text byte ((i + 7f) mod len)) — the mm01 recipe
    // swept across frames
    "mm02_frame_sample" -> s"""
      WITH fr AS (SELECT CAST(f.f AS BIGINT) AS frame_idx
                  FROM range(0, ${Multimodal.GifFrameCount}) f(f)
                  WHERE f.f % ${Multimodal.GifFrameStride} = 0)
      SELECT doc_id AS media_id, frame_idx,
             CAST(256 AS BIGINT) AS n_px,
             CAST(coalesce(list_sum(list_transform(range(0, 256),
               i -> CASE WHEN length(text) = 0 THEN 0
                    ELSE ord(substr(text,
                      CAST(((i + ${Multimodal.GifPixelStep} * frame_idx)
                            % length(text)) + 1 AS INT), 1)) END)), 0)
               AS BIGINT) AS px_sum
      FROM documents CROSS JOIN fr
      ORDER BY media_id, frame_idx""",
    "mm03_media_embed_topk" -> Multimodal.mediaEmbedTopKOracleSql(),
    // mm04: the oracle re-derives the aHash bits from the fixtures' known
    // pixel function and brute-forces hamming over all pairs — lossless vs
    // the banded Spark plan at maxHamming <= 3 (4-band pigeonhole)
    "mm04_image_neardup" -> Multimodal.imageNearDupOracleSql(),
    "ta01_langid" -> TextAnalysis.langIdOracleSql,
    "ta02_quality" -> """
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents),
      c AS (SELECT doc_id, t,
                   CAST(length(t) AS BIGINT) AS n_chars_norm,
                   CASE WHEN length(t) = 0 THEN CAST(0 AS BIGINT)
                        ELSE CAST(length(t) - length(regexp_replace(t, ' ', '', 'g')) + 1 AS BIGINT)
                   END AS n_tokens,
                   replace(' ' || t || ' ', ' ', '  ') AS dd
            FROM d)
      SELECT doc_id, n_chars_norm, n_tokens,
             CAST(length(t) - n_tokens + 1 AS DOUBLE) / nullif(n_tokens, 0) AS avg_token_len,
             CAST(CAST((length(dd) - length(regexp_replace(dd, ' \Qthe\E ', '', 'g'))) / 5 AS BIGINT) AS DOUBLE) / nullif(n_tokens, 0) AS the_ratio
      FROM c ORDER BY doc_id""",
    "ta03_token_stats" -> """
      WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
                 FROM documents)
      SELECT doc_id,
             CASE WHEN length(t) = 0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(length(t) - length(regexp_replace(t, ' ', '', 'g')) + 1 AS BIGINT)
             END AS ws_tokens,
             CAST(len(regexp_extract_all(t, '[a-z]+|[0-9]+')) AS BIGINT) AS re_tokens,
             CAST(len(list_distinct(string_split(t, ' '))) AS BIGINT) AS uniq_tokens
      FROM d ORDER BY doc_id""",
    "ta04_fingerprint" -> """
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_md5
      FROM documents ORDER BY doc_id""",
    "ta05_rolling_hash" -> TextAnalysis.rollingHashOracleSql,
    // ta06 composes the langid/quality/dedup/span oracles into the same
    // rule cascade as the operator — pipeline and oracle cannot drift
    "ta06_curation" -> graft.operators.Curation.curationOracleSql,
    "ta07_unigram_logprob" -> TextAnalysis.unigramLogProbOracleSql,
    "ta12_bigram_logprob" -> TextAnalysis.bigramLogProbOracleSql,
    "ta13_bpe_pairs" -> TextAnalysis.bpePairsOracleSql,
    "ta14_source_overlap" -> TextAnalysis.sourceOverlapOracleSql,
    // ta15: the oracle re-implements Luhn from its definition (DuckDB has
    // no luhn_check); fixture arithmetic and redaction order are shared
    "ta15_pii" -> TextAnalysis.piiOracleSql,
    "ta08_vocab_encode" -> TextAnalysis.vocabEncodeOracleSql,
    "ta09_repetition" -> TextAnalysis.repetitionOracleSql,
    "ta10_chunking" -> TextAnalysis.chunkOracleSql,
    "ta11_pack_windows" -> graft.operators.Curation.packWindowsOracleSql,
    "sa01_stratified_sample" -> graft.operators.Curation.stratifiedSampleOracleSql,
    "sa02_domain_reweight" -> graft.operators.Curation.domainReweightOracleSql,
    "sa03_hash_sample" -> graft.operators.Curation.hashSampleOracleSql(),
    "sa04_mixture_sample" -> graft.operators.Curation.mixtureSampleOracleSql(),
    "sa05_shard_assign" -> graft.operators.Curation.shardAssignOracleSql,
    // sa06: parameterized def — the oracle interpolates the same target
    // source literal the Scala default uses (ADVICE r4 rule)
    "sa06_dsir_weight" -> graft.operators.Curation.dsirWeightOracleSql(),
    // pl01/pl02: composed from the sub-operators' own oracle SQL as CTEs;
    // parameterized defs interpolating the same cut/shard literals (r4 rule)
    "pl01_pipeline" -> graft.operators.Pipeline.pipelineOracleSql(),
    "pl02_funnel" -> graft.operators.Pipeline.funnelOracleSql,
    // cl01: the GD loop unrolled into generated CTE blocks from the same
    // iters spec (kmeans oracle pattern — operator and oracle cannot drift)
    "cl01_quality_classifier" -> graft.operators.Classifier.qualityClassifierOracleSql(),
    "ir01_bm25_topk" -> graft.operators.Search.bm25OracleSql,
    "ir02_inverted_index" -> graft.operators.Search.invertedIndexOracleSql,
    "ir03_tfidf_terms" -> graft.operators.Search.tfIdfOracleSql,
    "dq01_profile" -> graft.operators.DataQuality.profileOracleSql,
    "dq02_constraints" -> graft.operators.DataQuality.constraintsOracleSql,
    "ev01_funnel" -> Windows.funnelOracleSql,
    "ev02_retention" -> Windows.retentionOracleSql,
    "ev03_transitions" -> Windows.transitionsOracleSql,
    "ev04_rolling_zscore" -> Windows.rollingZscoreOracleSql,
    // sim01: shared definition in Similarity (ir09's recall oracle
    // composes the same SQL, so the two cannot drift)
    "sim01_cosine_topk" -> Similarity.bruteForceTopKOracleSql(),
    // sim04: IVF is deterministic by construction (fixed centroids, argmax
    // assignment, exact top-k within probed lists) — the whole ANN structure
    // is re-derived in SQL and hash-compared, unlike probabilistic LSH
    "sim04_ivf_ann" -> s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      ac AS (SELECT e.vec_id, cent.cid, ${cosSql("e.v", "cent.cv")} AS ccos FROM e, cent),
      assign AS (SELECT vec_id AS cand_id, cid FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS r
          FROM ac) t WHERE r = 1),
      probe AS (SELECT vec_id AS query_id, cid FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS r
          FROM ac WHERE vec_id < 100) t WHERE r <= 4),
      cand AS (SELECT p.query_id, a.cand_id FROM probe p
               JOIN assign a ON p.cid = a.cid AND a.cand_id <> p.query_id),
      scored AS (SELECT c.query_id, c.cand_id, round(${cosSql("q.v", "x.v")}, 6) AS cos
                 FROM cand c JOIN e q ON c.query_id = q.vec_id
                 JOIN e x ON c.cand_id = x.vec_id)
      SELECT query_id, cand_id, cos, rnk FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rnk
        FROM scored) t
      WHERE rnk <= 5 ORDER BY query_id, rnk""",
    "sim03_embed_neardup" -> """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT vec_a, vec_b, cos FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[CAST(i AS INT)]*b.v[CAST(i AS INT)])) /
                 (sqrt(list_sum(list_transform(range(1, len(a.v)+1), i -> a.v[CAST(i AS INT)]*a.v[CAST(i AS INT)]))) *
                  sqrt(list_sum(list_transform(range(1, len(b.v)+1), i -> b.v[CAST(i AS INT)]*b.v[CAST(i AS INT)])))), 6) AS cos
        FROM e a JOIN e b ON a.vec_id < b.vec_id) t
      WHERE cos >= 0.45 ORDER BY vec_a, vec_b""",
    "sim06_kmeans" -> graft.operators.Similarity.kmeansOracleSql(),
    // dd13: SemDeDup = the sim06 Lloyd CTE chain + within-cluster cosine
    // threshold + min-id keep policy, one shared SQL generator
    "dd13_semdedup" -> graft.operators.Similarity.semDedupOracleSql(),
    // sim02/sim05: the hyperplane signs are md5-derived (engine-portable),
    // so even the "probabilistic" LSH structure is fully deterministic and
    // re-derived in SQL — buckets, probe sets, verification and ranking
    "sim02_ann_lsh" -> graft.operators.Similarity.lshTopKOracleSql(),
    "sim05_embed_neardup_lsh" ->
      graft.operators.Similarity.embedNearDupBucketedOracleSql(),
    // sim07: PQ is deterministic end to end (fixed codebooks, argmin codes,
    // ordered ADC folds) — like sim04, the full ANN structure is re-derived
    // in SQL and hash-compared
    "sim07_pq_ann" -> graft.operators.Similarity.pqOracleSql(),
    // round-6 additions
    "ev05_sessionize" -> Windows.sessionizeOracleSql,
    "dq03_drift_psi" -> graft.operators.DataQuality.driftPsiOracleSql,
    "sa07_temperature_mix" -> Curation.temperatureMixOracleSql,
    "ir04_boolean_retrieval" -> Search.booleanRetrievalOracleSql,
    "ta16_lexical_stats" -> TextAnalysis.lexicalStatsOracleSql,
    "mm05_scene_cut" -> Multimodal.sceneCutOracleSql(),
    "pl03_training_weights" ->
      graft.operators.Pipeline.trainingWeightsOracleSql(ccCtesSql),
    // dd14/dd15 consume the SAME cluster labels as dd05 — their oracles
    // extend dd05's recursive-component SQL with the selection / weighting
    "dd14_canonical_select" -> s"""
      WITH RECURSIVE $ccCtesSql,
      j AS (SELECT cl.cluster_id, cl.doc_id, d.n_chars
            FROM cl JOIN documents d USING (doc_id)),
      r AS (SELECT cluster_id, doc_id, n_chars,
              row_number() OVER (PARTITION BY cluster_id
                ORDER BY n_chars DESC, doc_id) AS rnk,
              CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
            FROM j)
      SELECT cluster_id, doc_id AS kept_doc_id, n_chars AS kept_n_chars,
             n_members
      FROM r WHERE rnk = 1 ORDER BY cluster_id""",
    "dd15_soft_dedup" -> s"""
      WITH RECURSIVE $ccCtesSql,
      sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS csize
             FROM cl GROUP BY cluster_id),
      pd AS (SELECT cl.doc_id, cl.cluster_id, sz.csize
             FROM cl JOIN sz USING (cluster_id))
      SELECT d.doc_id, pd.cluster_id,
             CAST(1 AS DOUBLE) / CAST(coalesce(pd.csize, 1) AS DOUBLE) AS weight
      FROM documents d LEFT JOIN pd USING (doc_id)
      ORDER BY d.doc_id""",
    // round-6 second batch
    "ev06_attribution" -> Windows.attributionOracleSql(),
    "dq04_volume_anomaly" -> graft.operators.DataQuality.volumeAnomalyOracleSql,
    "ta17_ppl_buckets" -> TextAnalysis.pplBucketsOracleSql,
    "ir05_phrase_search" -> Search.phraseSearchOracleSql(),
    "sa08_epoch_plan" -> Curation.epochPlanOracleSql(),
    "mm06_audio_frames" -> Multimodal.audioFramesOracleSql(),
    "cl02_naive_bayes_langid" ->
      graft.operators.Classifier.naiveBayesLangOracleSql(),
    "gr01_dup_hub_rank" ->
      graft.operators.Graph.dupHubRankOracleSql(pairsSubquerySql),
    "sim08_mips_topk" -> Similarity.mipsTopKOracleSql(),
    // sim09: the asymmetric-transform buckets are md5-derived like
    // sim02/sim05, so DuckDB re-derives the full ANN structure exactly
    "sim09_mips_lsh" -> Similarity.mipsLshOracleSql(),
    "ev07_heavy_hitters" -> Windows.heavyHittersOracleSql,
    "ta18_zipf_fit" -> TextAnalysis.zipfFitOracleSql,
    "sk01_kmv_distinct" -> graft.operators.Sketch.kmvDistinctOracleSql(),
    "dd16_bloom_decontam" ->
      graft.operators.Sketch.bloomDecontaminateOracleSql(),
    "er01_fuzzy_match" -> graft.operators.Resolution.fuzzyMatchOracleSql(),
    "er02_fuzzy_clusters" -> graft.operators.Resolution.fuzzyClustersOracleSql(),
    "er03_golden_record" -> graft.operators.Resolution.goldenRecordOracleSql(),
    "q37_ignore_nulls" -> Relational.ignoreNullsWindowOracleSql,
    "q38_latest_snapshot" -> Relational.latestSnapshotOracleSql,
    "ev08_path_ngrams" -> graft.operators.Windows.pathNgramsOracleSql,
    "ir06_pmi_cooccur" -> graft.operators.Search.pmiCooccurOracleSql(),
    "sk02_cms_heavy" -> graft.operators.Sketch.cmsHeavyOracleSql(),
    // cl03/cl04: inline — reuse this object's sequential-fold cosSql (like
    // sim04) and share the prediction CTE chain between query and report
    // recall_at_k is 1.0 by construction at oracle scale: the comparison
    // budget routes every test corpus to the EXACT path (the approximate
    // IVF route, where the sampled recall varies, engages only above
    // Classifier.KnnScoreBudget — far beyond any sf the oracle checks)
    "cl03_knn_classifier" -> s"""
      WITH ${knnPredCtesSql()}
      SELECT vec_id, true_label, pred_label, n_votes, correct,
             1.0 AS recall_at_k
      FROM pred ORDER BY vec_id""",
    "cl04_confusion" -> s"""
      WITH ${knnPredCtesSql()},
      bt AS (SELECT true_label AS label, CAST(count(*) AS BIGINT) AS n_true,
               CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS tp
             FROM pred GROUP BY 1),
      bp AS (SELECT pred_label AS label, CAST(count(*) AS BIGINT) AS n_pred
             FROM pred GROUP BY 1),
      j AS (SELECT coalesce(bt.label, bp.label) AS label,
              coalesce(n_true, 0) AS n_true, coalesce(n_pred, 0) AS n_pred,
              coalesce(tp, 0) AS tp
            FROM bt FULL OUTER JOIN bp ON bt.label = bp.label),
      m AS (SELECT *,
              CASE WHEN n_pred > 0
                   THEN round(CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE), 6)
              END AS precision,
              CASE WHEN n_true > 0
                   THEN round(CAST(tp AS DOUBLE) / CAST(n_true AS DOUBLE), 6)
              END AS recall
            FROM j)
      SELECT label, n_true, n_pred, tp, precision, recall,
             CASE WHEN precision IS NOT NULL AND recall IS NOT NULL
                    AND precision + recall > 0.0
                  THEN round(2.0 * precision * recall / (precision + recall), 6)
             END AS f1
      FROM m ORDER BY label""",
    "sa09_cluster_split" ->
      graft.operators.Curation.clusterSplitOracleSql(ccCtesSql),
    "sk03_minhash_est" ->
      graft.operators.Sketch.minhashEstimateOracleSql(pairsSubquerySql),
    "ev09_ewma_anomaly" -> graft.operators.Windows.ewmaAnomalyOracleSql(),
    "q39_unpivot" -> Relational.unpivotLineitemOracleSql,
    "q40_array_hof" -> Relational.arrayHofOracleSql,
    "q41_set_ops_all" -> Relational.setOpsAllOracleSql,
    "q42_exact_stats" -> Relational.exactStatsOracleSql,
    // q31's oracle: exact columns recomputed, in-bounds flags asserted
    // literally 1 (see the queries-map note — the bounds audit IS the
    // oracle; an out-of-bounds sketch flips a flag and hash-mismatches)
    "q31_approx_stats" -> Relational.approxStatsOracleSql,
    "pl04_dataset_card" ->
      graft.operators.Pipeline.datasetCardOracleSql(ccCtesSql),
    "sk04_sample_quantiles" ->
      graft.operators.Sketch.sampleQuantilesOracleSql(),
    "ir07_kwic" -> graft.operators.Search.kwicOracleSql(),
    "gr02_triangles" ->
      graft.operators.Graph.triangleCountOracleSql(pairsSubquerySql),
    "ev10_session_bounce" -> graft.operators.Windows.sessionBounceOracleSql,
    "dd17_boilerplate_strip" -> Dedup.boilerplateStripOracleSql(),
    "sim10_margin_mining" -> Similarity.marginMiningOracleSql(),
    "dd18_semantic_decontam" -> Dedup.semanticDecontaminateOracleSql(),
    "sa10_weighted_sample" -> Curation.weightedSampleOracleSql(),
    "ir08_lm_dirichlet" -> Search.lmDirichletOracleSql(),
    "cl05_centroid_classifier" ->
      graft.operators.Classifier.centroidClassifierOracleSql(),
    "cl06_calibration" -> graft.operators.Classifier.calibrationOracleSql(),
    "ev11_markov_next" -> Windows.markovNextOracleSql,
    "sim11_maxsim" -> Similarity.maxSimOracleSql(),
    "gr03_adamic_adar" ->
      graft.operators.Graph.adamicAdarOracleSql(pairsSubquerySql),
    "ta19_char_entropy" -> TextAnalysis.charEntropyOracleSql,
    "sk05_ams_f2" -> graft.operators.Sketch.amsF2OracleSql(),
    "ev12_cadence" -> Windows.cadenceOracleSql,
    "mm07_video_neardup" -> Multimodal.videoNearDupOracleSql(),
    "ir09_ann_recall" -> Similarity.annRecallOracleSql(),
    "dq06_ref_integrity" -> graft.operators.DataQuality.refIntegrityOracleSql,
    "dq05_completeness" -> graft.operators.DataQuality.completenessOracleSql,
    "ev13_conversion_lag" -> Windows.conversionLagOracleSql,
    "ir10_rank_fusion" -> Search.rrfFusionOracleSql(),
    "ta20_rouge_overlap" -> TextAnalysis.rougeOracleSql,
    "ir11_query_expansion" -> Search.queryExpansionOracleSql(),
    "ta21_readability" -> TextAnalysis.readabilityOracleSql,
    "ev14_decay_engagement" -> Windows.decayEngagementOracleSql,
    "gr04_kcore" -> graft.operators.Graph.kcoreOracleSql(pairsSubquerySql),
    "sk06_kmv_setops" -> graft.operators.Sketch.kmvSetOpsOracleSql(),
    "ir12_ndcg_eval" -> Search.ndcgEvalOracleSql(),
    "dd19_containment" -> Dedup.containmentOracleSql(),
    "dd21_containment_sampled" -> Dedup.containmentSampledOracleSql(),
    "dd22_sketch_containment" -> Dedup.sketchContainmentOracleSql(),
    "dd23_containment_funnel" -> Dedup.containmentFunnelOracleSql(),
    "sa12_token_budget" -> Curation.tokenBudgetOracleSql,
    "sa13_streaming_admission" -> graft.state.AdmissionStream.oracleSql,
    "cl09_threshold_sweep" -> graft.operators.Classifier.thresholdSweepOracleSql(),
    "ta22_novelty" -> TextAnalysis.noveltyOracleSql,
    "dq07_snapshot_diff" -> graft.operators.DataQuality.snapshotDiffOracleSql,
    "ev15_cusum" -> Windows.cusumOracleSql,
    "ir13_bm25f" -> Search.bm25fOracleSql(),
    "ev16_ab_test" -> Windows.abTestOracleSql,
    "cl07_ensemble" -> ensembleOracleSql,
    "dd20_hamming_sweep" -> Dedup.hammingSweepOracleSql,
    "ir14_snippets" -> Search.snippetOracleSql(),
    "ta23_bpe_merges" -> TextAnalysis.bpeMergesOracleSql,
    "dq08_key_uniqueness" -> graft.operators.DataQuality.keyUniquenessOracleSql,
    "q43_salted_join" -> Relational.saltedJoinOracleSql,
    "mm08_audio_neardup" -> Multimodal.audioNearDupOracleSql(),
    "mm09_media_quarantine" -> Multimodal.mediaQuarantineOracleSql,
    "mm10_quarantine_injected" -> Multimodal.mediaQuarantineInjectedOracleSql,
    "cl08_langid_agreement" -> graft.operators.Classifier.langAgreementOracleSql,
    "pl05_tokenizer_apply" -> TextAnalysis.tokenizerApplyOracleSql,
    "sa11_temporal_split" -> Curation.temporalSplitOracleSql,
  )

  /** The cl07 ensemble oracle: two independently-prefixed kNN prediction
    * chains (k=5 and k=1) joined with the embedded cl05 centroid oracle,
    * then the same closed-form three-voter majority the Spark side
    * computes. Lives here because it composes [[knnPredCtesSql]]. */
  private def ensembleOracleSql: String = s"""
      WITH ${knnPredCtesSql(5, "a_")},
      ${knnPredCtesSql(1, "b_")},
      cj AS (SELECT a.vec_id, a.true_label, a.pred_label AS knn5,
                    b.pred_label AS knn1, c.pred_label AS centroid
             FROM a_pred a JOIN b_pred b USING (vec_id)
               JOIN (SELECT vec_id, pred_label FROM
                 (${graft.operators.Classifier.centroidClassifierOracleSql()}) cz)
                 c USING (vec_id))
      SELECT vec_id, true_label, knn5, knn1, centroid,
             CASE WHEN knn1 = centroid AND knn1 <> knn5 THEN knn1
                  ELSE knn5 END AS ensemble_label,
             CAST(CASE WHEN knn5 = knn1 AND knn1 = centroid THEN 3
                       WHEN knn5 = knn1 OR knn5 = centroid
                            OR knn1 = centroid THEN 2
                       ELSE 1 END AS BIGINT) AS n_agree,
             (CASE WHEN knn1 = centroid AND knn1 <> knn5 THEN knn1
                   ELSE knn5 END) = true_label AS correct
      FROM cj ORDER BY vec_id"""

  /** The cl03 kNN prediction derivation as a CTE chain ending in
    * `pred(vec_id, true_label, pred_label, n_votes, correct)` — ONE
    * definition shared by the cl03 oracle (which orders it) and the cl04
    * oracle (which aggregates it). `k` is the neighbor count — the SAME
    * parameter the Spark side defaults (Classifier.knnClassifierQuery),
    * interpolated rather than hardcoded so a k change cannot silently
    * desynchronize the oracle. */
  private def knnPredCtesSql(k: Int = 5, p: String = ""): String = s"""
      ${p}e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label,
                   CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % 10 AS h
                 FROM embeddings),
      ${p}train AS (SELECT vec_id AS cand_id, v, label AS cand_label FROM ${p}e WHERE h < 8),
      ${p}test AS (SELECT vec_id, v, label AS true_label FROM ${p}e WHERE h >= 8),
      ${p}sc AS (SELECT t.vec_id, t.true_label, c.cand_id, c.cand_label,
               round(${cosSql("t.v", "c.v")}, 6) AS cos
             FROM ${p}test t CROSS JOIN ${p}train c),
      ${p}rk AS (SELECT *, row_number() OVER (PARTITION BY vec_id
               ORDER BY cos DESC, cand_id) AS rnk FROM ${p}sc),
      ${p}votes AS (SELECT vec_id, true_label, cand_label,
                  CAST(count(*) AS BIGINT) AS n_votes
                FROM ${p}rk WHERE rnk <= $k GROUP BY 1, 2, 3),
      ${p}win AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY n_votes DESC, cand_label) AS vr FROM ${p}votes),
      ${p}pred AS (SELECT vec_id, true_label, cand_label AS pred_label, n_votes,
                      cand_label = true_label AS correct
               FROM ${p}win WHERE vr = 1)"""

  /** DuckDB sequential-fold cosine of two DOUBLE[] columns — bit-identical
    * to [[graft.functions.CosineSim]] (left-to-right summation both sides;
    * proven exact by sim01). */
  private def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, len($a)+1), i -> $a[CAST(i AS INT)]*$b[CAST(i AS INT)])) /
       (sqrt(list_sum(list_transform(range(1, len($a)+1), i -> $a[CAST(i AS INT)]*$a[CAST(i AS INT)]))) *
        sqrt(list_sum(list_transform(range(1, len($b)+1), i -> $b[CAST(i AS INT)]*$b[CAST(i AS INT)])))))"""

  /** The connected-components CTE chain over the verified pair set —
    * pairs/edges/reach plus the `cl(doc_id, cluster_id)` min-label table.
    * ONE definition shared by every cluster-consuming oracle (dd05, dd14,
    * dd15, pl03): a change to the cluster semantics cannot silently
    * diverge one oracle from the Spark hybrid path. Interpolate after
    * `WITH RECURSIVE`. */
  private def ccCtesSql: String = s"""pairs AS MATERIALIZED (${pairsSubquerySql}),
      edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION ALL SELECT doc_b, doc_a FROM pairs),
      reach(n, m) AS (
        SELECT a, a FROM (SELECT a FROM edges UNION SELECT b FROM edges) t(a)
        UNION
        SELECT e.b, r.m FROM reach r JOIN edges e ON e.a = r.n
      ),
      cl AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n)"""

  /** The verified near-dup pair set as a subquery (shared by the cluster
    * and dedup-apply oracles).
    *
    * Token-join form: `|A ∩ B|` is computed as `count(*)` over an equi-join
    * of the distinct-shingle streams — arithmetic identical to the old
    * per-pair `len(list_intersect(a.s, b.s))` (same integer intersection,
    * same double division), but DuckDB evaluates it in Σ df(tok)² work
    * instead of n²·|s| list intersections: ~0.7 s vs ~22 s at sf0.01.
    * The old brute-force form re-paid by ~10 oracles blew the driver's
    * comparator budget in round 6 (VERDICT r6 "What's wrong" #1). */
  private val pairsSubquerySql: String = """
      WITH psh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text)-3, 2)),
                   i -> substr(text, CAST(i AS INT), 5))) AS s FROM documents),
      ptok AS (SELECT doc_id, unnest(s) AS tok FROM psh),
      pix AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ix
              FROM ptok a JOIN ptok b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
      plen AS (SELECT doc_id, len(s) AS n FROM psh)
      SELECT doc_a, doc_b FROM pix i
      JOIN plen la ON la.doc_id = i.doc_a JOIN plen lb ON lb.doc_id = i.doc_b
      WHERE CAST(ix AS DOUBLE) / (la.n + lb.n - ix) >= 0.8"""

  /** Shared oracle for dd02 (brute force) and dd03 (MinHash-LSH + exact
    * verification — same output by construction at this banding). Same
    * token-join intersection count as [[pairsSubquerySql]]; the emitted
    * `jaccard` double is the identical division on identical integers. */
  private val ngramJaccardSql: String = """
      WITH psh AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(length(text)-3, 2)),
                   i -> substr(text, CAST(i AS INT), 5))) AS s FROM documents),
      ptok AS (SELECT doc_id, unnest(s) AS tok FROM psh),
      pix AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ix
              FROM ptok a JOIN ptok b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
      plen AS (SELECT doc_id, len(s) AS n FROM psh)
      SELECT doc_a, doc_b,
             CAST(ix AS DOUBLE) / (la.n + lb.n - ix) AS jaccard
      FROM pix i
      JOIN plen la ON la.doc_id = i.doc_a JOIN plen lb ON lb.doc_id = i.doc_b
      WHERE CAST(ix AS DOUBLE) / (la.n + lb.n - ix) >= 0.8
      ORDER BY doc_a, doc_b"""
}
