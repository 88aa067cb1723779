package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Analytics, Events, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is one line of SURVEY.md §2's capability
  * inventory; keys with a DuckDB-expressible equivalent also appear in
  * [[oracleSql]] (column names aliased identically on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational core
    "q1_pricing_summary"   -> (Relational.q1PricingSummary _),
    "q2_top_customers"     -> (Relational.q2TopCustomers _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q4_order_priority"    -> (Relational.q4OrderPriority _),
    "q5_local_supplier"    -> (Relational.q5LocalSupplier _),
    "q_lead_gap"           -> (Relational.qLeadGap _),
    "q8_market_share"      -> (Relational.q8MarketShare _),
    "q_percent_rank"       -> (Relational.qPercentRank _),
    "q_window_running"     -> (Relational.qWindowRunning _),
    "q_rollup"             -> (Relational.qRollup _),
    "q_cube"               -> (Relational.qCube _),
    "q_semi_join"          -> (Relational.qSemiJoin _),
    "q_anti_join"          -> (Relational.qAntiJoin _),
    "q_distinct"           -> (Relational.qDistinct _),
    "q_approx_distinct"    -> (Relational.qApproxDistinct _),
    "q_asof_join"          -> (Relational.qAsofJoin _),
    "q_asof_native"        -> (Relational.qAsofNative _),
    "q_scd2_lookup"        -> (Relational.qScd2Lookup _),
    "q_skew_join"          -> (Relational.qSkewJoin _),
    "q_upsert_latest"      -> (Relational.qUpsertLatest _),
    "q_scd2_dim"           -> (Relational.qScd2Dim _),
    "q_quantile_buckets"   -> (Relational.qQuantileBuckets _),
    "q_approx_percentile"  -> (Relational.qApproxPercentile _),
    "q_percentiles"        -> (Relational.qPercentiles _),
    "q_setops"             -> (Relational.qSetOps _),
    "q_conditional_agg"    -> (Relational.qConditionalAgg _),
    "q_outer_join"         -> (Relational.qOuterJoin _),
    "q_full_outer"         -> (Relational.qFullOuter _),
    "q_scalar_subquery"    -> (Relational.qScalarSubquery _),
    "q_promo_effect"       -> (Relational.qPromoEffect _),
    "q_having"             -> (Relational.qHaving _),
    "q_except"             -> (Relational.qExcept _),
    "q6_forecast_revenue"  -> (Relational.q6ForecastRevenue _),
    "q7_volume_shipping"   -> (Relational.q7VolumeShipping _),
    "q10_returned_items"   -> (Relational.q10ReturnedItems _),
    "q13_cust_distribution" -> (Relational.q13CustDistribution _),
    "q18_large_orders"     -> (Relational.q18LargeOrders _),
    "q19_disjunctive"      -> (Relational.q19Disjunctive _),
    "q21_blame_supplier"   -> (Relational.q21BlameSupplier _),
    "q22_idle_customers"   -> (Relational.q22IdleCustomers _),
    "q16_supplier_variety" -> (Relational.q16SupplierVariety _),
    "q20_excess_shipments" -> (Relational.q20ExcessShipments _),
    "q9_product_profit"    -> (Relational.q9ProductProfit _),
    "q15_top_supplier"     -> (Relational.q15TopSupplier _),
    "q17_small_quantity"   -> (Relational.q17SmallQuantity _),
    "q_mode"               -> (Relational.qMode _),
    "q11_important_stock"  -> (Relational.q11ImportantStock _),
    "q12_ship_lateness"    -> (Relational.q12ShipLateness _),
    "q_window_range"       -> (Relational.qWindowRange _),
    "q_median_mad"         -> (Relational.qMedianMad _),
    "q_stats"              -> (Analytics.qStats _),
    "q_grouping_sets"      -> (Analytics.qGroupingSets _),
    "q_unpivot"            -> (Analytics.qUnpivot _),
    "q_date_dim"           -> (Analytics.qDateDim _),
    // event-stream surface
    "evt_produce"          -> (Events.evtProduce _),
    "evt_produce_stats"    -> (Events.evtProduceStats _),
    "evt_offsets"          -> (Events.evtOffsets _),
    "evt_consume_batches"  -> (Events.evtConsumeBatches _),
    "evt_multi_topic"      -> (Events.evtMultiTopic _),
    "evt_windowed"         -> (Events.evtWindowed _),
    "evt_sessionize"       -> (Events.evtSessionize _),
    "evt_enrich"           -> (Events.evtEnrich _),
    "evt_session_window"   -> (Events.evtSessionWindow _),
    "evt_sliding"          -> (Events.evtSliding _),
    "evt_pivot"            -> (Events.evtPivot _),
    "evt_json_extract"     -> (Events.evtJsonExtract _),
    "evt_value_buckets"    -> (Analytics.evtValueBuckets _),
    "evt_funnel"           -> (Events.evtFunnel _),
    "evt_retention"        -> (Events.evtRetention _),
    "q_gap_fill"           -> (Analytics.qGapFill _),
    "q_multi_distinct"     -> (Analytics.qMultiDistinct _),
    "q_string_funcs"       -> (Analytics.qStringFuncs _),
    "q_array_funcs"        -> (Analytics.qArrayFuncs _),
    "q_range_join"         -> (Analytics.qRangeJoin _),
    "evt_first_last"       -> (Events.evtFirstLast _),
    "evt_anomaly"          -> (Events.evtAnomaly _),
    "evt_error_routing"    -> (Events.evtErrorRouting _),
    "evt_moving_agg"       -> (Events.evtMovingAgg _),
    "evt_top_types"        -> (Events.evtTopTypes _),
    "evt_attribution"      -> (Events.evtAttribution _),
    "evt_distinct_sliding" -> (Events.evtDistinctSliding _),
    "evt_mv_merge"         -> (Events.evtMvMerge _),
    "evt_transitions"      -> (Events.evtTransitions _),
    "evt_out_of_order"     -> (Events.evtOutOfOrder _),
    "evt_rate_limit"       -> (Events.evtRateLimit _),
    "evt_interarrival"     -> (Events.evtInterarrival _),
    "evt_cdc_apply"        -> (Events.evtCdcApply _),
    "evt_log_integrity"    -> (Events.evtLogIntegrity _),
    "evt_concurrency"      -> (Events.evtConcurrency _),
    // text analysis
    "txt_tokens"           -> (graft.text.TextAnalysis.txtTokens _),
    "txt_quality"          -> (graft.text.TextAnalysis.txtQuality _),
    "txt_langid"           -> (graft.text.TextAnalysis.txtLangId _),
    "txt_term_freq"        -> (graft.text.TextAnalysis.txtTermFreq _),
    "txt_fingerprint"      -> (graft.text.TextAnalysis.txtFingerprint _),
    "txt_bigrams"          -> (Analytics.txtBigrams _),
    "txt_approx_topk"      -> (graft.text.TextAnalysis.txtApproxTopk _),
    "txt_doc_freq"         -> (graft.text.TextAnalysis.txtDocFreq _),
    "txt_contamination"    -> (graft.text.TextAnalysis.txtContamination _),
    "txt_tfidf"            -> (graft.text.TextAnalysis.txtTfidf _),
    "txt_repetition"       -> (graft.text.TextAnalysis.txtRepetition _),
    "txt_pii_scrub"        -> (graft.text.TextAnalysis.txtPiiScrub _),
    "txt_contamination_bloom" -> (graft.text.TextAnalysis.txtContaminationBloom _),
    "txt_length_hist"      -> (Analytics.txtLengthHist _),
    "txt_surprisal"        -> (graft.text.TextAnalysis.txtSurprisal _),
    "txt_bigram_lm"        -> (graft.text.TextAnalysis.txtBigramLm _),
    "txt_bpe_pairs"        -> (graft.text.TextAnalysis.txtBpePairs _),
    "txt_entropy"          -> (graft.text.TextAnalysis.txtEntropy _),
    "txt_gopher_rules"     -> (graft.text.TextAnalysis.txtGopherRules _),
    "txt_heaps_law"        -> (graft.text.TextAnalysis.txtHeapsLaw _),
    "txt_zipf"             -> (graft.text.TextAnalysis.txtZipf _),
    "txt_dsir_weights"     -> (graft.text.TextAnalysis.txtDsirWeights _),
    "txt_bpe_train"        -> ((s: SparkSession, d: String) =>
                                 graft.text.TextAnalysis.txtBpeTrain(s, d)),
    "txt_bpe_apply"        -> ((s: SparkSession, d: String) =>
                                 graft.text.TextAnalysis.txtBpeApply(s, d)),
    "txt_ccnet_buckets"    -> (graft.text.TextAnalysis.txtCcnetBuckets _),
    "txt_dup_coverage"     -> (graft.text.TextAnalysis.txtDupCoverage _),
    "txt_classifier"       -> (graft.text.TextAnalysis.txtClassifier _),
    "txt_classifier_train" -> (graft.text.TextAnalysis.txtClassifierTrain _),
    // deduplication
    "dedup_exact"          -> (graft.dedup.Dedup.dedupExact _),
    "dedup_substr"         -> (graft.dedup.Dedup.dedupSubstr _),
    "dedup_cross_source"   -> (graft.dedup.Dedup.dedupCrossSource _),
    "pipeline_decontam"    -> (graft.dedup.Dedup.pipelineDecontam _),
    "dedup_paragraph"      -> (graft.dedup.Dedup.dedupParagraph _),
    "dedup_boilerplate"    -> (graft.dedup.Dedup.dedupBoilerplate _),
    "dedup_semantic"       -> (graft.dedup.Dedup.dedupSemantic _),
    "dedup_ngram"          -> (graft.dedup.Dedup.dedupNgram _),
    "dedup_ngram_slice"    -> (graft.dedup.Dedup.dedupNgramSlice _),
    "dedup_minhash"        -> (graft.dedup.Dedup.dedupMinhash _),
    "dedup_incremental"    -> (graft.dedup.Dedup.dedupIncremental _),
    "dedup_incremental_stored" -> (graft.dedup.Dedup.dedupIncrementalStored _),
    "dedup_simhash"        -> (graft.dedup.Dedup.dedupSimhash _),
    "dedup_components"     -> (graft.dedup.Dedup.dedupComponents _),
    "dedup_keep_one"       -> (graft.dedup.Dedup.dedupKeepOne _),
    "dedup_recall_eval"    -> (graft.dedup.Dedup.dedupRecallEval _),
    "dedup_embed"          -> (graft.dedup.Dedup.dedupEmbed _),
    "dedup_cluster_stats"  -> (Analytics.dedupClusterStats _),
    "pipeline_prep"        -> (Analytics.pipelinePrep _),
    "pipeline_pack"        -> (Analytics.pipelinePack _),
    "pipeline_sample"      -> (Analytics.pipelineSample _),
    "pipeline_dsir_sample" -> (Analytics.pipelineDsirSample _),
    "pipeline_curate"      -> (Analytics.pipelineCurate _),
    "pipeline_split"       -> (Analytics.pipelineSplit _),
    "pipeline_shard"       -> (Analytics.pipelineShard _),
    "pipeline_kanon"       -> (Analytics.pipelineKanon _),
    "pipeline_chunk"       -> (Analytics.pipelineChunk _),
    "pipeline_rag"         -> (graft.similarity.Rag.pipelineRag _),
    "pipeline_expectations" -> (Analytics.pipelineExpectations _),
    "pipeline_cap"         -> (Analytics.pipelineCap _),
    "pipeline_zorder"      -> (graft.operators.Layout.pipelineZorder _),
    "pipeline_mixture"     -> (graft.operators.Layout.pipelineMixture _),
    "pipeline_shuffle"     -> (Analytics.pipelineShuffle _),
    "pipeline_curriculum"  -> (Analytics.pipelineCurriculum _),
    "pipeline_fixed_sample" -> (Analytics.pipelineFixedSample _),
    // similarity search
    "sim_brute_topk"       -> ((s: SparkSession, d: String) =>
                                 graft.similarity.Similarity.simBruteTopk(s, d)),
    "sim_lsh_ann"          -> ((s: SparkSession, d: String) =>
                                 graft.similarity.Similarity.simLshAnn(s, d)),
    "sim_ivf_ann"          -> ((s: SparkSession, d: String) =>
                                 graft.similarity.Similarity.simIvfAnn(s, d)),
    "sim_centroids"        -> (graft.similarity.Similarity.simCentroids _),
    "sim_index_profile"    -> (graft.similarity.Similarity.simIndexProfile _),
    "sim_pq_ann"           -> ((s: SparkSession, d: String) =>
                                 graft.similarity.Similarity.simPqAnn(s, d)),
    "sim_pq_rerank"        -> ((s: SparkSession, d: String) =>
                                 graft.similarity.Similarity.simPqRerank(s, d)),
    "sim_ivfpq_ann"        -> ((s: SparkSession, d: String) =>
                                 graft.similarity.Similarity.simIvfPqAnn(s, d)),
    "sim_ivfpq_stored"     -> (graft.similarity.AnnIndex.simIvfPqStored _),
    "sim_sq_ann"           -> ((s: SparkSession, d: String) =>
                                 graft.similarity.Similarity.simSqAnn(s, d)),
    "sim_binary_ann"       -> ((s: SparkSession, d: String) =>
                                 graft.similarity.Similarity.simBinaryAnn(s, d)),
    "sim_matryoshka"       -> ((s: SparkSession, d: String) =>
                                 graft.similarity.Similarity.simMatryoshka(s, d)),
    "sim_ivfsq_ann"        -> ((s: SparkSession, d: String) =>
                                 graft.similarity.Similarity.simIvfSq(s, d)),
    "sim_ivfsq_stored"     -> (graft.similarity.AnnIndex.simIvfSqStored _),
    "sim_filtered_ann"     -> ((s: SparkSession, d: String) =>
                                 graft.similarity.Similarity.simFilteredAnn(s, d)),
    "sim_matryoshka_stored" -> (graft.similarity.AnnIndex.simMatryoshkaStored _),
    "sim_nsw_ann"          -> ((s: SparkSession, d: String) =>
      graft.similarity.Similarity.simNswAnn(s, d)),
    "sim_nsw_stored"       -> (graft.similarity.AnnIndex.simNswStored _),
    "sim_range_search"     -> ((s: SparkSession, d: String) =>
                                 graft.similarity.Similarity.simRangeSearch(s, d)),
    "sim_recall_eval"      -> (graft.similarity.Similarity.simRecallEval _),
    "sim_hybrid_rrf"       -> (graft.similarity.Similarity.simHybridRrf _),
    "sim_mmr_rerank"       -> ((s: SparkSession, d: String) =>
                                 graft.similarity.Similarity.simMmrRerank(s, d)),
    "sim_kmeans"           -> ((s: SparkSession, d: String) =>
                                 graft.similarity.Similarity.simKmeans(s, d)),
    "sim_threshold_sweep"  -> (graft.similarity.Similarity.simThresholdSweep _),
    "sim_knn_graph"        -> (graft.similarity.Similarity.simKnnGraph _),
    "graph_components"     -> (graft.graph.Graph.graphComponents _),
    "graph_triangles"      -> (graft.graph.Graph.graphTriangles _),
    "graph_pagerank"       -> (graft.graph.Graph.graphPagerank _),
    "graph_degree_hist"    -> (graft.graph.Graph.graphDegreeHist _),
    "graph_jaccard"        -> ((s: SparkSession, d: String) =>
                                 graft.graph.Graph.graphJaccard(s, d)),
    "graph_kcore"          -> (graft.graph.Graph.graphKcore _),
    "graph_coreness"       -> (graft.graph.Graph.graphCoreness _),
    "graph_clustco"        -> (graft.graph.Graph.graphClustco _),
    "q_collect_list"       -> (Analytics.qCollectList _),
    // multimodal
    "mm_binary_meta"       -> (graft.multimodal.Multimodal.mmBinaryMeta _),
    "mm_chunk_dedup"       -> (graft.multimodal.Multimodal.mmChunkDedup _),
    "mm_frame_sample"      -> (graft.multimodal.Multimodal.mmFrameSample _),
    "mm_decode_batch"      -> (graft.multimodal.Multimodal.mmDecodeBatch _),
    "mm_phash"             -> (graft.multimodal.Multimodal.mmPerceptualHash _),
    "mm_phash_pairs"       -> (graft.multimodal.Multimodal.mmPhashPairs _),
    "mm_phash_pair_stats"  -> (graft.multimodal.Multimodal.mmPhashPairStats _),
    "mm_phash_clusters"    -> (graft.multimodal.Multimodal.mmPhashClusters _),
    "mm_chunk_refcount"    -> (graft.multimodal.Multimodal.mmChunkRefcount _),
    "mm_blob_pack"         -> (graft.multimodal.Multimodal.mmBlobPack _),
  )

  /** Event-log partition counts interpolated into the six evt_*
    * producer/consumer oracles — the SAME JVM property
    * [[graft.operators.Events.logPartitions]] resolves — the JVM
    * property is the ONLY source on both sides (set
    * `-Dspark.graft.logPartitions=N` via SPARK_GRAFT_JAVA_OPTS);
    * Events.logPartitions fails fast if the key is set via session
    * conf alone, so engine and oracle can never silently diverge.
    */
  private def logP: Int =
    sys.props.getOrElse("spark.graft.logPartitions", "8").toInt
  private def mtP: Int = math.max(1, logP / 2)

  /** DuckDB-equivalent SQL per oracle-checkable query key. */
  def oracleSql: Map[String, String] = oracleSqlBase +
    // the bloom-pruned variant is EXACT by construction (no false
    // negatives; false positives die in the equi-join) — same oracle
    ("txt_contamination_bloom" -> oracleSqlBase("txt_contamination")) +
    // the stored-index query replays the identical IVFADC pipeline
    // from the persisted artifacts (seeded on this corpus), so the
    // recompute oracle is its oracle too
    ("sim_ivfpq_stored" -> oracleSqlBase("sim_ivfpq_ann")) +
    // same contract for the SQ8 stored index vs its recompute twin
    ("sim_ivfsq_stored" -> oracleSqlBase("sim_ivfsq_ann")) +
    // the stored-index increment path computes the identical decision
    // relation (same class collapse, same join) from the persisted
    // corpus index instead of a per-run re-derivation — same oracle
    ("dedup_incremental_stored" -> oracleSqlBase("dedup_incremental")) +
    // keeper selection replays the components closure verbatim, then
    // picks each cluster's longest doc (min doc_id on ties) via a
    // total-order window — the oracle twin of the engine's
    // skew-free max(struct) argmax
    ("dedup_keep_one" ->
      s"""WITH comp AS (${oracleSqlBase("dedup_components")}),
         |j AS (SELECT c.doc_id, c.component, dd.n_chars
         |  FROM comp c JOIN documents dd USING (doc_id))
         |SELECT doc_id, component, keeper_id, doc_id = keeper_id AS keep
         |FROM (SELECT doc_id, component,
         |   first_value(doc_id) OVER (PARTITION BY component
         |     ORDER BY n_chars DESC, doc_id) AS keeper_id
         |  FROM j)""".stripMargin) +
    // and for the prefix-scan strategy over the same stored vectors
    ("sim_matryoshka_stored" -> oracleSqlBase("sim_matryoshka")) +
    // the BPE merge-table replay is one CTE stage per learned merge
    // (mechanical, so it is GENERATED — same technique as the staged
    // IVF+SQ oracle, inlined because the chain is vocabulary-sized)
    ("txt_bpe_train" -> bpeOracleSql(8)) +
    ("txt_bpe_apply" -> bpeApplyOracleSql(8)) +
    ("sim_mmr_rerank" -> mmrOracleSql(10)) +
    // the composed RAG serving path: constituent replays verbatim —
    // chunk+dedup and the IVF+SQ8 chain as parenthesized subqueries
    // (the sim_recall_eval technique), the hybrid lexical CTEs and
    // integer RRF fusion inline, one generated MATERIALIZED stage per
    // MMR round (the mmrOracleSql technique), contexts joined last
    ("pipeline_rag" -> ragOracleSql(8, 5)) +
    ("graph_coreness" -> corenessOracleSql) +
    // the NSW traversal replays as one generated MATERIALIZED CTE
    // stage per hop (the coreness/BPE technique); the stored twin
    // answers from artifacts seeded on the same corpus, so the
    // recompute oracle is its oracle too
    ("sim_nsw_ann" -> nswOracleSql(48, 8)) +
    ("sim_nsw_stored" -> nswOracleSql(48, 8)) +
    // the resampling gate replays the score relation verbatim, then
    // one hash coin per doc + a |langs|-row aggregate
    ("pipeline_dsir_sample" ->
      s"""WITH s AS (SELECT * FROM (${oracleSqlBase("txt_dsir_weights")})),
         |k AS (SELECT lang, n_bigrams, dsir_score_bp,
         |   (md5_number_lower(CAST(doc_id AS VARCHAR))
         |     % 9223372036854775808) % 10000 < dsir_score_bp AS keep
         |  FROM s)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_kept,
         | CAST((count(CASE WHEN keep THEN 1 END) * 10000) // count(*)
         |   AS BIGINT) AS kept_bp,
         | CAST(coalesce(sum(CASE WHEN keep THEN n_bigrams END), 0)
         |   AS BIGINT) AS kept_bigrams,
         | CAST(CASE WHEN count(CASE WHEN keep THEN 1 END) > 0
         |   THEN coalesce(sum(CASE WHEN keep THEN dsir_score_bp END), 0)
         |     // count(CASE WHEN keep THEN 1 END) ELSE 0 END AS BIGINT)
         |   AS mean_kept_score_bp
         |FROM k GROUP BY 1""".stripMargin) +
    // recall@5 composes the constituent replays verbatim as
    // subqueries (DuckDB allows a CTE-bearing SELECT in parentheses)
    ("sim_recall_eval" -> {
      def sub(k: String) =
        "(SELECT query_id, neighbor_id FROM (" + oracleSqlBase(k) + "))"
      s"""WITH b AS ${sub("sim_brute_topk")},
         |q AS (SELECT DISTINCT query_id FROM b),
         |m AS (SELECT 'lsh' AS method, query_id, neighbor_id
         |   FROM ${sub("sim_lsh_ann")}
         | UNION ALL SELECT 'ivf', query_id, neighbor_id
         |   FROM ${sub("sim_ivf_ann")}
         | UNION ALL SELECT 'ivfpq', query_id, neighbor_id
         |   FROM ${sub("sim_ivfpq_ann")}
         | UNION ALL SELECT 'sq8', query_id, neighbor_id
         |   FROM ${sub("sim_sq_ann")}
         | UNION ALL SELECT 'pq', query_id, neighbor_id
         |   FROM ${sub("sim_pq_ann")}
         | UNION ALL SELECT 'pq_rerank', query_id, neighbor_id
         |   FROM ${sub("sim_pq_rerank")}
         | UNION ALL SELECT 'matryoshka', query_id, neighbor_id
         |   FROM ${sub("sim_matryoshka")}
         | UNION ALL SELECT 'binary', query_id, neighbor_id
         |   FROM ${sub("sim_binary_ann")}),
         |h AS (SELECT m.method, m.query_id, count(*) AS hits
         |  FROM m JOIN b USING (query_id, neighbor_id) GROUP BY 1, 2)
         |SELECT q.query_id, mm.method,
         | CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
         | (10000 * CAST(coalesce(h.hits, 0) AS BIGINT)) // 5 AS recall_bp
         |FROM q CROSS JOIN (SELECT DISTINCT method FROM m) mm
         |LEFT JOIN h ON h.query_id = q.query_id AND h.method = mm.method"""
        .stripMargin
    })

  /** The MinHash band-index CTE chain (d → sig → bands, ending with
    * per-doc (band_idx, bh) keys) — the DuckDB replay of
    * [[graft.dedup.Dedup.minhashBands]], shared by every band-index
    * consumer's oracle. Identical text to the dedup_minhash /
    * dedup_incremental oracles' prefixes.
    */
  private def bandsCteSql: String =
    """d AS (SELECT doc_id,
      |   list_distinct(string_split_regex(trim(text), ' +')) AS w
      |  FROM documents),
      |sig AS (SELECT doc_id, list_transform(range(0, 64), i ->
      |   list_min(list_transform(w, t ->
      |     CAST(xor(md5_number_lower(t),
      |       CASE WHEN i = 0 THEN md5_number_upper(t)
      |       ELSE CAST(((CAST(md5_number_upper(t) AS HUGEINT)
      |              * CAST(power(2, i) AS HUGEINT))
      |             % 18446744073709551616)
      |           + CAST(md5_number_upper(t) >> CAST(64 - i AS INT)
      |               AS HUGEINT) AS UBIGINT)
      |       END) % 9223372036854775808 AS BIGINT))))
      |   AS s
      |  FROM d),
      |bands AS (SELECT doc_id, CAST(b AS INT) AS band_idx,
      |   md5_number_lower(array_to_string(
      |     list_slice(s, CAST(b*8+1 AS INT), CAST(b*8+8 AS INT)), ','))
      |   AS bh
      |  FROM sig CROSS JOIN range(0, 8) t(b))""".stripMargin

  /** The [[graft.text.TextAnalysis.txtBpeTrain]] replay: word-type
    * frequencies once, then one generated CTE stage per merge round —
    * top pair by (count desc, pair lexicographic), merge via the same
    * island-parity rule (matches grouped into consecutive runs, merge
    * at odd island rows — left-to-right non-overlap incl. self-pairs),
    * renumber, repeat. The chain is textual but mechanical; every
    * stage is vocabulary-sized.
    */
  private def bpeOracleSql(rounds: Int): String =
    s"""WITH ${bpeChainSql(rounds)}
       |${(1 to rounds).map { k =>
            s"""SELECT $k AS "round", a AS lhs, b AS rhs, a || b AS merged,
               | CAST(cnt AS BIGINT) AS pair_count FROM t$k""".stripMargin
          }.mkString("\nUNION ALL ")}""".stripMargin

  /** [[graft.text.TextAnalysis.txtBpeApply]]'s replay: the same
    * chain, then the final state's per-word token counts broadcast
    * back onto one corpus word pass.
    */
  private def bpeApplyOracleSql(rounds: Int): String =
    s"""WITH ${bpeChainSql(rounds)},
       |vt AS (SELECT word, count(*) AS n_tok,
       |   max(length(word)) AS wlen FROM s$rounds GROUP BY 1),
       |dw AS (SELECT doc_id, unnest(string_split_regex(trim(text),
       |   ' +')) AS word FROM documents)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       | CAST(sum(wlen) AS BIGINT) AS n_chars,
       | CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens,
       | CAST((sum(wlen) * 10000) // sum(n_tok) AS BIGINT)
       |   AS compression_bp
       |FROM dw JOIN vt USING (word) GROUP BY 1""".stripMargin

  /** [[graft.similarity.Similarity.simMmrRerank]]'s replay: exact
    * top-20 candidates + their pairwise cosines, then one generated
    * stage per greedy round — the same MMR arithmetic tree
    * (`0.7·rel − 0.3·max_sim_to_selected`, ties by doc_id), with the
    * accumulated selection threaded through `acc*` CTEs (the BPE
    * chain technique).
    */
  private def mmrOracleSql(k: Int): String = {
    val stages = (2 to k).map { i =>
      s"""sel$i AS MATERIALIZED (SELECT query_id, doc_id, $i AS mmr_rank,
         |   score AS mmr_score FROM (
         |   SELECT query_id, doc_id, score, row_number() OVER (
         |     PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
         |   FROM (SELECT c.query_id, c.doc_id,
         |      0.7 * c.rel - 0.3 * max(p.sim) AS score
         |     FROM cv c
         |     JOIN pr p ON p.query_id = c.query_id AND p.a = c.doc_id
         |     JOIN acc${i - 1} s ON s.query_id = p.query_id
         |       AND s.doc_id = p.b
         |     WHERE NOT EXISTS (SELECT 1 FROM acc${i - 1} x
         |       WHERE x.query_id = c.query_id AND x.doc_id = c.doc_id)
         |     GROUP BY c.query_id, c.doc_id, c.rel))
         |  WHERE rn = 1),
         |acc$i AS MATERIALIZED (SELECT * FROM acc${i - 1}
         |  UNION ALL SELECT * FROM sel$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e
       |  WHERE vec_id < 10),
       |cand AS (SELECT query_id, doc_id, rel FROM (
       |   SELECT q.query_id, e.vec_id AS doc_id,
       |     list_cosine_similarity(q.qv, e.v) AS rel,
       |     row_number() OVER (PARTITION BY q.query_id
       |       ORDER BY list_cosine_similarity(q.qv, e.v) DESC,
       |                e.vec_id) AS rn
       |   FROM q JOIN e ON q.query_id != e.vec_id) WHERE rn <= 20),
       |cv AS MATERIALIZED (SELECT c.query_id, c.doc_id, c.rel, e.v
       |  FROM cand c JOIN e ON e.vec_id = c.doc_id),
       |pr AS MATERIALIZED (SELECT x.query_id, x.doc_id AS a, y.doc_id AS b,
       |    list_cosine_similarity(x.v, y.v) AS sim
       |  FROM cv x JOIN cv y ON x.query_id = y.query_id
       |    AND x.doc_id != y.doc_id),
       |acc1 AS MATERIALIZED (SELECT query_id, doc_id, 1 AS mmr_rank,
       |   rel AS mmr_score
       |  FROM (SELECT query_id, doc_id, rel, row_number() OVER (
       |    PARTITION BY query_id ORDER BY rel DESC, doc_id) AS rn
       |   FROM cv)
       |  WHERE rn = 1),
       |$stages
       |SELECT query_id, doc_id, CAST(mmr_rank AS INT) AS mmr_rank,
       | round(mmr_score, 4) AS mmr_score FROM acc$k""".stripMargin
  }

  /** [[graft.similarity.Rag.pipelineRag]]'s replay: deduped chunks
    * and the stored-index vector arm reuse their standalone oracles
    * as parenthesized subqueries (the stored SQ index replays
    * identically to its recompute twin, so the sim_ivfsq_ann chain IS
    * the vector-arm oracle); the lexical arm and RRF fusion are the
    * sim_hybrid_rrf CTEs with the fused pool cut at `pool`; the MMR
    * rounds are generated MATERIALIZED stages over the pool.
    */
  private def ragOracleSql(pool: Int, k: Int): String = {
    val stages = (2 to k).map { i =>
      s"""rsel$i AS MATERIALIZED (SELECT query_id, doc_id, $i AS mmr_rank
         |  FROM (
         |   SELECT query_id, doc_id, row_number() OVER (
         |     PARTITION BY query_id ORDER BY score DESC, doc_id) AS rn
         |   FROM (SELECT c.query_id, c.doc_id,
         |      0.7 * c.rel - 0.3 * max(p.sim) AS score
         |     FROM cvr c
         |     JOIN prr p ON p.query_id = c.query_id AND p.a = c.doc_id
         |     JOIN racc${i - 1} s ON s.query_id = p.query_id
         |       AND s.doc_id = p.b
         |     WHERE NOT EXISTS (SELECT 1 FROM racc${i - 1} x
         |       WHERE x.query_id = c.query_id AND x.doc_id = c.doc_id)
         |     GROUP BY c.query_id, c.doc_id, c.rel))
         |  WHERE rn = 1),
         |racc$i AS MATERIALIZED (SELECT * FROM racc${i - 1}
         |  UNION ALL SELECT * FROM rsel$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH ch AS (SELECT doc_id, chunk_idx, n_toks, chunk_hash FROM (
       |   SELECT *, row_number() OVER (PARTITION BY chunk_hash
       |     ORDER BY doc_id, chunk_idx) AS rn
       |   FROM (${oracleSqlBase("pipeline_chunk")})) WHERE rn = 1),
       |vecr AS MATERIALIZED (SELECT query_id, neighbor_id AS doc_id,
       |   rank AS vec_rank
       |  FROM (${oracleSqlBase("sim_ivfsq_ann")})),
       |tok AS (SELECT doc_id,
       |   unnest(string_split_regex(trim(text), ' +')) AS w
       |  FROM documents),
       |tf AS (SELECT doc_id,
       |   CAST(md5_number_lower(w) % 9223372036854775808 AS BIGINT) AS h,
       |   count(*) AS tf FROM tok GROUP BY 1, 2),
       |nn AS (SELECT count(*) AS n FROM documents),
       |idf AS (SELECT h,
       |   CAST(((n - df + 1) * 10000) // (df + 1) AS BIGINT) AS idf_bp
       |  FROM (SELECT h, count(*) AS df FROM tf GROUP BY 1) CROSS JOIN nn
       |  WHERE df <= 65536),
       |qs AS (SELECT query_id, h, tfq, idf_bp FROM (
       |   SELECT t.doc_id AS query_id, t.h, t.tf AS tfq, i.idf_bp,
       |     row_number() OVER (PARTITION BY t.doc_id
       |       ORDER BY i.idf_bp DESC, t.h) AS r
       |   FROM tf t JOIN idf i USING (h) WHERE t.doc_id < 10)
       |  WHERE r <= 20),
       |lex AS (SELECT q.query_id, t.doc_id,
       |   CAST(sum(least(q.tfq, t.tf) * q.idf_bp) AS BIGINT) AS score
       |  FROM qs q JOIN tf t USING (h) WHERE t.doc_id != q.query_id
       |  GROUP BY 1, 2),
       |lexr AS (SELECT query_id, doc_id, lex_rank FROM (
       |   SELECT query_id, doc_id,
       |     CAST(row_number() OVER (PARTITION BY query_id
       |       ORDER BY score DESC, doc_id) AS INT) AS lex_rank FROM lex)
       |  WHERE lex_rank <= 20),
       |fu AS (SELECT query_id, doc_id FROM (
       |   SELECT *, row_number() OVER (PARTITION BY query_id
       |     ORDER BY rrf_e6 DESC, doc_id) AS rank
       |   FROM (SELECT coalesce(l.query_id, v.query_id) AS query_id,
       |      coalesce(l.doc_id, v.doc_id) AS doc_id,
       |      CAST(coalesce(1000000 // (60 + l.lex_rank), 0)
       |         + coalesce(1000000 // (60 + v.vec_rank), 0) AS BIGINT)
       |        AS rrf_e6
       |     FROM lexr l FULL JOIN vecr v
       |       ON l.query_id = v.query_id AND l.doc_id = v.doc_id))
       |  WHERE rank <= $pool),
       |ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |cvr AS MATERIALIZED (SELECT f.query_id, f.doc_id,
       |   list_cosine_similarity(qe.v, de.v) AS rel, de.v
       |  FROM fu f JOIN ev qe ON qe.vec_id = f.query_id
       |  JOIN ev de ON de.vec_id = f.doc_id),
       |prr AS MATERIALIZED (SELECT x.query_id, x.doc_id AS a,
       |    y.doc_id AS b, list_cosine_similarity(x.v, y.v) AS sim
       |  FROM cvr x JOIN cvr y ON x.query_id = y.query_id
       |    AND x.doc_id != y.doc_id),
       |racc1 AS MATERIALIZED (SELECT query_id, doc_id, 1 AS mmr_rank
       |  FROM (SELECT query_id, doc_id, row_number() OVER (
       |    PARTITION BY query_id ORDER BY rel DESC, doc_id) AS rn
       |   FROM cvr)
       |  WHERE rn = 1),
       |$stages
       |SELECT a.query_id, CAST(a.mmr_rank AS INT) AS mmr_rank, a.doc_id,
       | ch.chunk_idx, ch.n_toks, ch.chunk_hash
       |FROM racc$k a JOIN ch USING (doc_id)""".stripMargin
  }

  private def bpeChainSql(rounds: Int): String = {
    val stages = (1 to rounds).map { k =>
      s"""t$k AS MATERIALIZED (SELECT a, b, cnt FROM (
         |   SELECT sym AS a, b, sum(freq) AS cnt FROM (
         |     SELECT sym, lead(sym) OVER (PARTITION BY word ORDER BY pos)
         |       AS b, freq FROM s${k - 1})
         |   WHERE b IS NOT NULL GROUP BY 1, 2)
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |g$k AS (SELECT word, freq, pos, sym, nxt,
         |   CASE WHEN m THEN row_number() OVER (PARTITION BY word, isl
         |     ORDER BY pos) % 2 = 1 ELSE false END AS ms
         |  FROM (SELECT *, CASE WHEN m THEN pos - row_number()
         |     OVER (PARTITION BY word, m ORDER BY pos) END AS isl
         |   FROM (SELECT s.word, s.freq, s.pos, s.sym,
         |      lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos)
         |        AS nxt,
         |      (s.sym = t.a AND lead(s.sym) OVER (PARTITION BY s.word
         |        ORDER BY s.pos) = t.b) AS m
         |     FROM s${k - 1} s CROSS JOIN t$k t))),
         |s$k AS MATERIALIZED (SELECT word, freq,
         |   CAST(row_number() OVER (PARTITION BY word ORDER BY pos)
         |     AS INT) AS pos,
         |   CASE WHEN ms THEN sym || nxt ELSE sym END AS sym
         |  FROM (SELECT *, coalesce(lag(ms) OVER (PARTITION BY word
         |     ORDER BY pos), false) AS consumed FROM g$k)
         |  WHERE NOT consumed)""".stripMargin
    }.mkString(",\n")
    s"""tok AS (SELECT unnest(string_split_regex(trim(text), ' +'))
       |   AS word FROM documents),
       |wf AS (SELECT word, count(*) AS freq FROM tok GROUP BY 1),
       |s0 AS MATERIALIZED (SELECT word, freq, CAST(u AS INT) AS pos,
       |   substr(word, CAST(u AS INT), 1) AS sym
       |  FROM (SELECT word, freq, unnest(range(1, length(word) + 1))
       |     AS u FROM wf)),
       |$stages""".stripMargin
  }

  /** [[graft.similarity.Similarity.simNswAnn]]'s replay: the directed
    * per-cell kNN graph, deterministic per-cell entry points (min
    * 63-bit md5 of the id), then one MATERIALIZED beam stage per hop —
    * expand along edges, score only the unseen candidates, keep the
    * best `w` per query by (cos DESC, vec_id) — exactly the engine's
    * fixed-hop loop.
    */
  private def nswOracleSql(w: Int, hops: Int): String = {
    val hopStages = (1 to hops).map { h =>
      val prev = s"b${h - 1}"
      s"""f$h AS (SELECT DISTINCT b.query_id, k.neighbor_id AS vec_id
         |  FROM $prev b JOIN und k ON b.vec_id = k.vec_id),
         |n$h AS (SELECT f.query_id, f.vec_id FROM f$h f
         |  LEFT JOIN $prev b
         |    ON f.query_id = b.query_id AND f.vec_id = b.vec_id
         |  WHERE b.vec_id IS NULL),
         |s$h AS (SELECT n.query_id, n.vec_id,
         |   list_cosine_similarity(q.qv, e.v) AS cos
         |  FROM n$h n JOIN e ON n.vec_id = e.vec_id
         |  JOIN q ON n.query_id = q.query_id
         |  WHERE n.query_id != n.vec_id),
         |b$h AS MATERIALIZED (SELECT query_id, vec_id, cos FROM (
         |   SELECT *, row_number() OVER (PARTITION BY query_id
         |     ORDER BY cos DESC, vec_id) AS rn
         |   FROM (SELECT * FROM $prev UNION ALL SELECT * FROM s$h))
         |  WHERE rn <= $w)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |knn AS MATERIALIZED (SELECT vec_id, neighbor_id FROM (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id,
       |   row_number() OVER (PARTITION BY a.vec_id
       |     ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id)
       |    AS rank
       |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id != b.vec_id)
       | WHERE rank <= 5),
       |hh AS (SELECT label, vec_id,
       |   md5_number_lower(CAST(vec_id AS VARCHAR))
       |     % 9223372036854775808 AS h FROM e),
       |ring AS (SELECT vec_id, n1, n2 FROM (
       |  SELECT vec_id,
       |   lead(vec_id, 1) OVER (PARTITION BY label ORDER BY h, vec_id)
       |     AS n1,
       |   lead(vec_id, 2) OVER (PARTITION BY label ORDER BY h, vec_id)
       |     AS n2
       |  FROM hh)),
       |und AS MATERIALIZED (
       |  SELECT vec_id, neighbor_id FROM knn
       |  UNION SELECT neighbor_id, vec_id FROM knn
       |  UNION SELECT vec_id, n1 FROM ring WHERE n1 IS NOT NULL
       |  UNION SELECT n1, vec_id FROM ring WHERE n1 IS NOT NULL
       |  UNION SELECT vec_id, n2 FROM ring WHERE n2 IS NOT NULL
       |  UNION SELECT n2, vec_id FROM ring WHERE n2 IS NOT NULL),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
       |ent AS MATERIALIZED (SELECT vec_id FROM (
       |  SELECT vec_id, row_number() OVER (PARTITION BY label
       |    ORDER BY h, vec_id) AS rn
       |  FROM hh) WHERE rn <= 4),
       |b0 AS MATERIALIZED (SELECT query_id, vec_id, cos FROM (
       |  SELECT q.query_id, n.vec_id,
       |   list_cosine_similarity(q.qv, n.v) AS cos,
       |   row_number() OVER (PARTITION BY q.query_id
       |     ORDER BY list_cosine_similarity(q.qv, n.v) DESC, n.vec_id)
       |     AS rn
       |  FROM q CROSS JOIN
       |   (SELECT e.vec_id, e.v FROM ent JOIN e USING (vec_id)) n
       |  WHERE q.query_id != n.vec_id) WHERE rn <= $w),
       |$hopStages
       |SELECT query_id, vec_id AS neighbor_id, CAST(rn AS INT) AS rank,
       | round(cos, 4) AS cosine
       |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |   ORDER BY cos DESC, vec_id) AS rn FROM b$hops)
       |WHERE rn <= 10""".stripMargin
  }

  /** The mutual-kNN edge prefix (exact per-cell top-5 cosine
    * neighbors → mutual restriction → symmetric s0 edges) shared by
    * the graph_kcore and graph_coreness oracle chains.
    */
  private def mutualKnnPrefixSql: String =
    """e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |knn AS MATERIALIZED (SELECT vec_id, neighbor_id FROM (
      |  SELECT a.vec_id, b.vec_id AS neighbor_id,
      |   row_number() OVER (PARTITION BY a.vec_id
      |     ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id)
      |    AS rank
      |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id != b.vec_id)
      | WHERE rank <= 5),
      |s0 AS MATERIALIZED (SELECT k.vec_id AS a, k.neighbor_id AS b
      |  FROM knn k JOIN knn r
      |    ON k.vec_id = r.neighbor_id AND k.neighbor_id = r.vec_id)"""
      .stripMargin

  /** [[graft.graph.Graph.graphCoreness]]'s replay: the shared
    * mutual-kNN prefix, then NESTED peel phases k = 2..5 — each
    * phase's 30 generated MATERIALIZED rounds start from the
    * previous phase's fixpoint (cores nest), exactly the engine's
    * loop; phase 1 is the identity (every live-edge endpoint has
    * degree ≥ 1). coreness(v) = the largest phase v survives.
    */
  private def corenessOracleSql: String = {
    val phases = (2 to 5).map { kk =>
      val prev0 = if (kk == 2) "s0" else s"f${kk - 1}"
      val rounds = (1 to 30).map { r =>
        val prev = if (r == 1) prev0 else s"p${kk}_${r - 1}"
        s"""r${kk}_$r AS MATERIALIZED (SELECT a FROM $prev
           |  GROUP BY a HAVING count(*) >= $kk),
           |p${kk}_$r AS MATERIALIZED (SELECT s.a, s.b FROM $prev s
           |  JOIN r${kk}_$r x ON s.a = x.a
           |  JOIN r${kk}_$r y ON s.b = y.a)""".stripMargin
      }.mkString(",\n")
      s"""$rounds,
         |f$kk AS MATERIALIZED (SELECT a, b FROM p${kk}_30)""".stripMargin
    }.mkString(",\n")
    val memb = (2 to 5).map { kk =>
      s"SELECT DISTINCT a, $kk AS kk FROM f$kk"
    }.mkString("\n UNION ALL ")
    s"""WITH $mutualKnnPrefixSql,
       |$phases,
       |m AS (SELECT DISTINCT a, 1 AS kk FROM s0
       | UNION ALL $memb),
       |c AS (SELECT a AS vec_id, max(kk) AS coreness FROM m GROUP BY 1)
       |SELECT CAST(coalesce(c.coreness, 0) AS BIGINT) AS coreness,
       | CAST(count(*) AS BIGINT) AS n_vectors
       |FROM e LEFT JOIN c USING (vec_id) GROUP BY 1""".stripMargin
  }

  private def oracleSqlBase: Map[String, String] = Map(
    "dedup_cross_source" ->
      s"""WITH $bandsCteSql,
        |bs AS (SELECT b.band_idx, b.bh, doc.source, count(*) AS n
        |  FROM bands b JOIN documents doc USING (doc_id)
        |  GROUP BY 1, 2, 3),
        |x AS (SELECT a.source AS source_a, b.source AS source_b,
        |   CASE WHEN a.source = b.source THEN a.n * (a.n - 1) // 2
        |        ELSE a.n * b.n END AS mass
        |  FROM bs a JOIN bs b
        |    ON a.band_idx = b.band_idx AND a.bh = b.bh
        |  WHERE a.source <= b.source)
        |SELECT source_a, source_b, count(*) AS n_shared_buckets,
        | CAST(sum(mass) AS BIGINT) AS candidate_mass
        |FROM x WHERE mass > 0 GROUP BY 1, 2""".stripMargin,
    "pipeline_decontam" ->
      s"""WITH $bandsCteSql,
        |sp AS (SELECT doc_id, source,
        |   CASE WHEN (md5_number_lower(CAST(doc_id AS VARCHAR))
        |       % 9223372036854775808) % 10000 < 9000 THEN 'train'
        |     WHEN (md5_number_lower(CAST(doc_id AS VARCHAR))
        |       % 9223372036854775808) % 10000 < 9500 THEN 'val'
        |     ELSE 'test' END AS split
        |  FROM documents),
        |tk AS (SELECT DISTINCT b.band_idx, b.bh
        |  FROM bands b JOIN sp USING (doc_id) WHERE sp.split = 'test'),
        |lk AS (SELECT DISTINCT b.doc_id, sp.source
        |  FROM bands b JOIN sp USING (doc_id)
        |  JOIN tk ON tk.band_idx = b.band_idx AND tk.bh = b.bh
        |  WHERE sp.split = 'train'),
        |l AS (SELECT source, count(*) AS n_leaked FROM lk GROUP BY 1),
        |t AS (SELECT source, count(*) AS n_train FROM sp
        |  WHERE split = 'train' GROUP BY 1)
        |SELECT t.source, t.n_train,
        | coalesce(l.n_leaked, 0) AS n_leaked,
        | coalesce(l.n_leaked, 0) * 10000 // t.n_train AS leaked_bp
        |FROM t LEFT JOIN l USING (source)""".stripMargin,
    "graph_degree_hist" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS a, b.vec_id AS b
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.35),
        |s AS (SELECT a FROM p UNION ALL SELECT b FROM p),
        |c AS (SELECT a AS vec_id, count(*) AS degree FROM s GROUP BY 1),
        |dd AS (SELECT v.vec_id, coalesce(c.degree, 0) AS degree
        |  FROM embeddings v LEFT JOIN c USING (vec_id))
        |SELECT degree, count(*) AS n_nodes FROM dd GROUP BY 1""".stripMargin,
    "dedup_paragraph" ->
      """WITH w AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
        |  FROM documents),
        |b AS (SELECT doc_id, t.bi AS bi,
        |   CAST(md5_number_lower(array_to_string(list_slice(ws,
        |     CAST(t.bi*10+1 AS INT), CAST(t.bi*10+10 AS INT)), ' '))
        |     % 9223372036854775808 AS BIGINT) AS h
        |  FROM w, LATERAL unnest(range(len(ws)//10)) AS t(bi)
        |  WHERE len(ws) >= 10),
        |r AS (SELECT doc_id, bi, h,
        |   row_number() OVER (PARTITION BY h ORDER BY doc_id, bi) AS rn
        |  FROM b),
        |agg AS (SELECT doc_id, count(*) AS n_blocks,
        |   count(CASE WHEN rn > 1 THEN 1 END) AS removed_blocks
        |  FROM r GROUP BY 1)
        |SELECT d.doc_id,
        | coalesce(agg.n_blocks, 0) AS n_blocks,
        | coalesce(agg.removed_blocks, 0) AS removed_blocks,
        | CASE WHEN coalesce(agg.n_blocks, 0) = 0 THEN 0
        |   ELSE (10000 * agg.removed_blocks) // agg.n_blocks END AS removed_bp
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin,
    "dedup_boilerplate" ->
      """WITH w AS (SELECT source, doc_id,
        |   string_split_regex(trim(text), ' +') AS ws FROM documents),
        |b AS (SELECT source, doc_id,
        |   CAST(md5_number_lower(array_to_string(list_slice(ws,
        |     CAST(t.bi*10+1 AS INT), CAST(t.bi*10+10 AS INT)), ' '))
        |     % 9223372036854775808 AS BIGINT) AS h
        |  FROM w, LATERAL unnest(range(len(ws)//10)) AS t(bi)
        |  WHERE len(ws) >= 10),
        |nd AS (SELECT h, count(DISTINCT doc_id) AS n_docs FROM b GROUP BY 1),
        |hs AS (SELECT h, source, count(*) AS cnt FROM b GROUP BY 1, 2),
        |a AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS total_blocks,
        |   CAST(sum(CASE WHEN n_docs >= 5 THEN cnt ELSE 0 END) AS BIGINT)
        |     AS bp_blocks
        |  FROM hs JOIN nd USING (h) GROUP BY 1)
        |SELECT source, total_blocks, bp_blocks,
        | CAST((10000 * bp_blocks) // total_blocks AS BIGINT) AS bp_share_bp
        |FROM a""".stripMargin,
    "pipeline_cap" ->
      """WITH d AS (SELECT doc_id, source,
        |   CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
        |     AS n_tokens,
        |   CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
        |     % 9223372036854775808 AS BIGINT) AS h
        |  FROM documents),
        |c AS (SELECT *, coalesce(sum(n_tokens) OVER (
        |   PARTITION BY source ORDER BY h, doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS cum_before FROM d)
        |SELECT doc_id, source, n_tokens,
        | CAST(cum_before AS BIGINT) AS cum_before,
        | cum_before + n_tokens <= 800 AS admitted
        |FROM c""".stripMargin,
    "dedup_semantic" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS a, b.vec_id AS b
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.35),
        |m AS (SELECT b AS vec_id, min(a) AS dup_of FROM p GROUP BY 1)
        |SELECT e.vec_id, e.label,
        | CASE WHEN m.dup_of IS NOT NULL THEN 'drop' ELSE 'keep' END AS action,
        | m.dup_of
        |FROM e LEFT JOIN m ON e.vec_id = m.vec_id""".stripMargin,
    "graph_pagerank" -> {
      // 10 integer power-iteration rounds, materialized (recursive
      // CTEs cannot aggregate in the recursive member) — the same
      // codegen-CTE technique as dedup_components' oracle
      val rounds = (1 to 10).map { k =>
        s"""r$k AS MATERIALIZED (SELECT dg.a AS v,
           |  150000000 + (85 * CAST(s.in_sum AS BIGINT)) // 100 AS r
           | FROM dg JOIN (
           |   SELECT e.b AS v, CAST(sum(p.r // d2.deg) AS BIGINT) AS in_sum
           |   FROM sym e JOIN r${k - 1} p ON p.v = e.a
           |   JOIN dg d2 ON d2.a = e.a
           |   GROUP BY e.b) s ON s.v = dg.a)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings),
         |p AS (SELECT a.vec_id AS a, b.vec_id AS b
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.35),
         |sym AS MATERIALIZED (SELECT a, b FROM p
         |  UNION ALL SELECT b AS a, a AS b FROM p),
         |dg AS MATERIALIZED (SELECT a, count(*) AS deg FROM sym GROUP BY 1),
         |r0 AS MATERIALIZED (SELECT a AS v, CAST(1000000000 AS BIGINT) AS r
         |  FROM dg),
         |$rounds
         |SELECT emb.vec_id,
         | coalesce(r10.r, CAST(150000000 AS BIGINT)) AS rank_e9
         |FROM embeddings emb LEFT JOIN r10 ON r10.v = emb.vec_id""".stripMargin
    },
    "sim_kmeans" -> {
      // 3 Lloyd rounds + the final assignment, materialized (the
      // graph_pagerank codegen-CTE recipe). Exact int64 end to end:
      // e6-quantized components keep every squared distance ≤ ~3e14
      // (exactly representable through list_inner_product's doubles),
      // `//` truncates toward zero exactly like Spark's `div`, and
      // ties break to the lowest positional centroid id both sides.
      val assign = (a: String, c: String) =>
        s"""$a AS MATERIALIZED (SELECT vec_id, c, d FROM (
           |  SELECT vec_id, c, d,
           |    row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
           |  FROM (SELECT e.vec_id, cc.c,
           |     CAST(list_inner_product(e.iv, e.iv)
           |       + list_inner_product(cc.iv, cc.iv)
           |       - 2 * list_inner_product(e.iv, cc.iv) AS BIGINT) AS d
           |    FROM e CROSS JOIN $c cc)) WHERE rn = 1)""".stripMargin
      val rounds = (1 to 3).map { i =>
        assign(s"a$i", s"c${i - 1}") + ",\n" +
          s"""m$i AS (SELECT a$i.c, t.i AS dim,
             |   CAST(sum(e.iv[t.i]) AS BIGINT) // count(*) AS m
             |  FROM a$i JOIN e USING (vec_id),
             |   LATERAL unnest(range(1, 65)) AS t(i)
             |  GROUP BY 1, 2),
             |c$i AS MATERIALIZED (SELECT p.c, coalesce(n.iv, p.iv) AS iv
             |  FROM c${i - 1} p LEFT JOIN (SELECT c, list(m ORDER BY dim) AS iv
             |    FROM m$i GROUP BY c) n USING (c))""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS MATERIALIZED (SELECT vec_id,
         |  list_transform(CAST(embedding AS DOUBLE[]),
         |    x -> CAST(round(1000000 * x) AS BIGINT)) AS iv
         |  FROM embeddings),
         |c0 AS MATERIALIZED (SELECT
         |  CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS c, iv
         |  FROM e WHERE vec_id < 8),
         |$rounds,
         |${assign("a4", "c3")}
         |SELECT vec_id, CAST(c AS INT) AS cluster, d AS dist_e12
         |FROM a4""".stripMargin
    },
    "txt_entropy" ->
      """WITH d AS (SELECT doc_id, lang, trim(text) AS t FROM documents),
        |b AS (SELECT doc_id, lang, c.ch AS ch,
        |   length(t) - length(replace(t, c.ch, '')) AS cnt
        |  FROM d, LATERAL unnest(
        |    string_split('abcdefghijklmnopqrstuvwxyz ', '')) AS c(ch)),
        |nz AS (SELECT doc_id, lang, cnt FROM b WHERE cnt > 0),
        |n AS (SELECT doc_id, lang, CAST(sum(cnt) AS BIGINT) AS n_modeled
        |  FROM nz GROUP BY 1, 2)
        |SELECT n.doc_id, n.lang, n.n_modeled,
        | CAST(sum(nz.cnt * CAST(round(10000 *
        |   ln(n.n_modeled::DOUBLE / nz.cnt)) AS BIGINT)) AS BIGINT)
        |   // n.n_modeled AS entropy_e4
        |FROM nz JOIN n USING (doc_id, lang)
        |GROUP BY 1, 2, 3""".stripMargin,
    "txt_heaps_law" ->
      """WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
        |d AS (SELECT doc_id, (doc_id * 10) // (mx + 1) AS bucket,
        |   string_split_regex(trim(text), ' +') AS w
        |  FROM documents, mx),
        |ft AS (SELECT word, min(doc_id) AS first_doc FROM
        |   (SELECT doc_id, unnest(w) AS word FROM d) GROUP BY word),
        |nt AS (SELECT (first_doc * 10) // (mx + 1) AS bucket,
        |   count(*) AS new_types FROM ft, mx GROUP BY 1),
        |db AS (SELECT bucket, count(*) AS n_docs,
        |   CAST(sum(len(w)) AS BIGINT) AS n_tokens FROM d GROUP BY 1)
        |SELECT db.bucket, n_docs, n_tokens,
        | coalesce(new_types, 0) AS new_types,
        | CAST(sum(coalesce(new_types, 0)) OVER (ORDER BY db.bucket
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS cum_types
        |FROM db LEFT JOIN nt ON db.bucket = nt.bucket""".stripMargin,
    "txt_zipf" ->
      """WITH w AS (SELECT source, unnest(string_split_regex(trim(text),
        |   ' +')) AS term FROM documents),
        |c AS (SELECT source, term, count(*) AS freq FROM w GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |   ORDER BY freq DESC, term) AS rank FROM c),
        |p AS (SELECT source,
        |   CAST(round(ln(rank)*1000) AS BIGINT) AS x,
        |   CAST(round(ln(freq)*1000) AS BIGINT) AS y
        |  FROM r WHERE rank <= 512),
        |a AS (SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |   sum(x*y) AS sxy, sum(x*x) AS sxx FROM p GROUP BY 1)
        |SELECT source, CAST(n AS BIGINT) AS n_terms,
        | CAST((10000 * (sx*sy - n*sxy)) // (n*sxx - sx*sx) AS BIGINT)
        |   AS slope_neg_e4
        |FROM a""".stripMargin,
    "txt_dsir_weights" ->
      """WITH w AS (SELECT doc_id, lang,
        |   string_split_regex(trim(text), ' +') AS words FROM documents),
        |b AS (SELECT doc_id, lang,
        |   unnest(list_transform(range(1, len(words)),
        |     i -> words[i] || ' ' || words[i+1])) AS bg FROM w),
        |hb AS (SELECT doc_id, lang,
        |   CAST(md5_number_lower(bg) % 9223372036854775808 AS BIGINT)
        |     % 8192 AS bucket FROM b),
        |m AS (SELECT bucket, count(*) AS c_src,
        |   sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_tgt
        |  FROM hb GROUP BY 1),
        |co AS (SELECT bucket,
        |   CAST(((c_tgt + 1) * 10000) // (c_src + 1) AS BIGINT) AS coef_bp
        |  FROM m),
        |s AS (SELECT doc_id, lang, count(*) AS n_bigrams,
        |   sum(coef_bp) AS score_sum
        |  FROM hb JOIN co USING (bucket) GROUP BY 1, 2)
        |SELECT doc_id, lang, CAST(n_bigrams AS BIGINT) AS n_bigrams,
        | CAST(score_sum // n_bigrams AS BIGINT) AS dsir_score_bp
        |FROM s""".stripMargin,
    "txt_gopher_rules" ->
      """WITH d AS (SELECT source,
        |   string_split_regex(trim(text), ' +') AS words FROM documents),
        |m AS (SELECT source,
        |   CAST(len(words) AS BIGINT) AS n,
        |   CAST(list_sum(list_transform(words, w -> length(w)))
        |     AS BIGINT) AS wchars,
        |   CAST(len(list_filter(words, w -> regexp_matches(w, '[a-z]')))
        |     AS BIGINT) AS alpha,
        |   CAST(len(list_filter(list_distinct(words),
        |     w -> w IN ('the','a','of','and','to','in','is')))
        |     AS BIGINT) AS stops,
        |   CAST(len(list_distinct(words)) AS BIGINT) AS dist,
        |   CAST(list_max(list_transform(list_distinct(words),
        |     w -> len(list_filter(words, x -> x = w)))) AS BIGINT) AS maxrun
        |  FROM d),
        |f AS (SELECT source,
        |   CAST(n < 50 OR n > 100000 AS BIGINT) AS f1,
        |   CAST(wchars < 3 * n OR wchars > 10 * n AS BIGINT) AS f2,
        |   CAST(5 * alpha < 4 * n AS BIGINT) AS f3,
        |   CAST(stops < 2 AS BIGINT) AS f4,
        |   CAST(10 * dist < 3 * n AS BIGINT) AS f5,
        |   CAST(5 * maxrun > n AS BIGINT) AS f6
        |  FROM m)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(f1) AS BIGINT) AS fail_wordcount,
        | CAST(sum(f2) AS BIGINT) AS fail_meanlen,
        | CAST(sum(f3) AS BIGINT) AS fail_alpha,
        | CAST(sum(f4) AS BIGINT) AS fail_stopword,
        | CAST(sum(f5) AS BIGINT) AS fail_ttr,
        | CAST(sum(f6) AS BIGINT) AS fail_repetition,
        | CAST(sum(CASE WHEN f1+f2+f3+f4+f5+f6 = 0 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS pass_all
        |FROM f GROUP BY source""".stripMargin,
    "txt_surprisal" ->
      """WITH t AS (SELECT doc_id, lang,
        |   unnest(string_split_regex(trim(text), ' +')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, lang, term, count(*) AS tf FROM t GROUP BY 1,2,3),
        |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1),
        |n AS (SELECT count(*) AS total FROM t),
        |s AS (SELECT tf.doc_id, tf.lang, tf.tf,
        |   CAST(round(10000 * ln(n.total::DOUBLE / c.cnt)) AS BIGINT) AS term_e4
        |  FROM tf JOIN c USING(term) CROSS JOIN n)
        |SELECT doc_id, lang,
        | CAST(sum(tf) AS BIGINT) AS n_tokens,
        | CAST(sum(tf * term_e4) AS BIGINT) AS surprisal_e4,
        | CAST(sum(tf * term_e4) AS BIGINT) // CAST(sum(tf) AS BIGINT)
        |   AS mean_surprisal_e4
        |FROM s GROUP BY 1, 2""".stripMargin,
    "txt_bpe_pairs" ->
      """WITH w AS (SELECT lang,
        |   unnest(string_split_regex(trim(text), ' +')) AS word
        |  FROM documents),
        |wc AS (SELECT lang, word, count(*) AS wn FROM w GROUP BY 1, 2),
        |p AS (SELECT lang, wn,
        |   unnest(list_transform(range(1, len(chars)),
        |     i -> chars[i] || chars[i+1])) AS pair
        |  FROM (SELECT lang, wn, string_split(word, '') AS chars
        |        FROM wc)),
        |c AS (SELECT lang, pair, CAST(sum(wn) AS BIGINT) AS n
        |  FROM p GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang
        |   ORDER BY n DESC, pair) AS INT) AS rank FROM c)
        |SELECT lang, pair, n, rank FROM r WHERE rank <= 10""".stripMargin,
    "txt_bigram_lm" ->
      """WITH w AS (SELECT doc_id, lang,
        |   string_split_regex(trim(text), ' +') AS words FROM documents),
        |b AS (SELECT doc_id, lang,
        |   unnest(list_transform(range(1, len(words)), i -> words[i]))
        |     AS w1,
        |   unnest(list_transform(range(1, len(words)),
        |     i -> words[i] || ' ' || words[i+1])) AS bigram
        |  FROM w),
        |hb AS (SELECT doc_id, lang,
        |   CAST(md5_number_lower(w1) % 9223372036854775808 AS BIGINT) AS h1,
        |   CAST(md5_number_lower(bigram) % 9223372036854775808 AS BIGINT)
        |     AS h2
        |  FROM b),
        |tf AS (SELECT doc_id, lang, h1, h2, count(*) AS tf
        |  FROM hb GROUP BY 1, 2, 3, 4),
        |c2 AS (SELECT h2, count(*) AS cnt2 FROM hb GROUP BY 1),
        |c1 AS (SELECT h1, count(*) AS cnt1 FROM hb GROUP BY 1),
        |s AS (SELECT tf.doc_id, tf.lang, tf.tf,
        |   CAST(round(10000 * ln(c1.cnt1::DOUBLE / c2.cnt2)) AS BIGINT)
        |     AS bg_e4
        |  FROM tf JOIN c2 USING(h2) JOIN c1 USING(h1))
        |SELECT doc_id, lang,
        | CAST(sum(tf) AS BIGINT) AS n_bigrams,
        | CAST(sum(tf * bg_e4) AS BIGINT) AS surprisal_e4,
        | CAST(sum(tf * bg_e4) AS BIGINT) // CAST(sum(tf) AS BIGINT)
        |   AS mean_surprisal_e4
        |FROM s GROUP BY 1, 2""".stripMargin,
    "txt_ccnet_buckets" ->
      """WITH w AS (SELECT doc_id, lang,
        |   string_split_regex(trim(text), ' +') AS words FROM documents),
        |b AS (SELECT doc_id, lang,
        |   unnest(list_transform(range(1, len(words)), i -> words[i]))
        |     AS w1,
        |   unnest(list_transform(range(1, len(words)),
        |     i -> words[i] || ' ' || words[i+1])) AS bigram
        |  FROM w),
        |hb AS (SELECT doc_id, lang,
        |   CAST(md5_number_lower(w1) % 9223372036854775808 AS BIGINT) AS h1,
        |   CAST(md5_number_lower(bigram) % 9223372036854775808 AS BIGINT)
        |     AS h2
        |  FROM b),
        |tf AS (SELECT doc_id, lang, h1, h2, count(*) AS tf
        |  FROM hb GROUP BY 1, 2, 3, 4),
        |c2 AS (SELECT h2, count(*) AS cnt2 FROM hb GROUP BY 1),
        |c1 AS (SELECT h1, count(*) AS cnt1 FROM hb GROUP BY 1),
        |s AS (SELECT tf.doc_id, tf.lang, tf.tf,
        |   CAST(round(10000 * ln(c1.cnt1::DOUBLE / c2.cnt2)) AS BIGINT)
        |     AS bg_e4
        |  FROM tf JOIN c2 USING(h2) JOIN c1 USING(h1)),
        |doc AS (SELECT doc_id, lang,
        |   CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |   CAST(sum(tf * bg_e4) AS BIGINT) // CAST(sum(tf) AS BIGINT) AS m
        |  FROM s GROUP BY 1, 2),
        |h AS (SELECT lang, m, CAST(count(*) AS BIGINT) AS c
        |  FROM doc GROUP BY 1, 2),
        |t AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang
        |  FROM doc GROUP BY 1),
        |cu AS (SELECT lang, m, sum(c) OVER (PARTITION BY lang ORDER BY m
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM h),
        |th AS (SELECT cu.lang,
        |   min(CASE WHEN 3*cum >= n_lang THEN m END) AS t33,
        |   min(CASE WHEN 3*cum >= 2*n_lang THEN m END) AS t66
        |  FROM cu JOIN t USING (lang) GROUP BY 1)
        |SELECT d.lang,
        | CASE WHEN d.m <= th.t33 THEN 'head'
        |      WHEN d.m <= th.t66 THEN 'middle' ELSE 'tail' END AS bucket,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(d.n_bigrams) AS BIGINT) AS total_bigrams,
        | min(d.m) AS min_mean_e4, max(d.m) AS max_mean_e4
        |FROM doc d JOIN th USING (lang) GROUP BY 1, 2""".stripMargin,
    "txt_dup_coverage" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text),' +') AS w
        |  FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |   range(0, greatest(len(w)-5,0)+1),
        |   i -> CAST(md5_number_lower(array_to_string(
        |     list_slice(w, CAST(i+1 AS INT), CAST(i+5 AS INT)),' '))
        |     % 9223372036854775808 AS BIGINT)))) AS g FROM d),
        |df AS (SELECT g, count(*) AS df FROM sh GROUP BY 1)
        |SELECT sh.doc_id, count(*) AS n_shingles,
        | count(CASE WHEN df.df >= 2 THEN 1 END) AS dup_shingles,
        | (10000 * count(CASE WHEN df.df >= 2 THEN 1 END)) // count(*)
        |   AS dup_bp
        |FROM sh JOIN df USING (g) GROUP BY 1""".stripMargin,
    "txt_classifier" ->
      """WITH t AS (SELECT doc_id, lang,
        |   unnest(string_split_regex(trim(text), ' +')) AS term
        |  FROM documents),
        |s AS (SELECT doc_id, lang,
        |   ((CAST(md5_number_lower(term) % 9223372036854775808 AS BIGINT)
        |     % 256) * 2654435761) % 2001 - 1000 AS w
        |  FROM t)
        |SELECT doc_id, lang, count(*) AS n_tokens,
        | CAST(sum(w) AS BIGINT) AS logit,
        | (10000 * CAST(sum(w) AS BIGINT)) // count(*)
        |   AS logit_e4_per_token,
        | CASE WHEN sum(w) >= 0 THEN 1 ELSE 0 END AS keep
        |FROM s GROUP BY 1, 2""".stripMargin,
    "txt_classifier_train" ->
      """WITH t AS (SELECT lang,
        |   unnest(string_split_regex(trim(text), ' +')) AS term
        |  FROM documents),
        |c AS (SELECT
        |   CAST(CAST(md5_number_lower(term) % 9223372036854775808
        |     AS BIGINT) % 256 AS INT) AS bucket,
        |   CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |     AS c_ref,
        |   CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |     AS c_bg
        |  FROM t GROUP BY 1),
        |n AS (SELECT sum(c_ref) AS n_ref, sum(c_bg) AS n_bg FROM c),
        |d AS (SELECT CAST(r.b AS INT) AS bucket,
        |   coalesce(c.c_ref, 0) AS c_ref, coalesce(c.c_bg, 0) AS c_bg
        |  FROM range(0, 256) r(b) LEFT JOIN c ON c.bucket = r.b)
        |SELECT d.bucket, CAST(d.c_ref AS BIGINT) AS c_ref,
        | CAST(d.c_bg AS BIGINT) AS c_bg,
        | CAST(round(10000 * ln(
        |   ((d.c_ref::DOUBLE + 1) * (n.n_bg::DOUBLE + 256)) /
        |   ((d.c_bg::DOUBLE + 1) * (n.n_ref::DOUBLE + 256)))) AS BIGINT)
        |   AS w
        |FROM d, n""".stripMargin,
    "pipeline_fixed_sample" ->
      """WITH h AS (SELECT source, doc_id,
        |   CAST(md5_number_lower('fsample:' || doc_id)
        |     % 9223372036854775808 AS BIGINT) & 4503599627370495 AS h52
        |  FROM documents),
        |r AS (SELECT source, doc_id,
        |   CAST(row_number() OVER (PARTITION BY source ORDER BY h52, doc_id)
        |     AS INT) AS sample_rank
        |  FROM h)
        |SELECT source, doc_id, sample_rank FROM r
        |WHERE sample_rank <= 50""".stripMargin,
    "pipeline_shuffle" ->
      """SELECT doc_id, source, CAST(t.epoch AS INT) AS epoch,
        | CAST(md5_number_lower('epoch-' || t.epoch || ':' || doc_id)
        |   % 9223372036854775808 AS BIGINT) AS order_key,
        | CAST(CAST(md5_number_lower('epoch-' || t.epoch || ':' || doc_id)
        |   % 9223372036854775808 AS BIGINT) // 144115188075855872 AS INT)
        |   AS shard
        |FROM documents, LATERAL unnest([0, 1, 2]) AS t(epoch)""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_top_customers" ->
      """SELECT c_custkey, c_name, revenue, n_orders
        |FROM (SELECT o_custkey, round(sum(o_totalprice),2) AS revenue,
        |             count(*) AS n_orders
        |      FROM orders GROUP BY o_custkey) j
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        |JOIN customer ON o_custkey=c_custkey
        |WHERE c_mktsegment='BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1,2,3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name, round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        |JOIN customer ON o_custkey=c_custkey
        |JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
        |JOIN nation ON s_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |WHERE r_name='ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS promo_revenue,
        | count(*) AS n_lineitems
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.06
        |  AND l_quantity < 24""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS INT) AS l_year,
        | count(*) AS n_lineitems,
        | round(CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000)
        |   AS BIGINT)) AS DOUBLE)/10000, 4) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        |JOIN customer ON o_custkey=c_custkey
        |JOIN supplier ON l_suppkey=s_suppkey
        |JOIN nation n1 ON s_nationkey=n1.n_nationkey
        |JOIN nation n2 ON c_nationkey=n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_1','NATION_2','NATION_3')
        |  AND n2.n_name IN ('NATION_1','NATION_2','NATION_3')
        |  AND n1.n_name != n2.n_name
        |GROUP BY 1,2,3""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
        | count(*) AS n_lineitems
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        |JOIN customer ON o_custkey=c_custkey
        |JOIN nation ON c_nationkey=n_nationkey
        |WHERE l_returnflag='R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
        |GROUP BY 1,2,3 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q13_cust_distribution" ->
      """WITH co AS (SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey=o_custkey
        |    AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS n_customers
        |FROM co GROUP BY c_count""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_custkey, c_name, o_orderkey,
        | CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
        | round(o_totalprice, 2) AS price,
        | round(sum(l_quantity), 2) AS total_qty
        |FROM orders JOIN lineitem ON o_orderkey=l_orderkey
        |JOIN customer ON o_custkey=c_custkey
        |GROUP BY 1,2,3,4,5 HAVING sum(l_quantity) > 300""".stripMargin,
    "q19_disjunctive" ->
      """SELECT round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
        | count(*) AS n_lineitems
        |FROM lineitem JOIN part ON l_partkey=p_partkey
        |WHERE (p_brand='Brand#2' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand='Brand#17' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand='Brand#4' AND p_size BETWEEN 5 AND 25
        |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    "q21_blame_supplier" ->
      """WITH l AS (SELECT l_orderkey, l_suppkey,
        |   CAST(l_shipdate > o_orderdate + INTERVAL 60 DAY AS INT) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |per_supp AS (SELECT l_orderkey, l_suppkey, max(late) AS supp_late
        |  FROM l GROUP BY 1, 2),
        |per_order AS (SELECT l_orderkey,
        |   count(*) AS n_suppliers, sum(supp_late) AS n_late_suppliers
        |  FROM per_supp GROUP BY 1),
        |blamed AS (SELECT ps.l_suppkey
        |  FROM per_supp ps JOIN per_order po ON ps.l_orderkey = po.l_orderkey
        |  WHERE po.n_suppliers >= 2 AND po.n_late_suppliers = 1
        |    AND ps.supp_late = 1)
        |SELECT s_name, n_name, count(*) AS numwait
        |FROM blamed JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,
    "q16_supplier_variety" ->
      """WITH bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM bridge JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q20_excess_shipments" ->
      """WITH sp AS (SELECT l_suppkey, l_partkey,
        |   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sp
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
        |  GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, CAST(sum(qty_sp) AS BIGINT) AS qty_p,
        |   CAST(count(*) AS BIGINT) AS n_suppliers
        |  FROM sp GROUP BY 1),
        |flagged AS (SELECT DISTINCT l_suppkey
        |  FROM sp JOIN pt USING (l_partkey)
        |  WHERE qty_sp * n_suppliers > 2 * qty_p)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN flagged ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey""".stripMargin,
    "q22_idle_customers" ->
      """WITH a AS (SELECT avg(c_acctbal) AS m FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, count(*) AS n_customers,
        | round(sum(c_acctbal), 2) AS total_balance
        |FROM customer, a WHERE c_acctbal > m
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey
        |    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY c_mktsegment""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        | count(*) AS n_lineitems,
        | round(CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000)
        |   AS BIGINT)) AS DOUBLE)/10000, 4) AS revenue
        |FROM lineitem JOIN part ON l_partkey=p_partkey
        |JOIN orders ON l_orderkey=o_orderkey
        |JOIN supplier ON l_suppkey=s_suppkey
        |JOIN nation ON s_nationkey=n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1,2""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |   CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000)
        |     AS BIGINT)) AS BIGINT) AS rev_l
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        | round(CAST(rev_l AS DOUBLE)/10000, 4) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_l = (SELECT max(rev_l) FROM rev)""".stripMargin,
    "q17_small_quantity" ->
      """WITH x AS (SELECT l_quantity, l_extendedprice,
        |   avg(l_quantity) OVER (PARTITION BY l_partkey) AS aq
        |  FROM lineitem JOIN part ON l_partkey=p_partkey
        |  WHERE p_brand = 'Brand#3' AND p_size <= 10)
        |SELECT count(*) AS n_lineitems,
        | round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
        |   AS DOUBLE)/700.0, 2) AS avg_yearly
        |FROM x WHERE l_quantity < 0.2 * aq""".stripMargin,
    "q_lead_gap" ->
      """WITH x AS (SELECT o_custkey, o_orderdate,
        |   lead(o_orderdate, 1) OVER (PARTITION BY o_custkey
        |     ORDER BY o_orderdate, o_orderkey) AS next_date
        |  FROM orders)
        |SELECT o_custkey, count(*) AS n_orders,
        | CAST(max(date_diff('day', o_orderdate, next_date)) AS INT)
        |   AS max_gap_days,
        | CAST(min(date_diff('day', o_orderdate, next_date)) AS INT)
        |   AS min_gap_days
        |FROM x GROUP BY o_custkey""".stripMargin,
    "q8_market_share" ->
      """WITH bn AS (SELECT CAST(year(o_orderdate) AS INT) AS o_year, n_name,
        |   sum(l_extendedprice * (1.0 - l_discount)) AS rev
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY 1, 2)
        |SELECT o_year, n_name, round(rev, 2) AS revenue,
        | round(100.0 * rev / sum(rev) OVER (PARTITION BY o_year), 4) AS share
        |FROM bn""".stripMargin,
    "q_percent_rank" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price,
        | round(percent_rank() OVER w, 4) AS pct_rank,
        | round(cume_dist() OVER w, 4) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_totalprice, o_orderkey)""".stripMargin,
    "q_window_running" ->
      """SELECT o_orderkey, o_custkey,
        | row_number() OVER w AS rn,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend,
        | round(lag(o_totalprice,1) OVER w,2) AS prev_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | count(*) AS n_orders
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey=c_custkey AND o_orderpriority='1-URGENT')""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey
        |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')""".stripMargin,
    "q_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers,
        | count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_asof_join" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |           FROM orders GROUP BY 1,2)
        |SELECT e.event_id, e.user_id, o.o_orderkey
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,
    "q_asof_native" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |           FROM orders GROUP BY 1,2)
        |SELECT e.event_id, e.user_id, o.o_orderkey
        |FROM events e ASOF LEFT JOIN o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,
    "q_scd2_lookup" ->
      """WITH d AS (SELECT o_custkey,
        |   CAST(row_number() OVER w AS INT) AS version_idx,
        |   o_orderdate AS valid_from, o_orderstatus,
        |   round(o_totalprice, 2) AS price
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey)),
        |eff AS (SELECT o_custkey, valid_from,
        |   max(version_idx) AS version_idx,
        |   arg_max(o_orderstatus, version_idx) AS o_orderstatus,
        |   arg_max(price, version_idx) AS price
        |  FROM d GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, eff.version_idx,
        | eff.o_orderstatus, eff.price
        |FROM events e ASOF LEFT JOIN eff
        |  ON e.user_id = eff.o_custkey AND e.ts >= eff.valid_from""".stripMargin,
    "q_upsert_latest" ->
      """WITH all_rows AS (
        | SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS version
        | FROM orders
        | UNION ALL
        | SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0, 2
        | FROM orders WHERE o_orderkey % 10 = 0),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |   ORDER BY version DESC) AS rn FROM all_rows)
        |SELECT o_orderstatus, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |   AS revenue
        |FROM ranked WHERE rn = 1 GROUP BY o_orderstatus""".stripMargin,
    "q_skew_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
        |   AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "evt_produce" ->
      s"""SELECT 'event-stream' AS topic,
        | CAST(event_id % $logP AS INT) AS "partition",
        | CAST(row_number() OVER (PARTITION BY event_id % $logP
        |      ORDER BY event_id) - 1 AS BIGINT) AS "offset",
        | event_id AS key, '#' || event_id AS payload
        |FROM events""".stripMargin,
    "evt_produce_stats" ->
      s"""WITH p AS (SELECT event_id AS key,
        |   CAST(event_id % $logP AS INT) AS "partition",
        |   CAST(row_number() OVER (PARTITION BY event_id % $logP
        |        ORDER BY event_id) - 1 AS BIGINT) AS "offset",
        |   '#' || event_id AS payload
        |  FROM events)
        |SELECT "partition", count(*) AS n_messages,
        | max("offset") AS max_offset,
        | CAST(sum(((key % 97003) * ("offset" % 97003)) % 1000003)
        |   AS BIGINT) AS key_offset_checksum,
        | min(payload) AS first_payload, max(payload) AS last_payload
        |FROM p GROUP BY 1""".stripMargin,
    "evt_offsets" ->
      s"""WITH p AS (SELECT CAST(event_id % $logP AS INT) AS "partition",
        |   CAST(row_number() OVER (PARTITION BY event_id % $logP
        |        ORDER BY event_id) - 1 AS BIGINT) AS "offset"
        |  FROM events)
        |SELECT 'event-stream' AS topic, "partition",
        | max("offset") AS committed_offset, count(*) AS n_messages
        |FROM p GROUP BY 1,2""".stripMargin,
    "evt_consume_batches" ->
      s"""WITH p AS (SELECT CAST(event_id % $logP AS INT) AS "partition",
        |   CAST(row_number() OVER (PARTITION BY event_id % $logP
        |        ORDER BY event_id) - 1 AS BIGINT) AS "offset",
        |   '#' || event_id AS payload
        |  FROM events)
        |SELECT "partition", "offset"//10 AS batch_id, count(*) AS n_messages,
        | min(payload) AS first_payload, max(payload) AS last_payload
        |FROM p GROUP BY 1,2""".stripMargin,
    "evt_multi_topic" ->
      s"""WITH p AS (SELECT 'evt-' || event_type AS topic,
        |   CAST(user_id % $mtP AS INT) AS "partition",
        |   CAST(row_number() OVER (PARTITION BY event_type, user_id % $mtP
        |        ORDER BY event_id) - 1 AS BIGINT) AS "offset"
        |  FROM events)
        |SELECT topic, "partition", max("offset") AS committed_offset,
        | count(*) AS n_messages
        |FROM p GROUP BY 1, 2""".stripMargin,
    "evt_windowed" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        | event_type, count(*) AS n_events, round(sum(value),2) AS total_value
        |FROM events GROUP BY 1,2""".stripMargin,
    "evt_sessionize" ->
      """WITH x AS (SELECT user_id, event_id, ts, value,
        |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |y AS (SELECT *, CASE WHEN prev_ts IS NULL
        |   OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS ns
        |  FROM x),
        |z AS (SELECT *, CAST(sum(ns) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS session_id
        |  FROM y)
        |SELECT user_id, session_id, count(*) AS n_events,
        | CAST(date_trunc('second', min(ts)) AS TIMESTAMP) AS session_start,
        | round(sum(value),2) AS session_value
        |FROM z GROUP BY 1,2""".stripMargin,
    "evt_enrich" ->
      """SELECT n_name, event_type, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |   AS total_value
        |FROM events JOIN customer ON user_id=c_custkey
        |JOIN nation ON c_nationkey=n_nationkey
        |GROUP BY 1,2""".stripMargin,
    "q_quantile_buckets" ->
      """WITH r AS (SELECT o_totalprice,
        |   row_number() OVER (ORDER BY o_totalprice) AS rn,
        |   count(*) OVER () AS n FROM orders),
        |b AS (SELECT
        |   max(CASE WHEN rn = CAST(ceil(0.25*n) AS BIGINT)
        |     THEN o_totalprice END) AS q1,
        |   max(CASE WHEN rn = CAST(ceil(0.5*n) AS BIGINT)
        |     THEN o_totalprice END) AS q2,
        |   max(CASE WHEN rn = CAST(ceil(0.75*n) AS BIGINT)
        |     THEN o_totalprice END) AS q3 FROM r)
        |SELECT CASE WHEN o_totalprice < q1 THEN 1
        |            WHEN o_totalprice < q2 THEN 2
        |            WHEN o_totalprice < q3 THEN 3
        |            ELSE 4 END AS quartile,
        | count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        | round(min(o_totalprice), 2) AS min_price,
        | round(max(o_totalprice), 2) AS max_price
        |FROM orders, b GROUP BY 1""".stripMargin,
    "q_scd2_dim" ->
      """SELECT o_custkey, CAST(row_number() OVER w AS INT) AS version_idx,
        | o_orderdate AS valid_from,
        | lead(o_orderdate) OVER w AS valid_to,
        | o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "txt_tfidf" ->
      """WITH tf AS (SELECT doc_id,
        |   unnest(string_split_regex(trim(text), ' +')) AS term
        |  FROM documents),
        |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY 1, 2),
        |dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |r AS (SELECT tfc.doc_id, tfc.term, tfc.tf, dfc.df,
        |   CAST(row_number() OVER (PARTITION BY tfc.doc_id
        |     ORDER BY tfc.tf DESC, dfc.df, tfc.term) AS INT) AS rank,
        |   round(tfc.tf * ln(n.n_docs::DOUBLE / dfc.df), 4) AS tfidf
        |  FROM tfc JOIN dfc ON tfc.term = dfc.term CROSS JOIN n)
        |SELECT doc_id, term, tf, df, rank, tfidf FROM r
        |WHERE rank <= 3""".stripMargin,
    "q_approx_percentile" ->
      """WITH r AS (SELECT o_orderstatus, o_totalprice,
        |   row_number() OVER (PARTITION BY o_orderstatus
        |     ORDER BY o_totalprice) AS rn,
        |   count(*) OVER (PARTITION BY o_orderstatus) AS n
        |  FROM orders)
        |SELECT o_orderstatus,
        | round(max(CASE WHEN rn = CAST(ceil(0.5*n) AS BIGINT)
        |   THEN o_totalprice END), 2) AS ap50,
        | round(max(CASE WHEN rn = CAST(ceil(0.9*n) AS BIGINT)
        |   THEN o_totalprice END), 2) AS ap90,
        | CAST(max(n) AS BIGINT) AS n_orders
        |FROM r GROUP BY o_orderstatus""".stripMargin,
    "q_percentiles" ->
      """SELECT o_orderstatus,
        | round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        | round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
        | round(quantile_cont(o_totalprice, 0.99), 2) AS p99,
        | count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_setops" ->
      """SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus='F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus='O'""".stripMargin,
    "q_conditional_agg" ->
      """SELECT l_linestatus,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        |GROUP BY l_linestatus""".stripMargin,
    "q_outer_join" ->
      """SELECT n_name, count(c_custkey) AS n_customers,
        | round(coalesce(sum(c_acctbal), 0.0), 2) AS total_balance
        |FROM nation LEFT OUTER JOIN
        | (SELECT * FROM customer WHERE c_mktsegment='MACHINERY') c
        | ON n_nationkey = c_nationkey
        |GROUP BY n_name""".stripMargin,
    "q_full_outer" ->
      """WITH s AS (SELECT s_nationkey, count(*) AS n_suppliers
        |  FROM supplier GROUP BY s_nationkey),
        |c AS (SELECT c_nationkey, count(*) AS n_customers
        |  FROM customer WHERE c_mktsegment='AUTOMOBILE'
        |  GROUP BY c_nationkey)
        |SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
        | coalesce(n_suppliers, 0) AS n_suppliers,
        | coalesce(n_customers, 0) AS n_customers
        |FROM s FULL OUTER JOIN c ON s_nationkey = c_nationkey""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        |FROM (SELECT *, avg(c_acctbal) OVER (PARTITION BY c_nationkey)
        |        AS nation_avg
        |      FROM customer)
        |WHERE c_acctbal > nation_avg""".stripMargin,
    "evt_sliding" ->
      """SELECT CAST(date_trunc('hour', ts) - i * INTERVAL '1 hour' AS TIMESTAMP)
        |   AS window_start,
        | event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM events CROSS JOIN (VALUES (0), (1)) t(i)
        |GROUP BY 1, 2""".stripMargin,
    "evt_session_window" ->
      """WITH x AS (SELECT user_id, event_id, ts, value,
        |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |y AS (SELECT *, CASE WHEN prev_ts IS NULL
        |   OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS ns
        |  FROM x),
        |z AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM y)
        |SELECT user_id,
        | CAST(date_trunc('second', min(ts)) AS TIMESTAMP) AS session_start,
        | count(*) AS n_events, round(sum(value), 2) AS session_value
        |FROM z GROUP BY user_id, sid""".stripMargin,
    "evt_pivot" ->
      """SELECT n_name,
        | count(*) FILTER (WHERE event_type='click') AS click,
        | count(*) FILTER (WHERE event_type='view') AS view,
        | count(*) FILTER (WHERE event_type='purchase') AS purchase,
        | count(*) FILTER (WHERE event_type='signup') AS signup,
        | count(*) FILTER (WHERE event_type='error') AS error
        |FROM events JOIN customer ON user_id=c_custkey
        |JOIN nation ON c_nationkey=n_nationkey
        |GROUP BY n_name""".stripMargin,
    "evt_json_extract" ->
      """SELECT event_type,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |   AS sum_k,
        | round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
        | count(json_extract_string(props, '$.k')) AS n_with_k
        |FROM events GROUP BY event_type""".stripMargin,
    "txt_tokens" ->
      """WITH d AS (SELECT lang, string_split_regex(trim(text), ' +') AS words,
        |   CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
        |     AS n_bpe
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        | CAST(sum(len(words)) AS BIGINT) AS total_tokens,
        | round(avg(len(words)),4) AS avg_tokens,
        | CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens
        |FROM d GROUP BY lang""".stripMargin,
    "txt_quality" ->
      """WITH d AS (SELECT doc_id, source, text,
        |   string_split_regex(trim(text), ' +') AS words FROM documents)
        |SELECT doc_id, source,
        | CAST(length(text) AS BIGINT) AS n_chars_actual,
        | CAST(len(words) AS BIGINT) AS n_tokens,
        | round(len(list_filter(words,
        |   w -> w IN ('the','a','of','and','to','in','is')))::DOUBLE
        |   / len(words), 4) AS stopword_ratio,
        | round(len(regexp_extract_all(text, '[^a-z0-9 ]'))::DOUBLE
        |   / length(text), 4) AS punct_ratio,
        | round(len(list_distinct(words))::DOUBLE / len(words), 4)
        |   AS type_token_ratio
        |FROM d""".stripMargin,
    "txt_term_freq" ->
      """WITH w AS (SELECT lang, unnest(string_split_regex(trim(text), ' +'))
        |   AS word FROM documents),
        |c AS (SELECT lang, word, count(*) AS n FROM w GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang
        |   ORDER BY n DESC, word) AS INT) AS rank FROM c)
        |SELECT lang, word, n, rank FROM r WHERE rank <= 10""".stripMargin,
    "txt_approx_topk" ->
      """WITH w AS (SELECT lang, unnest(string_split_regex(trim(text), ' +'))
        |   AS word FROM documents),
        |c AS (SELECT lang, word, count(*) AS n FROM w GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang
        |   ORDER BY n DESC, word) AS INT) AS rank FROM c)
        |SELECT lang, word, n, rank FROM r WHERE rank <= 10""".stripMargin,
    "txt_doc_freq" ->
      """WITH w AS (SELECT doc_id,
        |   unnest(list_distinct(string_split_regex(trim(text), ' +')))
        |     AS word
        |  FROM documents),
        |c AS (SELECT word, count(*) AS df FROM w GROUP BY word),
        |r AS (SELECT word, df, CAST(row_number() OVER (
        |   ORDER BY df DESC, word) AS INT) AS rank FROM c)
        |SELECT word, df, rank FROM r WHERE rank <= 20""".stripMargin,
    "txt_contamination" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text),' +') AS w
        |  FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |   range(0, greatest(len(w)-5,0)+1),
        |   i -> CAST(md5_number_lower(array_to_string(
        |     list_slice(w, CAST(i+1 AS INT), CAST(i+5 AS INT)),' '))
        |     % 9223372036854775808 AS BIGINT)))) AS g FROM d),
        |ev AS (SELECT doc_id, g FROM sh WHERE doc_id % 29 = 0),
        |co AS (SELECT doc_id, g FROM sh WHERE doc_id % 29 != 0),
        |hits AS (SELECT ev.doc_id, ev.g, count(DISTINCT co.doc_id) AS nd
        |  FROM ev LEFT JOIN co ON ev.g = co.g GROUP BY 1,2)
        |SELECT doc_id, count(*) AS n_shingles,
        | count(CASE WHEN nd>0 THEN 1 END) AS n_contaminated,
        | CAST(coalesce(sum(nd),0) AS BIGINT) AS n_corpus_matches
        |FROM hits GROUP BY doc_id""".stripMargin,
    "txt_repetition" ->
      """WITH d AS (SELECT doc_id, lang,
        |   string_split_regex(trim(text),' +') AS w FROM documents),
        |g AS (SELECT doc_id, lang,
        |   CAST(greatest(len(w)-2, 0) AS BIGINT) AS n_trigrams,
        |   CAST(len(list_distinct(list_transform(range(0, greatest(len(w)-2,0)),
        |     i -> array_to_string(list_slice(w, CAST(i+1 AS INT),
        |       CAST(i+3 AS INT)),' ')))) AS BIGINT) AS n_distinct_trigrams,
        |   CAST(greatest(len(w)-1, 0) AS BIGINT) AS n_bigrams,
        |   CAST(len(list_distinct(list_transform(range(0, greatest(len(w)-1,0)),
        |     i -> array_to_string(list_slice(w, CAST(i+1 AS INT),
        |       CAST(i+2 AS INT)),' ')))) AS BIGINT) AS n_distinct_bigrams
        |  FROM d)
        |SELECT doc_id, lang, n_trigrams, n_distinct_trigrams,
        | n_bigrams, n_distinct_bigrams,
        | round((n_trigrams - n_distinct_trigrams)
        |   / greatest(n_trigrams, 1)::DOUBLE, 4) AS dup_trigram_frac
        |FROM g""".stripMargin,
    // same injection arithmetic, then the same three-stage
    // count-then-redact cascade; 'g' = replace ALL matches (DuckDB
    // replaces only the first by default, Spark always replaces all)
    "txt_pii_scrub" ->
      """WITH injected AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 3 = 0 THEN ' contact user' ||
        |    CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0 THEN ' tel +1-555-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0 THEN ' ref ' ||
        |    CAST((doc_id*7) % 900 + 100 AS VARCHAR) || '-' ||
        |    CAST((doc_id*3) % 90 + 10 AS VARCHAR) || '-' ||
        |    CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END AS text
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |    '<EMAIL>', 'g') AS t1 FROM injected),
        |s2 AS (SELECT doc_id, n_emails,
        |  CAST(len(regexp_extract_all(t1,
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ids,
        |  regexp_replace(t1, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b',
        |    '<ID>', 'g') AS t2 FROM s1)
        |SELECT doc_id, n_emails,
        |  CAST(len(regexp_extract_all(t2, '\+[0-9][0-9-]{6,}[0-9]'))
        |    AS BIGINT) AS n_phones,
        |  n_ids,
        |  regexp_replace(t2, '\+[0-9][0-9-]{6,}[0-9]', '<PHONE>', 'g')
        |    AS clean_text
        |FROM s2""".stripMargin,
    "pipeline_curate" ->
      """WITH rates AS (SELECT * FROM (VALUES
        |  ('src0', 10000), ('src1', 5000), ('src2', 2500),
        |  ('src3', 1250), ('src4', 625)) t(source, keep_bp)),
        |d AS (SELECT doc_id, documents.source,
        |   string_split_regex(trim(text),' +') AS w,
        |   md5(lower(trim(text))) AS content_hash,
        |   (md5_number_lower(CAST(doc_id AS VARCHAR))
        |     % 9223372036854775808) % 10000 AS h,
        |   coalesce(keep_bp, 500) AS kb
        |  FROM documents LEFT JOIN rates ON documents.source = rates.source),
        |g AS (SELECT doc_id, source, content_hash, h, kb,
        |   CAST(len(w) AS BIGINT) AS n_tokens,
        |   (greatest(len(w)-2, 0)
        |     - len(list_distinct(list_transform(range(0, greatest(len(w)-2,0)),
        |         i -> array_to_string(list_slice(w, CAST(i+1 AS INT),
        |           CAST(i+3 AS INT)),' ')))))
        |     / greatest(greatest(len(w)-2, 0), 1)::DOUBLE AS dup_tri,
        |   row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
        |  FROM d),
        |k AS (SELECT *, (rn = 1 AND n_tokens >= 20 AND dup_tri <= 0.2
        |   AND h < kb) AS kept FROM g),
        |p AS (SELECT *, doc_id // 1000 AS shard,
        |   coalesce(sum(n_tokens) OVER (PARTITION BY source, doc_id // 1000
        |     ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |     0) // 512 AS context_id
        |  FROM k WHERE kept),
        |funnel AS (SELECT source, count(*) AS n_candidates,
        |   count(CASE WHEN kept THEN 1 END) AS n_kept FROM k GROUP BY source),
        |ctx AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS kept_tokens,
        |   count(DISTINCT (shard, context_id)) AS n_contexts
        |  FROM p GROUP BY source)
        |SELECT funnel.source, n_candidates, n_kept,
        | coalesce(kept_tokens, 0) AS kept_tokens,
        | coalesce(n_contexts, 0) AS n_contexts
        |FROM funnel LEFT JOIN ctx ON funnel.source = ctx.source""".stripMargin,
    "pipeline_sample" ->
      """WITH rates AS (SELECT * FROM (VALUES
        |  ('src0', 10000), ('src1', 5000), ('src2', 2500),
        |  ('src3', 1250), ('src4', 625)) t(source, keep_bp)),
        |d AS (SELECT doc_id, documents.source,
        |   CAST(len(string_split_regex(trim(text),' +')) AS BIGINT) AS n_tokens,
        |   coalesce(keep_bp, 500) AS kb,
        |   (md5_number_lower(CAST(doc_id AS VARCHAR))
        |     % 9223372036854775808) % 10000 AS h
        |  FROM documents LEFT JOIN rates ON documents.source = rates.source)
        |SELECT source, count(*) AS n_total,
        | count(CASE WHEN h < kb THEN 1 END) AS n_sampled,
        | CAST(coalesce(sum(CASE WHEN h < kb THEN n_tokens END),0) AS BIGINT)
        |   AS sampled_tokens
        |FROM d GROUP BY source""".stripMargin,
    "pipeline_split" ->
      """WITH d AS (SELECT source,
        |   CAST(len(string_split_regex(trim(text),' +')) AS BIGINT) AS n_tokens,
        |   (md5_number_lower(CAST(doc_id AS VARCHAR))
        |     % 9223372036854775808) % 10000 AS h
        |  FROM documents)
        |SELECT source,
        | CASE WHEN h < 9000 THEN 'train'
        |      WHEN h < 9500 THEN 'val' ELSE 'test' END AS split,
        | count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM d GROUP BY 1, 2""".stripMargin,
    // Morton spread replayed stepwise with <<, |, & — bit-identical
    // to Layout.spread16's mask cascade
    "pipeline_zorder" ->
      """WITH d AS (SELECT doc_id,
        |   CAST((md5_number_lower(lang) % 9223372036854775808) % 65536
        |     AS BIGINT) AS lang_code,
        |   CAST(least(n_chars, 65535) AS BIGINT) AS len_clip
        |  FROM documents),
        |s1 AS (SELECT *, ((lang_code | (lang_code << 8)) & 16711935) AS xa,
        |   ((len_clip | (len_clip << 8)) & 16711935) AS ya FROM d),
        |s2 AS (SELECT *, ((xa | (xa << 4)) & 252645135) AS xb,
        |   ((ya | (ya << 4)) & 252645135) AS yb FROM s1),
        |s3 AS (SELECT *, ((xb | (xb << 2)) & 858993459) AS xc,
        |   ((yb | (yb << 2)) & 858993459) AS yc FROM s2),
        |s4 AS (SELECT *, ((xc | (xc << 1)) & 1431655765) AS xd,
        |   ((yc | (yc << 1)) & 1431655765) AS yd FROM s3)
        |SELECT doc_id, lang_code, len_clip,
        | CAST(xd | (yd << 1) AS BIGINT) AS zkey,
        | CAST((xd | (yd << 1)) // 262144 AS BIGINT) AS zbucket
        |FROM s4""".stripMargin,
    // stride = (10^7 * n_s) // (wbp_s * N): pure integer arithmetic,
    // same floor division both engines
    "pipeline_mixture" ->
      """WITH w AS (SELECT * FROM (VALUES
        |  ('src0', 4000), ('src1', 2500), ('src2', 2000),
        |  ('src3', 1000), ('src4', 500)) t(s_source, wbp)),
        |n AS (SELECT source AS c_source, count(*) AS ns
        |  FROM documents JOIN w ON source = s_source GROUP BY 1),
        |tot AS (SELECT sum(ns) AS nt FROM n),
        |strides AS (SELECT s_source,
        |   (10000000 * ns) // (wbp * nt) AS stride
        |  FROM w JOIN n ON s_source = c_source CROSS JOIN tot)
        |SELECT doc_id, documents.source,
        | CAST((md5_number_lower('mix:' || CAST(doc_id AS VARCHAR))
        |     % 4294967296)
        |   * stride AS BIGINT) AS mix_pos
        |FROM documents JOIN strides ON documents.source = s_source""".stripMargin,
    "pipeline_shard" ->
      """WITH d AS (SELECT doc_id,
        |   CAST(len(string_split_regex(trim(text),' +')) AS BIGINT) AS n_tokens,
        |   (md5_number_lower('shard:' || CAST(doc_id AS VARCHAR))
        |     % 9223372036854775808) % 16 AS shard
        |  FROM documents)
        |SELECT shard, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        | min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
        |FROM d GROUP BY 1""".stripMargin,
    "pipeline_kanon" ->
      """SELECT source, lang, len_bucket,
        | CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(CASE WHEN count(*) < 10 THEN 1 ELSE 0 END AS INT)
        |   AS suppress,
        | CAST(CASE WHEN count(*) < 10 THEN count(*) ELSE 0 END AS BIGINT)
        |   AS suppressed_docs
        |FROM (SELECT source, lang,
        |   CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) // 64
        |     AS len_bucket
        |  FROM documents)
        |GROUP BY 1, 2, 3""".stripMargin,
    "pipeline_chunk" ->
      """WITH d AS (SELECT doc_id,
        |   string_split_regex(trim(text), ' +') AS w,
        |   CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (SELECT doc_id, w, n,
        |   unnest(range(0, CASE WHEN n <= 64 THEN 1
        |                  ELSE (n - 64 + 47) // 48 + 1 END)) AS i
        |  FROM d)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        | CAST(i * 48 + 1 AS BIGINT) AS start_tok,
        | CAST(least(64, n - i * 48) AS BIGINT) AS n_toks,
        | CAST(md5_number_lower(array_to_string(
        |     list_slice(w, CAST(i * 48 + 1 AS INT), CAST(i * 48 + 64 AS INT)),
        |     ' ')) % 9223372036854775808 AS BIGINT) AS chunk_hash
        |FROM c""".stripMargin,
    "pipeline_expectations" ->
      """WITH doc_agg AS (SELECT count(*) AS n_rows,
        |   sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS key_null,
        |   count(*) - count(DISTINCT doc_id) AS key_dup,
        |   sum(CASE WHEN text IS NULL OR length(text) = 0
        |       THEN 1 ELSE 0 END) AS text_empty,
        |   sum(CASE WHEN lang NOT IN ('de','en','es','fr','zh')
        |       THEN 1 ELSE 0 END) AS lang_domain,
        |   sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END)
        |     AS nchars_drift
        |  FROM documents),
        |ord_agg AS (SELECT count(*) AS n_rows,
        |   sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS key_null,
        |   count(*) - count(DISTINCT o_orderkey) AS key_dup,
        |   sum(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0 END)
        |     AS price_positive,
        |   sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS date_null
        |  FROM orders),
        |evt_agg AS (SELECT count(*) AS n_rows,
        |   sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS key_null,
        |   count(*) - count(DISTINCT event_id) AS key_dup,
        |   sum(CASE WHEN event_type NOT IN
        |       ('signup','click','view','purchase','error')
        |       THEN 1 ELSE 0 END) AS type_domain,
        |   sum(CASE WHEN NOT (value >= 0) THEN 1 ELSE 0 END) AS value_nonneg,
        |   sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS ts_null
        |  FROM events)
        |SELECT 'documents' AS tbl, c.k AS constraint,
        |  CAST(n_rows AS BIGINT) AS n_rows, CAST(c.v AS BIGINT) AS n_violations
        |FROM doc_agg, LATERAL (VALUES ('key_null', key_null),
        |  ('key_dup', key_dup), ('text_empty', text_empty),
        |  ('lang_domain', lang_domain), ('nchars_drift', nchars_drift)) c(k, v)
        |UNION ALL
        |SELECT 'orders', c.k, CAST(n_rows AS BIGINT), CAST(c.v AS BIGINT)
        |FROM ord_agg, LATERAL (VALUES ('key_null', key_null),
        |  ('key_dup', key_dup), ('price_positive', price_positive),
        |  ('date_null', date_null)) c(k, v)
        |UNION ALL
        |SELECT 'events', c.k, CAST(n_rows AS BIGINT), CAST(c.v AS BIGINT)
        |FROM evt_agg, LATERAL (VALUES ('key_null', key_null),
        |  ('key_dup', key_dup), ('type_domain', type_domain),
        |  ('value_nonneg', value_nonneg), ('ts_null', ts_null)) c(k, v)"""
        .stripMargin,
    "txt_length_hist" ->
      """WITH d AS (SELECT source,
        |   CAST(len(string_split_regex(trim(text),' +')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT source,
        | CAST(least(n_tokens - (n_tokens % 64), 512) AS BIGINT) AS bucket_lo,
        | count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM d GROUP BY 1, 2""".stripMargin,
    "evt_top_types" ->
      """WITH h AS (SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP)
        |     AS window_start,
        |   event_type, count(*) AS n_events, round(sum(value),2) AS total_value
        |  FROM events GROUP BY 1,2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY window_start
        |   ORDER BY n_events DESC, event_type) AS INT) AS rank FROM h)
        |SELECT window_start, event_type, n_events, total_value, rank
        |FROM r WHERE rank <= 2""".stripMargin,
    "evt_attribution" ->
      """WITH x AS (SELECT *,
        |   last_value(CASE WHEN event_type IN ('view','click')
        |       THEN event_type END IGNORE NULLS)
        |     OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |     AS touch_type,
        |   last_value(CASE WHEN event_type IN ('view','click')
        |       THEN epoch_us(ts) END IGNORE NULLS)
        |     OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |     AS touch_us
        |  FROM events)
        |SELECT CASE WHEN touch_us IS NOT NULL
        |    AND epoch_us(ts) - touch_us <= 3600000000
        |    THEN touch_type ELSE 'organic' END AS channel,
        | count(*) AS n_purchases, round(sum(value),2) AS attributed_value,
        | count(DISTINCT user_id) AS n_buyers
        |FROM x WHERE event_type = 'purchase' GROUP BY 1""".stripMargin,
    "evt_distinct_sliding" ->
      """SELECT CAST(date_trunc('hour', ts) - i * INTERVAL '1 hour' AS TIMESTAMP)
        |   AS window_start,
        | event_type, count(DISTINCT user_id) AS n_users,
        | count(*) AS n_events
        |FROM events CROSS JOIN (VALUES (0), (1)) t(i)
        |GROUP BY 1, 2""".stripMargin,
    "evt_mv_merge" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
        | count(*) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |   AS total_cents,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |   // count(*) AS avg_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "evt_concurrency" ->
      """WITH x AS (SELECT user_id, event_id, ts,
        |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |     AS prev_ts
        |  FROM events),
        |y AS (SELECT *, CASE WHEN prev_ts IS NULL
        |   OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END
        |     AS ns FROM x),
        |z AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM y),
        |iv AS (SELECT user_id, sid, min(ts) AS s,
        |   max(ts) + INTERVAL 1 SECOND AS e FROM z GROUP BY 1, 2),
        |dd AS (SELECT s, e, CAST(t.d AS DATE) AS day
        |  FROM iv, unnest(generate_series(CAST(s AS DATE),
        |    CAST(e AS DATE), INTERVAL 1 DAY)) t(d)),
        |c AS (SELECT day,
        |   greatest(s, CAST(day AS TIMESTAMP)) AS cs,
        |   least(e, CAST(day + 1 AS TIMESTAMP)) AS ce
        |  FROM dd),
        |b AS (SELECT day, cs AS bts, 1 AS delta FROM c WHERE cs < ce
        | UNION ALL SELECT day, ce, -1 FROM c WHERE cs < ce),
        |r AS (SELECT day, sum(delta) OVER (PARTITION BY day
        |   ORDER BY bts, delta
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |  FROM b)
        |SELECT day, CAST(count(*) // 2 AS BIGINT) AS n_sessions,
        | CAST(max(running) AS BIGINT) AS peak_concurrent
        |FROM r GROUP BY 1""".stripMargin,
    "evt_log_integrity" ->
      s"""WITH p AS (SELECT CAST(event_id % $logP AS INT) AS "partition",
        |   CAST(row_number() OVER (PARTITION BY event_id % $logP
        |     ORDER BY event_id) - 1 AS BIGINT) AS "offset"
        |  FROM events)
        |SELECT 'event-stream' AS topic, "partition",
        | max("offset") AS committed_offset,
        | count(*) AS n_consumed,
        | max("offset") + 1 - count(*) AS n_missing
        |FROM p WHERE "offset" % 10 != 7 GROUP BY 1, 2""".stripMargin,
    "pipeline_curriculum" ->
      """SELECT doc_id, source,
        | CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
        |   AS n_tokens,
        | CAST(CASE WHEN len(string_split_regex(trim(text), ' +')) < 64
        |     THEN 0
        |   WHEN len(string_split_regex(trim(text), ' +')) < 192 THEN 1
        |   ELSE 2 END AS INT) AS phase,
        | CAST(md5_number_lower('curr:' || CAST(doc_id AS VARCHAR))
        |   % 9223372036854775808 AS BIGINT) AS order_key
        |FROM documents""".stripMargin,
    "sim_ivfsq_ann" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |cd AS (SELECT label, i, avg(v[CAST(i AS INT)]) AS m
        |  FROM e CROSS JOIN range(1, 65) t(i) GROUP BY 1, 2),
        |cent AS (SELECT label AS cell, list(m ORDER BY i) AS cv
        |  FROM cd GROUP BY label),
        |q0 AS (SELECT vec_id AS query_id, v AS qv FROM e
        |  WHERE vec_id < 10),
        |pr AS (SELECT query_id, cell,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY list_cosine_similarity(qv, cv) DESC, cell) AS crank
        |  FROM q0 CROSS JOIN cent),
        |probes AS (SELECT query_id, cell FROM pr WHERE crank <= 5),
        |dim AS (SELECT CAST(d AS INT) AS d,
        |   min(v[CAST(d+1 AS INT)]) AS lo, max(v[CAST(d+1 AS INT)]) AS hi
        |  FROM e CROSS JOIN range(0, 64) t(d) GROUP BY 1),
        |r AS (SELECT list(lo ORDER BY d) AS lo, list(hi ORDER BY d) AS hi
        |  FROM dim),
        |cc AS (SELECT vec_id, label, list_transform(range(0, 64), i ->
        |   CASE WHEN r.hi[CAST(i+1 AS INT)] = r.lo[CAST(i+1 AS INT)] THEN 0
        |   ELSE CAST(least(greatest(floor(
        |       (v[CAST(i+1 AS INT)] - r.lo[CAST(i+1 AS INT)])
        |       / (r.hi[CAST(i+1 AS INT)] - r.lo[CAST(i+1 AS INT)]) * 255.0),
        |     0), 255) AS INT) END) AS c
        |  FROM e CROSS JOIN r),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id,
        |   CAST(list_sum(list_transform(range(0, 64), i ->
        |     (q.c[CAST(i+1 AS INT)] - 128) * (c.c[CAST(i+1 AS INT)] - 128)))
        |     AS BIGINT) AS score
        |  FROM cc q
        |  JOIN probes p ON p.query_id = q.vec_id
        |  JOIN cc c ON c.label = p.cell AND c.vec_id != q.vec_id),
        |sl AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY score DESC, vec_id) AS rn FROM s)
        |  WHERE rn <= 20)
        |SELECT query_id, neighbor_id, rank, cosine FROM (
        |  SELECT sl.query_id, sl.vec_id AS neighbor_id,
        |   CAST(row_number() OVER (PARTITION BY sl.query_id
        |     ORDER BY list_cosine_similarity(q.v, n.v) DESC, sl.vec_id)
        |     AS INT) AS rank,
        |   round(list_cosine_similarity(q.v, n.v), 4) AS cosine
        |  FROM sl JOIN e q ON q.vec_id = sl.query_id
        |  JOIN e n ON n.vec_id = sl.vec_id)
        |WHERE rank <= 5""".stripMargin,
    "sim_matryoshka" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |h AS (SELECT vec_id, list_slice(v, 1, 16) AS vh FROM e),
        |q AS (SELECT vec_id AS query_id, vh AS qh FROM h
        |  WHERE vec_id < 10),
        |s AS (SELECT q.query_id, h.vec_id,
        |   list_cosine_similarity(q.qh, h.vh) AS hs
        |  FROM q JOIN h ON h.vec_id != q.query_id),
        |sl AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY hs DESC, vec_id) AS rn FROM s)
        |  WHERE rn <= 40)
        |SELECT query_id, neighbor_id, rank, cosine FROM (
        |  SELECT sl.query_id, sl.vec_id AS neighbor_id,
        |   CAST(row_number() OVER (PARTITION BY sl.query_id
        |     ORDER BY list_cosine_similarity(q.v, n.v) DESC, sl.vec_id)
        |     AS INT) AS rank,
        |   round(list_cosine_similarity(q.v, n.v), 4) AS cosine
        |  FROM sl JOIN e q ON q.vec_id = sl.query_id
        |  JOIN e n ON n.vec_id = sl.vec_id)
        |WHERE rank <= 5""".stripMargin,
    "evt_out_of_order" ->
      s"""WITH x AS (SELECT CAST(event_id % $logP AS INT) AS "partition",
        |   event_id, ts FROM events),
        |y AS (SELECT "partition", ts,
        |   max(ts) OVER (PARTITION BY "partition" ORDER BY event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM x),
        |z AS (SELECT "partition",
        |   CASE WHEN hwm IS NULL THEN 0
        |        ELSE greatest(0, date_diff('second', ts, hwm) - 600) END
        |     AS late_s
        |  FROM y)
        |SELECT "partition", count(*) AS n_events,
        | count(CASE WHEN late_s > 0 THEN 1 END) AS n_late,
        | CAST(coalesce(max(late_s), 0) AS BIGINT) AS max_late_s,
        | CAST(coalesce(sum(late_s), 0) AS BIGINT) AS total_late_s
        |FROM z GROUP BY 1""".stripMargin,
    "evt_rate_limit" ->
      """WITH x AS (SELECT event_type, value,
        |   row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |     ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT event_type, count(*) AS n_offered,
        | count(CASE WHEN rn <= 3 THEN 1 END) AS n_kept,
        | count(CASE WHEN rn > 3 THEN 1 END) AS n_throttled,
        | round(sum(CASE WHEN rn <= 3 THEN value END), 2) AS kept_value
        |FROM x GROUP BY 1""".stripMargin,
    "evt_transitions" ->
      """WITH x AS (SELECT user_id, event_type,
        |   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |     AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type, count(*) AS n_transitions,
        | count(DISTINCT user_id) AS n_users
        |FROM x WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS content_hash,
        | min(doc_id) AS keep_doc_id, count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,
    "dedup_substr" ->
      """WITH t AS (SELECT doc_id,
        |   string_split_regex(trim(text), ' +') AS w
        |  FROM documents),
        |d AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens, w
        |  FROM t),
        |p AS (SELECT doc_id, n_tokens, w,
        |   unnest(range(0, greatest(n_tokens-5, 0)+1)) AS pos
        |  FROM d),
        |sh AS (SELECT doc_id, n_tokens, pos,
        |   CAST(md5_number_lower(array_to_string(
        |     list_slice(w, CAST(pos+1 AS INT), CAST(pos+5 AS INT)), ' '))
        |     % 9223372036854775808 AS BIGINT) AS g
        |  FROM p),
        |cnt AS (SELECT g, count(*) AS c FROM sh GROUP BY 1),
        |dup AS (SELECT sh.doc_id, sh.pos,
        |   least(sh.pos + 4, sh.n_tokens - 1) AS e
        |  FROM sh JOIN cnt USING (g) WHERE cnt.c >= 2),
        |marked AS (SELECT doc_id, pos, e,
        |   max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM dup),
        |sid AS (SELECT doc_id, pos, e,
        |   sum(CASE WHEN pme IS NULL OR pos > pme + 1
        |       THEN 1 ELSE 0 END)
        |     OVER (PARTITION BY doc_id ORDER BY pos
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |     AS span_id
        |  FROM marked),
        |spans AS (SELECT doc_id, span_id, min(pos) AS s, max(e) AS ee
        |  FROM sid GROUP BY 1, 2),
        |per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |   CAST(sum(ee - s + 1) AS BIGINT) AS removed_tokens
        |  FROM spans GROUP BY 1)
        |SELECT d.doc_id, d.n_tokens,
        | coalesce(p.n_spans, 0) AS n_spans,
        | coalesce(p.removed_tokens, 0) AS removed_tokens,
        | (10000 * coalesce(p.removed_tokens, 0)) // d.n_tokens
        |   AS removed_bp
        |FROM d LEFT JOIN per_doc p USING (doc_id)""".stripMargin,
    "dedup_minhash" ->
      """WITH d AS (SELECT doc_id,
        |   list_distinct(string_split_regex(trim(text), ' +')) AS w
        |  FROM documents),
        |sig AS (SELECT doc_id, list_transform(range(0, 64), i ->
        |   list_min(list_transform(w, t ->
        |     CAST(xor(md5_number_lower(t),
        |       CASE WHEN i = 0 THEN md5_number_upper(t)
        |       ELSE CAST(((CAST(md5_number_upper(t) AS HUGEINT)
        |              * CAST(power(2, i) AS HUGEINT))
        |             % 18446744073709551616)
        |           + CAST(md5_number_upper(t) >> CAST(64 - i AS INT)
        |               AS HUGEINT) AS UBIGINT)
        |       END) % 9223372036854775808 AS BIGINT))))
        |   AS s
        |  FROM d),
        |bands AS (SELECT doc_id, CAST(b AS INT) AS band_idx,
        |   md5_number_lower(array_to_string(
        |     list_slice(s, CAST(b*8+1 AS INT), CAST(b*8+8 AS INT)), ','))
        |   AS bh
        |  FROM sig CROSS JOIN range(0, 8) t(b)),
        |bm1 AS (SELECT band_idx, bh, min(doc_id) AS br
        |  FROM bands GROUP BY 1, 2),
        |r1 AS (SELECT b.doc_id, min(m.br) AS rep
        |  FROM bands b JOIN bm1 m ON b.band_idx = m.band_idx AND b.bh = m.bh
        |  GROUP BY b.doc_id),
        |bm2 AS (SELECT b.band_idx, b.bh, min(r.rep) AS br
        |  FROM bands b JOIN r1 r ON b.doc_id = r.doc_id GROUP BY 1, 2),
        |r2 AS (SELECT b.doc_id, min(m.br) AS rep
        |  FROM bands b JOIN bm2 m ON b.band_idx = m.band_idx AND b.bh = m.bh
        |  GROUP BY b.doc_id)
        |SELECT doc_id, rep AS cluster_rep, doc_id != rep AS is_dup
        |FROM r2""".stripMargin,
    "dedup_incremental" ->
      """WITH d AS (SELECT doc_id,
        |   list_distinct(string_split_regex(trim(text), ' +')) AS w
        |  FROM documents),
        |sig AS (SELECT doc_id, list_transform(range(0, 64), i ->
        |   list_min(list_transform(w, t ->
        |     CAST(xor(md5_number_lower(t),
        |       CASE WHEN i = 0 THEN md5_number_upper(t)
        |       ELSE CAST(((CAST(md5_number_upper(t) AS HUGEINT)
        |              * CAST(power(2, i) AS HUGEINT))
        |             % 18446744073709551616)
        |           + CAST(md5_number_upper(t) >> CAST(64 - i AS INT)
        |               AS HUGEINT) AS UBIGINT)
        |       END) % 9223372036854775808 AS BIGINT))))
        |   AS s
        |  FROM d),
        |bands AS (SELECT doc_id, CAST(b AS INT) AS band_idx,
        |   md5_number_lower(array_to_string(
        |     list_slice(s, CAST(b*8+1 AS INT), CAST(b*8+8 AS INT)), ','))
        |   AS bh
        |  FROM sig CROSS JOIN range(0, 8) t(b)),
        |hs AS (SELECT doc_id, md5(lower(trim(text))) AS ch FROM documents),
        |b AS (SELECT bands.doc_id, band_idx, bh
        |  FROM bands WHERE bands.doc_id % 4 = 0),
        |c AS (SELECT bands.doc_id AS corpus_doc, band_idx, bh
        |  FROM bands WHERE bands.doc_id % 4 != 0),
        |bb AS (SELECT doc_id, ch FROM hs WHERE doc_id % 4 = 0),
        |ex AS (SELECT DISTINCT ch FROM hs WHERE doc_id % 4 != 0),
        |j AS (SELECT b.doc_id,
        |   count(DISTINCT c.corpus_doc) AS n_corpus_matches
        |  FROM b LEFT JOIN c ON b.band_idx = c.band_idx AND b.bh = c.bh
        |  GROUP BY b.doc_id)
        |SELECT j.doc_id, n_corpus_matches,
        | (ex.ch IS NOT NULL) AS is_exact_dup,
        | CASE WHEN ex.ch IS NOT NULL THEN 'exact_dup'
        |      WHEN n_corpus_matches > 0 THEN 'near_dup'
        |      ELSE 'keep' END AS decision
        |FROM j JOIN bb ON j.doc_id = bb.doc_id
        |LEFT JOIN ex ON bb.ch = ex.ch""".stripMargin,
    // Closure oracle over the band graph. The naive formulation (doc-doc
    // clique edges per bucket + full transitive closure) is Σk² reach
    // pairs × clique degree — the regenerated corpus chains 96% of docs
    // into ONE component and the old oracle ran >75 min at sf0.1 without
    // finishing. Exact reformulation: (1) star-rewire each band bucket
    // through its min member (components-invariant quotient of the same
    // graph), (2) 16 unrolled min-label + pointer-jump rounds (each
    // label provably stays inside its component and only decreases;
    // displacement doubles per round, so 2^16 covers any diameter
    // here), (3) finish with the reach recursion on the CONTRACTED
    // label graph — exact for ANY number of rounds by the quotient
    // argument, and trivially small once the rounds have collapsed the
    // giant component.
    "dedup_components" -> {
      val rounds = (1 to 16).map { k =>
        s"""n$k AS MATERIALIZED (SELECT v, min(l) AS l FROM (
           |  SELECT v, l FROM l${k - 1}
           |  UNION ALL
           |  SELECT e.b AS v, p.l FROM edges e JOIN l${k - 1} p ON p.v = e.a)
           | GROUP BY v),
           |l$k AS MATERIALIZED (SELECT n.v, m.l FROM n$k n JOIN n$k m ON m.v = n.l)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE
         |d AS (SELECT doc_id,
         |   list_distinct(string_split_regex(trim(text), ' +')) AS w
         |  FROM documents),
         |sig AS (SELECT doc_id, list_transform(range(0, 64), i ->
         |   list_min(list_transform(w, t ->
         |     CAST(xor(md5_number_lower(t),
         |       CASE WHEN i = 0 THEN md5_number_upper(t)
         |       ELSE CAST(((CAST(md5_number_upper(t) AS HUGEINT)
         |              * CAST(power(2, i) AS HUGEINT))
         |             % 18446744073709551616)
         |           + CAST(md5_number_upper(t) >> CAST(64 - i AS INT)
         |               AS HUGEINT) AS UBIGINT)
         |       END) % 9223372036854775808 AS BIGINT))))
         |   AS s
         |  FROM d),
         |bands AS (SELECT doc_id, CAST(b AS INT) AS band_idx,
         |   md5_number_lower(array_to_string(
         |     list_slice(s, CAST(b*8+1 AS INT), CAST(b*8+8 AS INT)), ','))
         |   AS bh
         |  FROM sig CROSS JOIN range(0, 8) t(b)),
         |star AS MATERIALIZED (SELECT band_idx, bh, min(doc_id) AS hub
         |  FROM bands GROUP BY 1, 2),
         |e0 AS MATERIALIZED (SELECT DISTINCT s.hub AS a, b.doc_id AS b
         |  FROM bands b JOIN star s USING (band_idx, bh)
         |  WHERE s.hub != b.doc_id),
         |edges AS MATERIALIZED (SELECT a, b FROM e0 UNION SELECT b AS a, a AS b FROM e0),
         |l0 AS MATERIALIZED (SELECT doc_id AS v, doc_id AS l FROM d),
         |$rounds,
         |cedges AS MATERIALIZED (SELECT DISTINCT la.l AS a, lb.l AS b
         |  FROM edges e JOIN l16 la ON la.v = e.a JOIN l16 lb ON lb.v = e.b
         |  WHERE la.l != lb.l),
         |reach(src, dst) AS (
         |  SELECT l AS src, l AS dst FROM (SELECT DISTINCT l FROM l16)
         |  UNION
         |  SELECT r.src, c.b AS dst FROM reach r JOIN cedges c ON r.dst = c.a),
         |cmin AS (SELECT src, min(dst) AS m FROM reach GROUP BY src)
         |SELECT l16.v AS doc_id, cmin.m AS component,
         | cmin.m != l16.v AS is_dup
         |FROM l16 JOIN cmin ON cmin.src = l16.l""".stripMargin
    },
    "dedup_ngram_slice" ->
      """WITH d AS (SELECT doc_id, source,
        |   list_distinct(string_split_regex(trim(text), ' +')) AS w
        |  FROM documents WHERE doc_id % 16 = 0)
        |SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
        | round(len(list_intersect(a.w, b.w))::DOUBLE
        |   / len(list_distinct(list_concat(a.w, b.w))), 4) AS jaccard
        |FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.w, b.w))::DOUBLE
        |   / len(list_distinct(list_concat(a.w, b.w))) >= 0.9""".stripMargin,
    "dedup_ngram" ->
      """WITH d AS (SELECT doc_id, source,
        |   list_distinct(string_split_regex(trim(text), ' +')) AS w
        |  FROM documents)
        |SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
        | round(len(list_intersect(a.w, b.w))::DOUBLE
        |   / len(list_distinct(list_concat(a.w, b.w))), 4) AS jaccard
        |FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.w, b.w))::DOUBLE
        |   / len(list_distinct(list_concat(a.w, b.w))) >= 0.9""".stripMargin,
    "dedup_embed" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings)
        |SELECT a.vec_id AS vec_id_1, b.vec_id AS vec_id_2,
        | round(list_cosine_similarity(a.v, b.v), 4) AS cosine
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.35""".stripMargin,
    "sim_threshold_sweep" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |p AS (SELECT round(list_cosine_similarity(a.v, b.v), 4) AS cos
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.10),
        |b AS (SELECT (CAST(round(round(cos, 4) * 10000) AS BIGINT) // 500)
        |   * 500 AS bucket_lo_bp FROM p),
        |h AS (SELECT bucket_lo_bp, count(*) AS n_pairs FROM b GROUP BY 1)
        |SELECT bucket_lo_bp, n_pairs,
        | CAST(sum(n_pairs) OVER (ORDER BY bucket_lo_bp DESC
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS n_pairs_ge
        |FROM h""".stripMargin,
    "graph_components" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS a, b.vec_id AS b
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.35),
        |sym AS (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
        |reach(src, dst) AS (
        |  SELECT vec_id AS src, vec_id AS dst FROM embeddings
        |  UNION
        |  SELECT r.src, s.b AS dst FROM reach r JOIN sym s ON r.dst = s.a)
        |SELECT src AS vec_id, min(dst) AS component
        |FROM reach GROUP BY 1""".stripMargin,
    "graph_triangles" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS a, b.vec_id AS b
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.2),
        |tri AS (SELECT p1.a AS x, p1.b AS y, p2.b AS z
        |  FROM p p1 JOIN p p2 ON p1.b = p2.a
        |  JOIN p p3 ON p3.a = p1.a AND p3.b = p2.b)
        |SELECT vec_id, count(*) AS n_triangles
        |FROM (SELECT unnest([x, y, z]) AS vec_id FROM tri)
        |GROUP BY 1""".stripMargin,
    "graph_clustco" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS a, b.vec_id AS b
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.2),
        |tri AS (SELECT p1.a AS x, p1.b AS y, p2.b AS z
        |  FROM p p1 JOIN p p2 ON p1.b = p2.a
        |  JOIN p p3 ON p3.a = p1.a AND p3.b = p2.b),
        |t AS (SELECT vec_id, count(*) AS nt
        |  FROM (SELECT unnest([x, y, z]) AS vec_id FROM tri) GROUP BY 1),
        |d AS (SELECT vec_id, count(*) AS dg
        |  FROM (SELECT a AS vec_id FROM p
        |        UNION ALL SELECT b AS vec_id FROM p) GROUP BY 1),
        |n AS (SELECT e.vec_id, coalesce(d.dg, 0) AS dg,
        |   coalesce(t.nt, 0) AS nt
        |  FROM e LEFT JOIN d USING (vec_id) LEFT JOIN t USING (vec_id))
        |SELECT CAST(CASE WHEN dg < 2 THEN -1
        |   ELSE ((10000 * 2 * nt) // (dg * (dg - 1))) // 1000 END
        |   AS BIGINT) AS bucket,
        | CAST(count(*) AS BIGINT) AS n_nodes
        |FROM n GROUP BY 1""".stripMargin,
    "q_collect_list" ->
      """SELECT n_name, count(*) AS n_suppliers,
        | array_to_string(list_sort(list_distinct(list(s_name))), ',')
        |   AS supplier_roster
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "sim_brute_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10)
        |SELECT query_id, neighbor_id, rank, cosine FROM (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |   CAST(row_number() OVER (PARTITION BY q.query_id
        |     ORDER BY list_cosine_similarity(q.qv, e.v) DESC, e.vec_id)
        |     AS INT) AS rank,
        |   round(list_cosine_similarity(q.qv, e.v), 4) AS cosine
        |  FROM q JOIN e ON q.query_id != e.vec_id)
        |WHERE rank <= 5""".stripMargin,
    "sim_hybrid_rrf" ->
      """WITH tok AS (SELECT doc_id,
        |   unnest(string_split_regex(trim(text), ' +')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id,
        |   CAST(md5_number_lower(w) % 9223372036854775808 AS BIGINT) AS h,
        |   count(*) AS tf FROM tok GROUP BY 1, 2),
        |n AS (SELECT count(*) AS n FROM documents),
        |idf AS (SELECT h,
        |   CAST(((n - df + 1) * 10000) // (df + 1) AS BIGINT) AS idf_bp
        |  FROM (SELECT h, count(*) AS df FROM tf GROUP BY 1) CROSS JOIN n
        |  WHERE df <= 65536),
        |qs AS (SELECT query_id, h, tfq, idf_bp FROM (
        |   SELECT t.doc_id AS query_id, t.h, t.tf AS tfq, i.idf_bp,
        |     row_number() OVER (PARTITION BY t.doc_id
        |       ORDER BY i.idf_bp DESC, t.h) AS r
        |   FROM tf t JOIN idf i USING (h) WHERE t.doc_id < 10)
        |  WHERE r <= 20),
        |lex AS (SELECT q.query_id, t.doc_id,
        |   CAST(sum(least(q.tfq, t.tf) * q.idf_bp) AS BIGINT) AS score
        |  FROM qs q JOIN tf t USING (h) WHERE t.doc_id != q.query_id
        |  GROUP BY 1, 2),
        |lexr AS (SELECT query_id, doc_id, lex_rank FROM (
        |   SELECT query_id, doc_id,
        |     CAST(row_number() OVER (PARTITION BY query_id
        |       ORDER BY score DESC, doc_id) AS INT) AS lex_rank FROM lex)
        |  WHERE lex_rank <= 20),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |qv AS (SELECT vec_id AS query_id, v AS qvec FROM e
        |  WHERE vec_id < 10),
        |vecr AS (SELECT query_id, doc_id, vec_rank FROM (
        |   SELECT q.query_id, e.vec_id AS doc_id,
        |     CAST(row_number() OVER (PARTITION BY q.query_id
        |       ORDER BY list_cosine_similarity(q.qvec, e.v) DESC,
        |                e.vec_id) AS INT) AS vec_rank
        |   FROM qv q JOIN e ON q.query_id != e.vec_id)
        |  WHERE vec_rank <= 20),
        |f AS (SELECT coalesce(l.query_id, v.query_id) AS query_id,
        |   coalesce(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
        |   CAST(coalesce(1000000 // (60 + l.lex_rank), 0)
        |      + coalesce(1000000 // (60 + v.vec_rank), 0) AS BIGINT)
        |     AS rrf_e6
        |  FROM lexr l FULL JOIN vecr v
        |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
        |SELECT query_id, doc_id, rank, rrf_e6, lex_rank, vec_rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_e6 DESC, doc_id) AS INT) AS rank FROM f)
        |WHERE rank <= 10""".stripMargin,
    "q_promo_effect" ->
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |   THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
        |   / sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_revenue_pct,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue,
        | count(*) AS n_lineitems
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'""".stripMargin,
    "q_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 25""".stripMargin,
    "q_except" ->
      """SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus='F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus='O'""".stripMargin,
    "sim_centroids" ->
      """SELECT label, CAST(i - 1 AS INT) AS dim_idx,
        | round(avg(CAST(embedding[i] AS DOUBLE)), 4) AS centroid_val,
        | count(*) AS n_vectors
        |FROM embeddings CROSS JOIN range(1, 65) t(i)
        |GROUP BY 1, 2""".stripMargin,
    "sim_index_profile" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |cd AS (SELECT label, i, avg(v[CAST(i AS INT)]) AS m
        |  FROM e CROSS JOIN range(1, 65) t(i) GROUP BY 1, 2),
        |cent AS (SELECT label, list(m ORDER BY i) AS cv FROM cd GROUP BY 1),
        |g AS (SELECT e.label AS cell, count(*) AS n_vectors,
        |   round(sum(round(list_cosine_similarity(e.v, c.cv), 4)), 4)
        |     AS coherence
        |  FROM e JOIN cent c ON e.label = c.label GROUP BY 1),
        |t AS (SELECT sum(n_vectors) AS total,
        |   sum(CAST(n_vectors AS HUGEINT) * n_vectors) AS sumsq FROM g)
        |SELECT cell, n_vectors,
        | CAST((10000 * n_vectors) // total AS BIGINT) AS share_bp,
        | CAST((CAST(10000 AS HUGEINT) * n_vectors * n_vectors) // sumsq
        |   AS BIGINT) AS scan_bp,
        | coherence
        |FROM g, t""".stripMargin,
    "q_stats" ->
      """SELECT l_returnflag,
        | round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
        | round(stddev_samp(l_quantity), 4) AS qty_stddev,
        | round(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
        | round(avg(l_quantity), 4) AS qty_avg,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,
    "q_unpivot" ->
      """WITH m AS (
        | SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        | UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        | UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        | UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT measure, count(*) AS n_values,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |   / count(*), 4) AS mean
        |FROM m GROUP BY measure""".stripMargin,
    "q_date_dim" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        | CAST(quarter(o_orderdate) AS INT) AS o_quarter,
        | CAST(month(o_orderdate) AS INT) AS o_month,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY 1, 2, 3""".stripMargin,
    "q_multi_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers,
        | count(DISTINCT o_orderpriority) AS n_priorities,
        | count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS name_upper,
        | substring(c_name, 1, 8) AS name_prefix,
        | replace(c_name, '#', '-') AS name_dashed,
        | lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
        | c_mktsegment || '/' || c_name AS seg_name,
        | CAST(length(c_name) AS INT) AS name_len,
        | reverse(c_name) AS name_rev
        |FROM customer""".stripMargin,
    "q_array_funcs" ->
      """WITH d AS (SELECT doc_id,
        |   string_split_regex(trim(text), ' +') AS w FROM documents)
        |SELECT doc_id,
        | CAST(len(w) AS INT) AS n_words,
        | CAST(len(list_distinct(w)) AS INT) AS n_distinct,
        | array_to_string(list_slice(w, 1, 3), '|') AS first3,
        | list_min(w) AS min_word,
        | list_max(w) AS max_word,
        | list_contains(w, 'the') AS has_the,
        | CAST(coalesce(list_position(w, 'data'), 0) AS INT) AS pos_data,
        | w[-1] AS last_word
        |FROM d""".stripMargin,
    "q_range_join" ->
      """SELECT tier, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |   AS revenue
        |FROM orders JOIN (VALUES
        |  ('T1_budget',  0.0,      100000.0),
        |  ('T2_mid',     100000.0, 200000.0),
        |  ('T3_high',    200000.0, 300000.0),
        |  ('T4_premium', 300000.0, 400000.0),
        |  ('T5_top',     400000.0, 1e18)) t(tier, lo, hi)
        | ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY tier""".stripMargin,
    "evt_first_last" ->
      """WITH x AS (SELECT user_id, event_type, value, ts, event_id,
        |   first_value(event_type) OVER w AS first_type,
        |   last_value(event_type) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |     AS last_type,
        |   first_value(value) OVER w AS fv,
        |   last_value(value) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |     AS lv,
        |   row_number() OVER w AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, first_type, last_type,
        | round(fv, 2) AS first_val, round(lv, 2) AS last_val
        |FROM x WHERE rn = 1""".stripMargin,
    "evt_funnel" ->
      """WITH u AS (SELECT user_id,
        |   min(CASE WHEN event_type='view' THEN ts END) AS tv,
        |   min(CASE WHEN event_type='click' THEN ts END) AS tc,
        |   min(CASE WHEN event_type='purchase' THEN ts END) AS tp
        |  FROM events GROUP BY user_id)
        |SELECT count(tv) AS n_view,
        | count(CASE WHEN tc > tv THEN 1 END) AS n_view_then_click,
        | count(CASE WHEN tc > tv AND tp > tc THEN 1 END) AS n_full_funnel
        |FROM u""".stripMargin,
    "evt_retention" ->
      """WITH f AS (SELECT user_id,
        |   CAST(date_trunc('day', min(ts)) AS DATE) AS cohort_day
        |  FROM events GROUP BY user_id)
        |SELECT cohort_day,
        | CAST(date_diff('day', cohort_day,
        |   CAST(date_trunc('day', e.ts) AS DATE)) AS INT) AS day_offset,
        | count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin,
    "q_gap_fill" ->
      """WITH span AS (SELECT date_trunc('month', min(o_orderdate)) AS lo,
        |   date_trunc('month', max(o_orderdate)) AS hi FROM orders),
        |months AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH))
        |   AS month_start FROM span),
        |statuses AS (SELECT DISTINCT o_orderstatus FROM orders),
        |actual AS (SELECT date_trunc('month', o_orderdate) AS m,
        |   o_orderstatus AS s, count(*) AS n,
        |   round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY 1, 2)
        |SELECT CAST(month_start AS TIMESTAMP) AS month_start, o_orderstatus,
        | coalesce(n, 0) AS n_orders, coalesce(rev, 0.0) AS revenue
        |FROM months CROSS JOIN statuses
        |LEFT JOIN actual ON m = month_start AND s = o_orderstatus""".stripMargin,
    "evt_value_buckets" ->
      """SELECT event_type, CAST(floor(value/10.0) AS BIGINT) AS bucket,
        | count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "pipeline_prep" ->
      """WITH h AS (SELECT *, md5(lower(trim(text))) AS content_hash
        |  FROM documents),
        |k AS (SELECT *, row_number() OVER (PARTITION BY content_hash
        |   ORDER BY doc_id) AS rn FROM h),
        |d AS (SELECT source, n_chars,
        |   CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
        |     AS n_tokens, lang
        |  FROM k WHERE rn = 1)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        | round(avg(n_chars), 2) AS avg_chars
        |FROM d WHERE n_tokens >= 20 AND lang = 'en'
        |GROUP BY source""".stripMargin,
    "pipeline_pack" ->
      """WITH d AS (SELECT doc_id, source,
        |   CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT)
        |     AS n_tokens,
        |   doc_id // 1000 AS shard
        |  FROM documents),
        |c AS (SELECT *, coalesce(sum(n_tokens) OVER (
        |   PARTITION BY source, shard ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |   AS cum_before FROM d)
        |SELECT source, shard,
        | CAST(cum_before // 512 AS BIGINT) AS context_id,
        | count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1, 2, 3""".stripMargin,
    "dedup_cluster_stats" ->
      """WITH c AS (SELECT md5(lower(trim(text))) AS h,
        |   count(*) AS cluster_size FROM documents GROUP BY 1)
        |SELECT cluster_size, count(*) AS n_clusters,
        | cluster_size * count(*) AS n_docs_total
        |FROM c GROUP BY cluster_size""".stripMargin,
    "txt_bigrams" ->
      """WITH w AS (SELECT lang, string_split_regex(trim(text), ' +') AS words
        |  FROM documents),
        |b AS (SELECT lang, unnest(list_transform(range(1, len(words)),
        |   i -> words[i] || ' ' || words[i+1])) AS bigram FROM w),
        |c AS (SELECT lang, bigram, count(*) AS n FROM b GROUP BY 1, 2),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang
        |   ORDER BY n DESC, bigram) AS INT) AS rank FROM c)
        |SELECT lang, bigram, n, rank FROM r WHERE rank <= 10""".stripMargin,
    "evt_moving_agg" ->
      """SELECT event_id, event_type,
        | count(*) OVER w AS n_last_hour,
        | round(sum(value) OVER w, 2) AS sum_last_hour
        |FROM (SELECT *, epoch_ns(ts)//1000000000 AS ts_s FROM events)
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts_s
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin,
    "evt_error_routing" ->
      """SELECT event_type,
        | count(json_extract_string(props, '$.k')) AS n_ok,
        | count(CASE WHEN json_extract_string(props, '$.k') IS NULL
        |   THEN 1 END) AS n_dead,
        | min(CASE WHEN json_extract_string(props, '$.k') IS NULL
        |   THEN event_id END) AS first_dead_id,
        | max(CASE WHEN json_extract_string(props, '$.k') IS NULL
        |   THEN event_id END) AS last_dead_id
        |FROM events GROUP BY event_type""".stripMargin,
    "evt_anomaly" ->
      """WITH s AS (SELECT event_type AS t, avg(value) AS mu,
        |   stddev_samp(value) AS sigma FROM events GROUP BY 1)
        |SELECT event_id, event_type, round(value, 2) AS value
        |FROM events JOIN s ON event_type = t
        |WHERE value > mu + 3 * sigma""".stripMargin,
    "evt_interarrival" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |   epoch_us(ts) AS us FROM events),
        |g AS (SELECT event_type,
        |   us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |     AS gap_us
        |  FROM e),
        |b AS (SELECT event_type,
        |   CASE WHEN gap_us < 1000000 THEN 'a_lt_1s'
        |        WHEN gap_us < 10000000 THEN 'b_1_10s'
        |        WHEN gap_us < 60000000 THEN 'c_10_60s'
        |        WHEN gap_us < 600000000 THEN 'd_1_10min'
        |        ELSE 'e_ge_10min' END AS bucket, gap_us
        |  FROM g WHERE gap_us IS NOT NULL)
        |SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n_gaps,
        | CAST(min(gap_us) AS BIGINT) AS min_gap_us,
        | CAST(max(gap_us) AS BIGINT) AS max_gap_us
        |FROM b GROUP BY 1, 2""".stripMargin,
    "evt_cdc_apply" ->
      """WITH c AS (SELECT user_id, ts, event_id, event_type, value,
        |   CASE WHEN event_type = 'signup' THEN 'I'
        |        WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        |  FROM events),
        |r AS (SELECT user_id, event_type, value, op,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY ts DESC, event_id DESC) AS rn,
        |   count(*) OVER (PARTITION BY user_id) AS n_ops
        |  FROM c)
        |SELECT user_id, event_type AS final_type, value AS final_value,
        | CAST(n_ops AS BIGINT) AS n_ops
        |FROM r WHERE rn = 1 AND op != 'D'""".stripMargin,
    "graph_jaccard" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS a, b.vec_id AS b
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.35),
        |sym AS (SELECT a, b FROM p UNION ALL SELECT b AS a, a AS b FROM p),
        |deg AS (SELECT a, count(*) AS deg FROM sym GROUP BY 1),
        |cn AS (SELECT e1.a AS u, e2.a AS v2, count(*) AS common
        |  FROM sym e1 JOIN sym e2 ON e1.b = e2.b AND e1.a < e2.a
        |  GROUP BY 1, 2),
        |j AS (SELECT common, du.deg + dv.deg - common AS un
        |  FROM cn JOIN deg du ON cn.u = du.a JOIN deg dv ON cn.v2 = dv.a)
        |SELECT CAST(((10000 * common) // un) // 1000 AS BIGINT) AS bucket,
        | CAST(count(*) AS BIGINT) AS n_pairs
        |FROM j GROUP BY 1""".stripMargin,
    "graph_kcore" -> {
      // Replays the engine exactly: the sim_knn_graph oracle's top-5
      // per-cell cosine neighbors -> mutual restriction (edge kept iff
      // its reverse is also a knn edge) -> staged peel rounds (the
      // dedup_components technique). Oracle round count == the
      // engine's 30-round guard: the engine peels to a FIXPOINT, so
      // excess oracle rounds are no-ops, and any cascade the engine
      // CAN finish (depth < 30 — deeper raises, never returns) is
      // replayed fully. Fewer rounds here would under-peel the oracle
      // on deep cascades and red-flag a correct engine result.
      val rounds = (1 to 30).map { k =>
        s"""r$k AS MATERIALIZED (SELECT a FROM s${k - 1}
           |  GROUP BY a HAVING count(*) >= 3),
           |s$k AS MATERIALIZED (SELECT s.a, s.b FROM s${k - 1} s
           |  JOIN r$k x ON s.a = x.a JOIN r$k y ON s.b = y.a)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH $mutualKnnPrefixSql,
         |$rounds,
         |core AS (SELECT a AS vec_id, count(*) AS core_degree
         |  FROM s30 GROUP BY 1)
         |SELECT e.vec_id,
         | CAST(coalesce(c.core_degree, 0) AS BIGINT) AS core_degree
         |FROM e LEFT JOIN core c USING (vec_id)""".stripMargin
    },
    "mm_blob_pack" ->
      """WITH d AS (SELECT doc_id, source, doc_id // 1000 AS shard,
        |   CAST(octet_length(encode(text)) AS BIGINT) AS bytes
        |  FROM documents),
        |c AS (SELECT *, coalesce(sum(bytes) OVER (
        |   PARTITION BY source, shard ORDER BY doc_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |     AS cum_before
        |  FROM d)
        |SELECT source, CAST(shard AS BIGINT) AS shard,
        | CAST(cum_before // 4096 AS BIGINT) AS archive_id,
        | CAST(count(*) AS BIGINT) AS n_blobs,
        | CAST(sum(bytes) AS BIGINT) AS archive_bytes,
        | CAST(max(bytes) AS BIGINT) AS max_blob_bytes
        |FROM c GROUP BY 1, 2, 3""".stripMargin,
    "mm_chunk_refcount" ->
      """WITH c AS (SELECT unnest(list_transform(
        |   range(0, CAST(greatest(1, ceil(length(text)/64.0)) AS INT)),
        |   i -> substr(text, i*64 + 1, 64))) AS chunk
        |  FROM documents),
        |h AS (SELECT md5(chunk) AS h, count(*) AS refcount,
        |   CAST(max(length(chunk)) AS BIGINT) AS chunk_bytes
        |  FROM c GROUP BY 1)
        |SELECT refcount, CAST(count(*) AS BIGINT) AS n_chunks,
        | CAST(sum((refcount - 1) * chunk_bytes) AS BIGINT) AS dup_bytes
        |FROM h GROUP BY 1""".stripMargin,
    "mm_chunk_dedup" ->
      """WITH c AS (SELECT source, unnest(list_transform(
        |   range(0, CAST(greatest(1, ceil(length(text)/64.0)) AS INT)),
        |   i -> md5(substr(text, i*64 + 1, 64)))) AS chunk_hash
        |  FROM documents)
        |SELECT source, count(*) AS n_chunks,
        | count(DISTINCT chunk_hash) AS n_distinct_chunks,
        | round(count(DISTINCT chunk_hash)::DOUBLE / count(*), 4)
        |   AS uniq_ratio
        |FROM c GROUP BY source""".stripMargin,
    "mm_binary_meta" ->
      """SELECT source, count(*) AS n_blobs,
        | CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        | count(DISTINCT md5(text)) AS n_checksums
        |FROM documents GROUP BY source""".stripMargin,
    "txt_langid" ->
      """WITH d AS (SELECT doc_id, lang,
        |   string_split_regex(trim(text), ' +') AS words FROM documents),
        |s AS (
        | SELECT doc_id, lang, 'en' AS cand,
        |   len(list_intersect(words, ['the','a','of','and','is'])) AS score FROM d
        | UNION ALL SELECT doc_id, lang, 'es',
        |   len(list_intersect(words, ['el','la','de','que','y'])) FROM d
        | UNION ALL SELECT doc_id, lang, 'de',
        |   len(list_intersect(words, ['der','die','und','das','ist'])) FROM d
        | UNION ALL SELECT doc_id, lang, 'fr',
        |   len(list_intersect(words, ['le','la','et','les','des'])) FROM d
        | UNION ALL SELECT doc_id, lang, 'zh',
        |   len(list_intersect(words, ['的','是','了','在','我'])) FROM d),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |   ORDER BY score DESC, cand DESC) AS rn FROM s)
        |SELECT doc_id, lang, cand AS predicted_lang, cand = lang AS correct
        |FROM r WHERE rn = 1""".stripMargin,
    // blocking-recall audit: exact truth pairs on the 25% audit slice,
    // then the band/chunk relations REJOINED onto the truth pairs (the
    // engine's linear caught-test, replayed literally), rolled up per
    // (method, threshold)
    "dedup_recall_eval" ->
      """WITH sdoc AS (SELECT doc_id, source, text FROM documents
        |  WHERE doc_id % 4 = 0),
        |d AS (SELECT doc_id, source,
        |   list_distinct(string_split_regex(trim(text), ' +')) AS w
        |  FROM sdoc),
        |truth AS (SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2,
        |   CAST(round(round(len(list_intersect(a.w, b.w))::DOUBLE
        |       / len(list_distinct(list_concat(a.w, b.w))), 4) * 10000)
        |     AS BIGINT) AS j_bp
        |  FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.w, b.w))::DOUBLE
        |     / len(list_distinct(list_concat(a.w, b.w))) >= 0.7),
        |sig AS (SELECT doc_id, list_transform(range(0, 64), i ->
        |   list_min(list_transform(w, t ->
        |     CAST(xor(md5_number_lower(t),
        |       CASE WHEN i = 0 THEN md5_number_upper(t)
        |       ELSE CAST(((CAST(md5_number_upper(t) AS HUGEINT)
        |              * CAST(power(2, i) AS HUGEINT))
        |             % 18446744073709551616)
        |           + CAST(md5_number_upper(t) >> CAST(64 - i AS INT)
        |               AS HUGEINT) AS UBIGINT)
        |       END) % 9223372036854775808 AS BIGINT))))
        |   AS s
        |  FROM d),
        |bands AS (SELECT doc_id, CAST(b AS INT) AS band_idx,
        |   md5_number_lower(array_to_string(
        |     list_slice(s, CAST(b*8+1 AS INT), CAST(b*8+8 AS INT)), ','))
        |   AS bh
        |  FROM sig CROSS JOIN range(0, 8) t(b)),
        |hh AS (SELECT doc_id, list_transform(w, t -> md5_number_lower(t))
        |   AS wh FROM d),
        |sbits AS (SELECT doc_id, list_transform(range(0, 64), i ->
        |   CASE WHEN list_sum(list_transform(wh,
        |     h -> CAST((h >> i) & 1 AS INT) * 2 - 1)) > 0
        |   THEN 1 ELSE 0 END) AS bits FROM hh),
        |e AS (SELECT doc_id, CAST(k AS INT) AS chunk_idx,
        |   CAST(list_sum(list_transform(range(0, 16), b ->
        |     CAST(bits[CAST(k*16 + b + 1 AS INT)] AS BIGINT) << b))
        |     AS BIGINT) AS chunk_val
        |  FROM sbits CROSS JOIN range(0, 4) t(k)),
        |mh AS (SELECT DISTINCT t.doc_id_1, t.doc_id_2,
        |   'minhash_lsh' AS method
        |  FROM truth t JOIN bands x ON x.doc_id = t.doc_id_1
        |  JOIN bands y ON y.doc_id = t.doc_id_2
        |    AND y.band_idx = x.band_idx AND y.bh = x.bh),
        |sh AS (SELECT DISTINCT t.doc_id_1, t.doc_id_2,
        |   'simhash_chunk' AS method
        |  FROM truth t JOIN e x ON x.doc_id = t.doc_id_1
        |  JOIN e y ON y.doc_id = t.doc_id_2
        |    AND y.chunk_idx = x.chunk_idx AND y.chunk_val = x.chunk_val),
        |caught AS (SELECT * FROM mh UNION ALL SELECT * FROM sh),
        |th AS (SELECT CAST(unnest([7000, 8000, 9000]) AS BIGINT)
        |   AS threshold_bp),
        |m AS (SELECT unnest(['minhash_lsh', 'simhash_chunk']) AS method),
        |tt AS (SELECT threshold_bp, count(*) AS n_truth_pairs
        |  FROM truth CROSS JOIN th WHERE j_bp >= threshold_bp GROUP BY 1),
        |ct AS (SELECT method, threshold_bp, count(*) AS n_caught
        |  FROM truth JOIN caught USING (doc_id_1, doc_id_2)
        |  CROSS JOIN th WHERE j_bp >= threshold_bp GROUP BY 1, 2)
        |SELECT m.method, th.threshold_bp,
        | coalesce(tt.n_truth_pairs, 0) AS n_truth_pairs,
        | coalesce(ct.n_caught, 0) AS n_caught,
        | CASE WHEN coalesce(tt.n_truth_pairs, 0) = 0
        |   THEN CAST(10000 AS BIGINT)
        |   ELSE (10000 * coalesce(ct.n_caught, 0)) // tt.n_truth_pairs
        | END AS recall_bp
        |FROM m CROSS JOIN th
        |LEFT JOIN tt ON tt.threshold_bp = th.threshold_bp
        |LEFT JOIN ct ON ct.method = m.method
        |  AND ct.threshold_bp = th.threshold_bp""".stripMargin,
    "dedup_simhash" ->
      """WITH d AS (SELECT doc_id,
        |   list_distinct(string_split_regex(trim(text), ' +')) AS w
        |  FROM documents),
        |hh AS (SELECT doc_id, list_transform(w, t -> md5_number_lower(t)) AS wh
        |  FROM d),
        |s AS (SELECT doc_id, list_transform(range(0, 64), i ->
        |   CASE WHEN list_sum(list_transform(wh,
        |     h -> CAST((h >> i) & 1 AS INT) * 2 - 1)) > 0
        |   THEN 1 ELSE 0 END) AS bits FROM hh),
        |c AS (SELECT doc_id, list_transform(range(0, 4), k ->
        |   CAST(list_sum(list_transform(range(0, 16), b ->
        |     CAST(bits[CAST(k*16 + b + 1 AS INT)] AS BIGINT) << b)) AS BIGINT))
        |   AS chunks FROM s),
        |e AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        |   chunks[CAST(i + 1 AS INT)] AS chunk_val
        |  FROM c CROSS JOIN range(0, 4) t(i)),
        |p AS (SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
        |  FROM e a JOIN e b ON a.chunk_idx = b.chunk_idx
        |    AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_id_1, doc_id_2, hamming FROM (
        |  SELECT p.doc_id_1, p.doc_id_2,
        |    CAST(bit_count(xor(ca.chunks[1], cb.chunks[1]))
        |       + bit_count(xor(ca.chunks[2], cb.chunks[2]))
        |       + bit_count(xor(ca.chunks[3], cb.chunks[3]))
        |       + bit_count(xor(ca.chunks[4], cb.chunks[4])) AS INT) AS hamming
        |  FROM p JOIN c ca ON ca.doc_id = p.doc_id_1
        |         JOIN c cb ON cb.doc_id = p.doc_id_2)
        |WHERE hamming <= 3""".stripMargin,
    "txt_fingerprint" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS w
        |  FROM documents),
        |h AS (SELECT doc_id,
        |   list_transform(range(0, greatest(len(w) - 4, 0) + 1), i ->
        |     CAST(md5_number_lower(array_to_string(
        |       list_slice(w, CAST(i + 1 AS INT), CAST(i + 4 AS INT)), ' '))
        |       & 9223372036854775807 AS BIGINT)) AS hs FROM d),
        |f AS (SELECT doc_id, list_distinct(
        |   list_transform(range(0, greatest(len(hs) - 4, 0) + 1), j ->
        |     list_min(list_slice(hs, CAST(j + 1 AS INT), CAST(j + 4 AS INT)))))
        |   AS fps FROM h)
        |SELECT doc_id, CAST(len(fps) AS INT) AS n_fingerprints,
        | list_min(fps) AS min_fp, list_max(fps) AS max_fp
        |FROM f""".stripMargin,
    "sim_knn_graph" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings)
        |SELECT vec_id, neighbor_id, rank, cosine FROM (
        |  SELECT a.vec_id, b.vec_id AS neighbor_id,
        |   CAST(row_number() OVER (PARTITION BY a.vec_id
        |     ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id)
        |     AS INT) AS rank,
        |   round(list_cosine_similarity(a.v, b.v), 4) AS cosine
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id != b.vec_id)
        |WHERE rank <= 5""".stripMargin,
    "sim_ivf_ann" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |cd AS (SELECT label, i, avg(v[CAST(i AS INT)]) AS m
        |  FROM e CROSS JOIN range(1, 65) t(i) GROUP BY 1, 2),
        |cent AS (SELECT label AS cell, list(m ORDER BY i) AS cv
        |  FROM cd GROUP BY label),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        |pr AS (SELECT query_id, qv, cell,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY list_cosine_similarity(qv, cv) DESC, cell) AS crank
        |  FROM q CROSS JOIN cent),
        |probes AS (SELECT query_id, qv, cell FROM pr WHERE crank <= 5)
        |SELECT query_id, neighbor_id, rank, cosine FROM (
        |  SELECT p.query_id, e.vec_id AS neighbor_id,
        |   CAST(row_number() OVER (PARTITION BY p.query_id
        |     ORDER BY list_cosine_similarity(p.qv, e.v) DESC, e.vec_id)
        |     AS INT) AS rank,
        |   round(list_cosine_similarity(p.qv, e.v), 4) AS cosine
        |  FROM probes p JOIN e ON e.label = p.cell AND e.vec_id != p.query_id)
        |WHERE rank <= 5""".stripMargin,
    // filtered vector search: the identical probe replay with the
    // metadata predicate applied to the candidate stream pre-ranking
    "sim_filtered_ann" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |cd AS (SELECT label, i, avg(v[CAST(i AS INT)]) AS m
        |  FROM e CROSS JOIN range(1, 65) t(i) GROUP BY 1, 2),
        |cent AS (SELECT label AS cell, list(m ORDER BY i) AS cv
        |  FROM cd GROUP BY label),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        |pr AS (SELECT query_id, qv, cell,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY list_cosine_similarity(qv, cv) DESC, cell) AS crank
        |  FROM q CROSS JOIN cent),
        |probes AS (SELECT query_id, qv, cell FROM pr WHERE crank <= 5)
        |SELECT query_id, neighbor_id, rank, cosine FROM (
        |  SELECT p.query_id, e.vec_id AS neighbor_id,
        |   CAST(row_number() OVER (PARTITION BY p.query_id
        |     ORDER BY list_cosine_similarity(p.qv, e.v) DESC, e.vec_id)
        |     AS INT) AS rank,
        |   round(list_cosine_similarity(p.qv, e.v), 4) AS cosine
        |  FROM probes p JOIN e ON e.label = p.cell
        |    AND e.vec_id != p.query_id AND e.vec_id % 3 = 0)
        |WHERE rank <= 5""".stripMargin,
    "sim_lsh_ann" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |pl AS (SELECT t, j,
        |   list(((md5_number_lower('hp:'||t||':'||j||':'||i) >> 11)
        |     / 4503599627370496.0) - 1.0 ORDER BY i) AS pv
        |  FROM range(0, 8) a(t) CROSS JOIN range(0, 4) b(j)
        |  CROSS JOIN range(0, 64) c(i)
        |  GROUP BY t, j),
        |dots AS (SELECT e.vec_id, p.t, p.j,
        |   list_reduce(list_transform(range(1, 65),
        |     k -> p.pv[CAST(k AS INT)] * e.v[CAST(k AS INT)]),
        |     (x, y) -> x + y) AS dot
        |  FROM e CROSS JOIN pl p),
        |bk AS (SELECT vec_id, t,
        |   CAST(sum(CASE WHEN dot > 0 THEN CAST(power(2, j) AS BIGINT)
        |     ELSE 0 END) AS BIGINT) AS bucket
        |  FROM dots GROUP BY vec_id, t),
        |cand AS (SELECT DISTINCT q.vec_id AS query_id, b.vec_id
        |  FROM bk q JOIN bk b ON q.t = b.t AND q.bucket = b.bucket
        |  WHERE q.vec_id < 10 AND b.vec_id != q.vec_id),
        |scored AS (SELECT c.query_id, c.vec_id AS neighbor_id,
        |   list_cosine_similarity(eq.v, en.v) AS cos
        |  FROM cand c JOIN e eq ON eq.vec_id = c.query_id
        |  JOIN e en ON en.vec_id = c.vec_id)
        |SELECT query_id, neighbor_id, rank, cosine FROM (
        |  SELECT query_id, neighbor_id,
        |   CAST(row_number() OVER (PARTITION BY query_id
        |     ORDER BY cos DESC, neighbor_id) AS INT) AS rank,
        |   round(cos, 4) AS cosine
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    "sim_pq_ann" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |subs AS (SELECT vec_id, CAST(m AS INT) AS m,
        |   list_slice(v, CAST(m*8+1 AS INT), CAST(m*8+8 AS INT)) AS subv
        |  FROM e CROSS JOIN range(0, 8) t(m)),
        |coded AS (SELECT vec_id, m, subv,
        |   CAST(list_sum(list_transform(range(0, 8), d ->
        |     CASE WHEN subv[CAST(d+1 AS INT)] > 0
        |       THEN CAST(power(2, d) AS BIGINT) ELSE 0 END)) AS INT) AS code
        |  FROM subs),
        |cb AS (SELECT m, code, CAST(d AS INT) AS d,
        |   round(avg(subv[CAST(d AS INT)]), 6) AS c
        |  FROM coded CROSS JOIN range(1, 9) t(d)
        |  GROUP BY 1, 2, 3),
        |cbv AS (SELECT m, code, list(c ORDER BY d) AS cv
        |  FROM cb GROUP BY 1, 2),
        |adc AS (SELECT q.vec_id AS query_id, q.m, b.code,
        |   q.subv[1]*b.cv[1] + q.subv[2]*b.cv[2] + q.subv[3]*b.cv[3]
        |    + q.subv[4]*b.cv[4] + q.subv[5]*b.cv[5] + q.subv[6]*b.cv[6]
        |    + q.subv[7]*b.cv[7] + q.subv[8]*b.cv[8] AS partial,
        |   b.cv[1]*b.cv[1] + b.cv[2]*b.cv[2] + b.cv[3]*b.cv[3]
        |    + b.cv[4]*b.cv[4] + b.cv[5]*b.cv[5] + b.cv[6]*b.cv[6]
        |    + b.cv[7]*b.cv[7] + b.cv[8]*b.cv[8] AS cnorm2,
        |   q.subv[1]*q.subv[1] + q.subv[2]*q.subv[2] + q.subv[3]*q.subv[3]
        |    + q.subv[4]*q.subv[4] + q.subv[5]*q.subv[5] + q.subv[6]*q.subv[6]
        |    + q.subv[7]*q.subv[7] + q.subv[8]*q.subv[8] AS qnorm2
        |  FROM coded q JOIN cbv b ON q.m = b.m
        |  WHERE q.vec_id < 10),
        |scored AS (SELECT a.query_id, c.vec_id,
        |   round(sum(a.partial)
        |     / (sqrt(sum(a.qnorm2)) * sqrt(sum(a.cnorm2))), 4) AS rscore
        |  FROM coded c JOIN adc a ON c.m = a.m AND c.code = a.code
        |  WHERE c.vec_id != a.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, rank, approx_score FROM (
        |  SELECT query_id, vec_id AS neighbor_id,
        |   CAST(row_number() OVER (PARTITION BY query_id
        |     ORDER BY rscore DESC, vec_id) AS INT) AS rank,
        |   rscore AS approx_score
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    "q_mode" ->
      """WITH c AS (SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
        |   ORDER BY n DESC, o_orderstatus) AS rn FROM c)
        |SELECT o_orderpriority, o_orderstatus AS modal_status,
        | n AS n_orders FROM r WHERE rn = 1""".stripMargin,
    "q11_important_stock" ->
      """WITH pp AS (SELECT l_partkey,
        |   CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE s_nationkey = 3
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM pp)
        |SELECT l_partkey, value_cents FROM pp CROSS JOIN t
        |WHERE value_cents > total_cents // 10000""".stripMargin,
    "q12_ship_lateness" ->
      """SELECT l_linestatus,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_linestatus""".stripMargin,
    "q_window_range" ->
      """WITH o AS (SELECT o_custkey,
        |   date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
        |   CAST(round(o_totalprice*100) AS BIGINT) AS cents
        |  FROM orders),
        |w AS (SELECT o_custkey,
        |   sum(cents) OVER (PARTITION BY o_custkey ORDER BY day
        |     RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS trail_cents
        |  FROM o)
        |SELECT o_custkey, CAST(max(trail_cents) AS BIGINT) AS peak_90d_cents,
        | CAST(count(*) AS BIGINT) AS n_orders
        |FROM w GROUP BY 1""".stripMargin,
    "q_median_mad" ->
      """WITH h AS (SELECT o_orderpriority,
        |   CAST(round(o_totalprice*100) AS BIGINT) AS cents, count(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |c AS (SELECT o_orderpriority, cents, cnt,
        |   sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY cents
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |   sum(cnt) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM h),
        |med AS (SELECT o_orderpriority,
        |   CAST(min(CASE WHEN cum*2 >= n THEN cents END) AS BIGINT)
        |     AS median_cents,
        |   CAST(max(n) AS BIGINT) AS n_orders
        |  FROM c GROUP BY 1),
        |d AS (SELECT h.o_orderpriority, abs(h.cents - m.median_cents) AS dev,
        |   CAST(sum(h.cnt) AS BIGINT) AS cnt
        |  FROM h JOIN med m ON h.o_orderpriority = m.o_orderpriority
        |  GROUP BY 1, 2),
        |dc AS (SELECT o_orderpriority, dev, cnt,
        |   sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY dev
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |   sum(cnt) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM d),
        |mad AS (SELECT o_orderpriority,
        |   CAST(min(CASE WHEN cum*2 >= n THEN dev END) AS BIGINT) AS mad_cents
        |  FROM dc GROUP BY 1)
        |SELECT m.o_orderpriority, m.median_cents, mad.mad_cents, m.n_orders
        |FROM med m JOIN mad ON m.o_orderpriority = mad.o_orderpriority""".stripMargin,
    "sim_sq_ann" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |dim AS (SELECT CAST(d AS INT) AS d,
        |   min(v[CAST(d+1 AS INT)]) AS lo, max(v[CAST(d+1 AS INT)]) AS hi
        |  FROM e CROSS JOIN range(0, 64) t(d) GROUP BY 1),
        |r AS (SELECT list(lo ORDER BY d) AS lo, list(hi ORDER BY d) AS hi
        |  FROM dim),
        |cc AS (SELECT vec_id, list_transform(range(0, 64), i ->
        |   CASE WHEN r.hi[CAST(i+1 AS INT)] = r.lo[CAST(i+1 AS INT)] THEN 0
        |   ELSE CAST(least(greatest(floor(
        |       (v[CAST(i+1 AS INT)] - r.lo[CAST(i+1 AS INT)])
        |       / (r.hi[CAST(i+1 AS INT)] - r.lo[CAST(i+1 AS INT)]) * 255.0),
        |     0), 255) AS INT) END) AS c
        |  FROM e CROSS JOIN r),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id,
        |   CAST(list_sum(list_transform(range(0, 64), i ->
        |     (q.c[CAST(i+1 AS INT)] - 128) * (c.c[CAST(i+1 AS INT)] - 128)))
        |     AS BIGINT) AS score
        |  FROM cc q JOIN cc c ON q.vec_id < 10 AND c.vec_id != q.vec_id),
        |sl AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY score DESC, vec_id) AS rn FROM s)
        |  WHERE rn <= 20)
        |SELECT query_id, neighbor_id, rank, cosine FROM (
        |  SELECT sl.query_id, sl.vec_id AS neighbor_id,
        |   CAST(row_number() OVER (PARTITION BY sl.query_id
        |     ORDER BY list_cosine_similarity(q.v, n.v) DESC, sl.vec_id)
        |     AS INT) AS rank,
        |   round(list_cosine_similarity(q.v, n.v), 4) AS cosine
        |  FROM sl JOIN e q ON q.vec_id = sl.query_id
        |  JOIN e n ON n.vec_id = sl.vec_id)
        |WHERE rank <= 5""".stripMargin,
    "sim_binary_ann" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |s AS (SELECT q.vec_id AS query_id, c.vec_id,
        |   CAST(len(list_filter(range(0, 64), i ->
        |     (q.v[CAST(i+1 AS INT)] > 0) != (c.v[CAST(i+1 AS INT)] > 0)))
        |     AS BIGINT) AS hamming
        |  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id != q.vec_id),
        |sl AS (SELECT query_id, vec_id FROM (SELECT query_id, vec_id,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY hamming, vec_id) AS rn FROM s)
        |  WHERE rn <= 20)
        |SELECT query_id, neighbor_id, rank, cosine FROM (
        |  SELECT sl.query_id, sl.vec_id AS neighbor_id,
        |   CAST(row_number() OVER (PARTITION BY sl.query_id
        |     ORDER BY list_cosine_similarity(q.v, n.v) DESC, sl.vec_id)
        |     AS INT) AS rank,
        |   round(list_cosine_similarity(q.v, n.v), 4) AS cosine
        |  FROM sl JOIN e q ON q.vec_id = sl.query_id
        |  JOIN e n ON n.vec_id = sl.vec_id)
        |WHERE rank <= 5""".stripMargin,
    "sim_pq_rerank" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |subs AS (SELECT vec_id, CAST(m AS INT) AS m,
        |   list_slice(v, CAST(m*8+1 AS INT), CAST(m*8+8 AS INT)) AS subv
        |  FROM e CROSS JOIN range(0, 8) t(m)),
        |coded AS (SELECT vec_id, m, subv,
        |   CAST(list_sum(list_transform(range(0, 8), d ->
        |     CASE WHEN subv[CAST(d+1 AS INT)] > 0
        |       THEN CAST(power(2, d) AS BIGINT) ELSE 0 END)) AS INT) AS code
        |  FROM subs),
        |cb AS (SELECT m, code, CAST(d AS INT) AS d,
        |   round(avg(subv[CAST(d AS INT)]), 6) AS c
        |  FROM coded CROSS JOIN range(1, 9) t(d)
        |  GROUP BY 1, 2, 3),
        |cbv AS (SELECT m, code, list(c ORDER BY d) AS cv
        |  FROM cb GROUP BY 1, 2),
        |adc AS (SELECT q.vec_id AS query_id, q.m, b.code,
        |   q.subv[1]*b.cv[1] + q.subv[2]*b.cv[2] + q.subv[3]*b.cv[3]
        |    + q.subv[4]*b.cv[4] + q.subv[5]*b.cv[5] + q.subv[6]*b.cv[6]
        |    + q.subv[7]*b.cv[7] + q.subv[8]*b.cv[8] AS partial,
        |   b.cv[1]*b.cv[1] + b.cv[2]*b.cv[2] + b.cv[3]*b.cv[3]
        |    + b.cv[4]*b.cv[4] + b.cv[5]*b.cv[5] + b.cv[6]*b.cv[6]
        |    + b.cv[7]*b.cv[7] + b.cv[8]*b.cv[8] AS cnorm2,
        |   q.subv[1]*q.subv[1] + q.subv[2]*q.subv[2] + q.subv[3]*q.subv[3]
        |    + q.subv[4]*q.subv[4] + q.subv[5]*q.subv[5] + q.subv[6]*q.subv[6]
        |    + q.subv[7]*q.subv[7] + q.subv[8]*q.subv[8] AS qnorm2
        |  FROM coded q JOIN cbv b ON q.m = b.m
        |  WHERE q.vec_id < 10),
        |scored AS (SELECT a.query_id, c.vec_id,
        |   round(sum(a.partial)
        |     / (sqrt(sum(a.qnorm2)) * sqrt(sum(a.cnorm2))), 4) AS rscore
        |  FROM coded c JOIN adc a ON c.m = a.m AND c.code = a.code
        |  WHERE c.vec_id != a.query_id
        |  GROUP BY 1, 2),
        |short AS (SELECT query_id, vec_id FROM (
        |  SELECT query_id, vec_id,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY rscore DESC, vec_id) AS srank
        |  FROM scored) WHERE srank <= 100)
        |SELECT query_id, neighbor_id, rank, cosine FROM (
        |  SELECT s.query_id, s.vec_id AS neighbor_id,
        |   CAST(row_number() OVER (PARTITION BY s.query_id
        |     ORDER BY list_cosine_similarity(q.v, n.v) DESC, s.vec_id)
        |     AS INT) AS rank,
        |   round(list_cosine_similarity(q.v, n.v), 4) AS cosine
        |  FROM short s JOIN e q ON q.vec_id = s.query_id
        |  JOIN e n ON n.vec_id = s.vec_id)
        |WHERE rank <= 5""".stripMargin,
    "sim_ivfpq_ann" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |cd AS (SELECT label, i, avg(v[CAST(i AS INT)]) AS m
        |  FROM e CROSS JOIN range(1, 65) t(i) GROUP BY 1, 2),
        |cent AS (SELECT label AS cell, list(m ORDER BY i) AS cv
        |  FROM cd GROUP BY label),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        |pr AS (SELECT query_id, cell,
        |   row_number() OVER (PARTITION BY query_id
        |     ORDER BY list_cosine_similarity(qv, cv) DESC, cell) AS crank
        |  FROM q CROSS JOIN cent),
        |probes AS (SELECT query_id, cell FROM pr WHERE crank <= 5),
        |subs AS (SELECT vec_id, CAST(m AS INT) AS m,
        |   list_slice(v, CAST(m*8+1 AS INT), CAST(m*8+8 AS INT)) AS subv
        |  FROM e CROSS JOIN range(0, 8) t(m)),
        |coded AS (SELECT vec_id, m, subv,
        |   CAST(list_sum(list_transform(range(0, 8), d ->
        |     CASE WHEN subv[CAST(d+1 AS INT)] > 0
        |       THEN CAST(power(2, d) AS BIGINT) ELSE 0 END)) AS INT) AS code
        |  FROM subs),
        |cb AS (SELECT m, code, CAST(d AS INT) AS d,
        |   round(avg(subv[CAST(d AS INT)]), 6) AS c
        |  FROM coded CROSS JOIN range(1, 9) t(d)
        |  GROUP BY 1, 2, 3),
        |cbv AS (SELECT m, code, list(c ORDER BY d) AS cv
        |  FROM cb GROUP BY 1, 2),
        |adc AS (SELECT cq.vec_id AS query_id, cq.m, b.code,
        |   cq.subv[1]*b.cv[1] + cq.subv[2]*b.cv[2] + cq.subv[3]*b.cv[3]
        |    + cq.subv[4]*b.cv[4] + cq.subv[5]*b.cv[5] + cq.subv[6]*b.cv[6]
        |    + cq.subv[7]*b.cv[7] + cq.subv[8]*b.cv[8] AS partial,
        |   b.cv[1]*b.cv[1] + b.cv[2]*b.cv[2] + b.cv[3]*b.cv[3]
        |    + b.cv[4]*b.cv[4] + b.cv[5]*b.cv[5] + b.cv[6]*b.cv[6]
        |    + b.cv[7]*b.cv[7] + b.cv[8]*b.cv[8] AS cnorm2,
        |   cq.subv[1]*cq.subv[1] + cq.subv[2]*cq.subv[2]
        |    + cq.subv[3]*cq.subv[3] + cq.subv[4]*cq.subv[4]
        |    + cq.subv[5]*cq.subv[5] + cq.subv[6]*cq.subv[6]
        |    + cq.subv[7]*cq.subv[7] + cq.subv[8]*cq.subv[8] AS qnorm2
        |  FROM coded cq JOIN cbv b ON cq.m = b.m
        |  WHERE cq.vec_id < 10),
        |scored AS (SELECT a.query_id, c.vec_id,
        |   round(sum(a.partial)
        |     / (sqrt(sum(a.qnorm2)) * sqrt(sum(a.cnorm2))), 4) AS rscore
        |  FROM coded c
        |  JOIN e ev ON ev.vec_id = c.vec_id
        |  JOIN probes p ON p.cell = ev.label
        |  JOIN adc a ON c.m = a.m AND c.code = a.code
        |   AND a.query_id = p.query_id
        |  WHERE c.vec_id != a.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, rank, approx_score FROM (
        |  SELECT query_id, vec_id AS neighbor_id,
        |   CAST(row_number() OVER (PARTITION BY query_id
        |     ORDER BY rscore DESC, vec_id) AS INT) AS rank,
        |   rscore AS approx_score
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    "sim_range_search" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10)
        |SELECT q.query_id, e.vec_id AS neighbor_id,
        | round(list_cosine_similarity(q.qv, e.v), 4) AS cosine
        |FROM q JOIN e ON q.query_id != e.vec_id
        |WHERE round(list_cosine_similarity(q.qv, e.v), 4) >= 0.3""".stripMargin,
    "mm_phash" ->
      """WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
        |  FROM documents WHERE length(text) > 0),
        |seg AS (SELECT doc_id, len, CAST(i AS INT) AS i,
        |   ((i+1)*len)//63 - (i*len)//63 AS w,
        |   substr(text, CAST((i*len)//63 AS INT) + 1,
        |     CAST(((i+1)*len)//63 - (i*len)//63 AS INT)) AS frame
        |  FROM d CROSS JOIN range(0, 63) t(i)),
        |cs AS (SELECT doc_id, len, i, w,
        |   CAST(coalesce(list_sum(list_transform(range(1, length(frame)+1),
        |     j -> ord(substr(frame, CAST(j AS INT), 1)))), 0) AS BIGINT) AS s
        |  FROM seg),
        |tot AS (SELECT doc_id, sum(s) AS total FROM cs GROUP BY 1)
        |SELECT cs.doc_id, cs.len AS n_chars_used,
        | CAST(sum(CASE WHEN cs.s * cs.len > t.total * cs.w
        |   THEN CAST(power(2, cs.i) AS BIGINT) ELSE 0 END) AS BIGINT)
        |   AS phash
        |FROM cs JOIN tot t ON cs.doc_id = t.doc_id
        |GROUP BY cs.doc_id, cs.len""".stripMargin,
    // phash near-dup pairs: same phash CTE, then the oracle's own
    // candidate device — a 4-chunk (16,16,16,15) pigeonhole over the
    // 63 bits, lossless for hamming <= 3 like the Spark side's 3-of-6
    // block combos (both blockings are exact, so the verified pair
    // set is identical)
    "mm_phash_pairs" ->
      """WITH d0 AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
        |  FROM documents WHERE length(text) > 0),
        |seg AS (SELECT doc_id, len, CAST(i AS INT) AS i,
        |   ((i+1)*len)//63 - (i*len)//63 AS w,
        |   substr(text, CAST((i*len)//63 AS INT) + 1,
        |     CAST(((i+1)*len)//63 - (i*len)//63 AS INT)) AS frame
        |  FROM d0 CROSS JOIN range(0, 63) t(i)),
        |cs AS (SELECT doc_id, len, i, w,
        |   CAST(coalesce(list_sum(list_transform(range(1, length(frame)+1),
        |     j -> ord(substr(frame, CAST(j AS INT), 1)))), 0) AS BIGINT) AS s
        |  FROM seg),
        |tot AS (SELECT doc_id, sum(s) AS total FROM cs GROUP BY 1),
        |d AS (SELECT cs.doc_id,
        |   CAST(sum(CASE WHEN cs.s * cs.len > t.total * cs.w
        |     THEN CAST(power(2, cs.i) AS BIGINT) ELSE 0 END) AS BIGINT)
        |     AS phash
        |  FROM cs JOIN tot t ON cs.doc_id = t.doc_id GROUP BY cs.doc_id),
        |e AS (SELECT doc_id, phash, CAST(i AS INT) AS chunk_idx,
        |   (phash >> CAST(i*16 AS INT))
        |     & CASE WHEN i = 3 THEN 32767 ELSE 65535 END AS chunk_val
        |  FROM d CROSS JOIN range(0, 4) t(i)),
        |p AS (SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
        |  FROM e a JOIN e b ON a.chunk_idx = b.chunk_idx
        |    AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_id_1, doc_id_2, hamming FROM (
        |  SELECT p.doc_id_1, p.doc_id_2,
        |    CAST(bit_count(xor(ca.phash, cb.phash)) AS INT) AS hamming
        |  FROM p JOIN d ca ON ca.doc_id = p.doc_id_1
        |         JOIN d cb ON cb.doc_id = p.doc_id_2)
        |WHERE hamming <= 3""".stripMargin,
    // aggregate twin: same pair pipeline, folded to the <=4-row
    // hamming histogram — the sf10-gateable face of the pair family
    // (DuckDB streams the pairs internally, the compare never holds
    // the list)
    "mm_phash_pair_stats" ->
      """WITH d0 AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
        |  FROM documents WHERE length(text) > 0),
        |seg AS (SELECT doc_id, len, CAST(i AS INT) AS i,
        |   ((i+1)*len)//63 - (i*len)//63 AS w,
        |   substr(text, CAST((i*len)//63 AS INT) + 1,
        |     CAST(((i+1)*len)//63 - (i*len)//63 AS INT)) AS frame
        |  FROM d0 CROSS JOIN range(0, 63) t(i)),
        |cs AS (SELECT doc_id, len, i, w,
        |   CAST(coalesce(list_sum(list_transform(range(1, length(frame)+1),
        |     j -> ord(substr(frame, CAST(j AS INT), 1)))), 0) AS BIGINT) AS s
        |  FROM seg),
        |tot AS (SELECT doc_id, sum(s) AS total FROM cs GROUP BY 1),
        |d AS (SELECT cs.doc_id,
        |   CAST(sum(CASE WHEN cs.s * cs.len > t.total * cs.w
        |     THEN CAST(power(2, cs.i) AS BIGINT) ELSE 0 END) AS BIGINT)
        |     AS phash
        |  FROM cs JOIN tot t ON cs.doc_id = t.doc_id GROUP BY cs.doc_id),
        |e AS (SELECT doc_id, phash, CAST(i AS INT) AS chunk_idx,
        |   (phash >> CAST(i*16 AS INT))
        |     & CASE WHEN i = 3 THEN 32767 ELSE 65535 END AS chunk_val
        |  FROM d CROSS JOIN range(0, 4) t(i)),
        |p AS (SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
        |  FROM e a JOIN e b ON a.chunk_idx = b.chunk_idx
        |    AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (SELECT doc_id_1, doc_id_2, hamming FROM (
        |  SELECT p.doc_id_1, p.doc_id_2,
        |    CAST(bit_count(xor(ca.phash, cb.phash)) AS INT) AS hamming
        |  FROM p JOIN d ca ON ca.doc_id = p.doc_id_1
        |         JOIN d cb ON cb.doc_id = p.doc_id_2)
        |  WHERE hamming <= 3)
        |SELECT hamming, count(*) AS n_pairs,
        | count(DISTINCT doc_id_1) AS n_left_docs,
        | count(DISTINCT doc_id_2) AS n_right_docs
        |FROM pairs GROUP BY 1""".stripMargin,
    // cluster twin: the same pair pipeline, closed transitively with
    // the dedup_components min-propagation device (16 pointer-jump
    // rounds + a recursive reach closure over the contracted graph)
    "mm_phash_clusters" -> {
      val rounds = (1 to 16).map { k =>
        s"""n$k AS MATERIALIZED (SELECT v, min(l) AS l FROM (
           |  SELECT v, l FROM l${k - 1}
           |  UNION ALL
           |  SELECT e.b AS v, p.l FROM edges e JOIN l${k - 1} p ON p.v = e.a)
           | GROUP BY v),
           |l$k AS MATERIALIZED (SELECT n.v, m.l FROM n$k n JOIN n$k m ON m.v = n.l)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH RECURSIVE
         |d0 AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
         |  FROM documents WHERE length(text) > 0),
         |seg AS (SELECT doc_id, len, CAST(i AS INT) AS i,
         |   ((i+1)*len)//63 - (i*len)//63 AS w,
         |   substr(text, CAST((i*len)//63 AS INT) + 1,
         |     CAST(((i+1)*len)//63 - (i*len)//63 AS INT)) AS frame
         |  FROM d0 CROSS JOIN range(0, 63) t(i)),
         |cs AS (SELECT doc_id, len, i, w,
         |   CAST(coalesce(list_sum(list_transform(range(1, length(frame)+1),
         |     j -> ord(substr(frame, CAST(j AS INT), 1)))), 0) AS BIGINT) AS s
         |  FROM seg),
         |tot AS (SELECT doc_id, sum(s) AS total FROM cs GROUP BY 1),
         |d AS (SELECT cs.doc_id,
         |   CAST(sum(CASE WHEN cs.s * cs.len > t.total * cs.w
         |     THEN CAST(power(2, cs.i) AS BIGINT) ELSE 0 END) AS BIGINT)
         |     AS phash
         |  FROM cs JOIN tot t ON cs.doc_id = t.doc_id GROUP BY cs.doc_id),
         |e2 AS (SELECT doc_id, phash, CAST(i AS INT) AS chunk_idx,
         |   (phash >> CAST(i*16 AS INT))
         |     & CASE WHEN i = 3 THEN 32767 ELSE 65535 END AS chunk_val
         |  FROM d CROSS JOIN range(0, 4) t(i)),
         |p AS (SELECT a.doc_id AS doc_id_1, b.doc_id AS doc_id_2
         |  FROM e2 a JOIN e2 b ON a.chunk_idx = b.chunk_idx
         |    AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pr AS MATERIALIZED (SELECT doc_id_1, doc_id_2 FROM (
         |  SELECT p.doc_id_1, p.doc_id_2,
         |    CAST(bit_count(xor(ca.phash, cb.phash)) AS INT) AS hamming
         |  FROM p JOIN d ca ON ca.doc_id = p.doc_id_1
         |         JOIN d cb ON cb.doc_id = p.doc_id_2)
         |  WHERE hamming <= 3),
         |edges AS MATERIALIZED (SELECT doc_id_1 AS a, doc_id_2 AS b FROM pr
         |  UNION SELECT doc_id_2 AS a, doc_id_1 AS b FROM pr),
         |l0 AS MATERIALIZED (SELECT v, v AS l FROM (
         |  SELECT doc_id_1 AS v FROM pr UNION SELECT doc_id_2 FROM pr)),
         |$rounds,
         |cedges AS MATERIALIZED (SELECT DISTINCT la.l AS a, lb.l AS b
         |  FROM edges e JOIN l16 la ON la.v = e.a JOIN l16 lb ON lb.v = e.b
         |  WHERE la.l != lb.l),
         |reach(src, dst) AS (
         |  SELECT l AS src, l AS dst FROM (SELECT DISTINCT l FROM l16)
         |  UNION
         |  SELECT r.src, c.b AS dst FROM reach r JOIN cedges c ON r.dst = c.a),
         |cmin AS (SELECT src, min(dst) AS m FROM reach GROUP BY src)
         |SELECT cmin.m AS cluster_rep,
         | CAST(count(*) AS BIGINT) AS cluster_size,
         | max(l16.v) AS max_doc_id
         |FROM l16 JOIN cmin ON cmin.src = l16.l
         |GROUP BY 1""".stripMargin
    },
    "mm_decode_batch" ->
      """WITH f AS (SELECT doc_id,
        |   CAST(ceil(length(text)/64.0) AS INT) AS n_frames,
        |   unnest(range(0, CAST(ceil(length(text)/64.0) AS INT))) AS fi,
        |   text
        |  FROM documents),
        |c AS (SELECT doc_id, n_frames, CAST(fi AS INT) AS frame_idx,
        |   substr(text, CAST(fi*64 + 1 AS INT), 64) AS frame FROM f)
        |SELECT doc_id, n_frames, frame_idx,
        | CAST(length(frame) AS INT) AS frame_chars,
        | CAST(list_sum(list_transform(range(1, length(frame)+1),
        |   j -> ord(substr(frame, j, 1)))) AS BIGINT) AS frame_cpsum
        |FROM c""".stripMargin,
    "mm_frame_sample" ->
      """WITH f AS (SELECT doc_id,
        |   unnest(range(0, CAST(ceil(length(text)/64.0) AS INT))) AS fi,
        |   text
        |  FROM documents),
        |c AS (SELECT doc_id, CAST(fi AS INT) AS frame_idx,
        |   substr(text, CAST(fi*64 + 1 AS INT), 64) AS frame FROM f)
        |SELECT doc_id, frame_idx,
        | CAST(length(frame) AS INT) AS frame_chars,
        | md5(frame) AS frame_md5,
        | CAST(list_sum(list_transform(range(1, length(frame)+1),
        |   j -> ord(substr(frame, j, 1)))) % 256 AS INT) AS feature_bucket
        |FROM c""".stripMargin,
  )
}
