package graft

import graft.queries.{CdcQueries, LlmQueries, RelationalQueries}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
  * extensions of §2.8) is registered here; deterministic queries carry a
  * DuckDB oracle in [[oracleSql]] (identical column names/types and total
  * ORDER BY on both sides — the driver compare is by name + hash).
  * Probabilistic/hash-seeded operators (MinHash/SimHash/LSH) are
  * rows-only here; their correctness is asserted by scalatests against
  * exact baselines (recall bounds / blocking-completeness properties).
  *
  * NOTE sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`
  * (events.parquet has a TIMESTAMP(NANOS) column); Verify/Bench and the
  * test base do. `entry` deliberately touches only lineitem so it works
  * under any session.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 / §2.8. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational surface over the materialized tables (SURVEY §2.2-2.5)
    "q1_pricing"               -> (RelationalQueries.q1Pricing _),
    "q3_revenue"               -> (RelationalQueries.q3Revenue _),
    "q5_local_revenue"         -> (RelationalQueries.q5LocalRevenue _),
    "window_top3_orders"       -> (RelationalQueries.windowTop3Orders _),
    "distinct_parts"           -> (RelationalQueries.distinctParts _),
    "events_json_extract"      -> (RelationalQueries.eventsJsonExtract _),
    "events_hourly"            -> (RelationalQueries.eventsHourly _),
    "events_hourly_gapfill"    -> (RelationalQueries.eventsHourlyGapfill _),
    "events_hourly_locf"       -> (RelationalQueries.eventsHourlyLocf _),
    "events_hourly_interp"     -> (RelationalQueries.eventsHourlyInterp _),
    "events_sessions"          -> (RelationalQueries.eventsSessions _),
    "events_asof_attrib"       -> (RelationalQueries.eventsAsofAttrib _),
    "events_asof_next"         -> (RelationalQueries.eventsAsofNext _),
    "orders_window_shipments"  -> (RelationalQueries.ordersWindowShipments _),
    "events_pivot_counts"      -> (RelationalQueries.eventsPivotCounts _),
    "events_user_running"      -> (RelationalQueries.eventsUserRunning _),
    "lineitem_unpivot_charges" -> (RelationalQueries.lineitemUnpivotCharges _),
    "q18_large_orders"         -> (RelationalQueries.q18LargeOrders _),
    "events_audience_sets"     -> (RelationalQueries.eventsAudienceSets _),
    "events_zorder_pruned"     -> (RelationalQueries.eventsZOrderPruned _),
    "events_cms_check"         -> (RelationalQueries.eventsCmsCheck _),
    "events_approx_distinct"   -> (RelationalQueries.eventsApproxDistinct _),
    "events_approx_distinct_check" -> (RelationalQueries.eventsApproxDistinctCheck _),
    "q17_avg_yearly"           -> (RelationalQueries.q17AvgYearly _),
    "q1_rollup"                -> (RelationalQueries.q1Rollup _),
    "q1_cube"                  -> (RelationalQueries.q1Cube _),
    "customers_without_orders" -> (RelationalQueries.customersWithoutOrders _),
    // --- CDC engine core (SURVEY §2.1-2.3, §2.6): route→parse→normalize→
    //     dedup→merge, exercised through synthesized envelope JSON
    "cdc_normalize_debezium"   -> ((s: SparkSession, d: String) => CdcQueries.normalizeDebezium(s, d)),
    "cdc_normalize_strict"     -> ((s: SparkSession, d: String) => CdcQueries.normalizeStrict(s, d)),
    "cdc_normalize_dms"        -> ((s: SparkSession, d: String) => CdcQueries.normalizeDms(s, d)),
    "cdc_normalize_flink"      -> ((s: SparkSession, d: String) => CdcQueries.normalizeFlink(s, d)),
    "cdc_normalize_inferalways" -> ((s: SparkSession, d: String) => CdcQueries.normalizeInferAlways(s, d)),
    "cdc_materialize_dms"      -> (CdcQueries.materializeDms _),
    "cdc_latest_rownumber"     -> (CdcQueries.latestPerKeyRowNumber _),
    "cdc_latest_maxby"         -> (CdcQueries.latestPerKeyMaxBy _),
    "cdc_latest_sql"           -> (CdcQueries.latestPerKeySql _),
    "cdc_materialize_debezium" -> (CdcQueries.materializeDebezium _),
    "cdc_upsert_merge"         -> (CdcQueries.keyedUpsertMerge _),
    "cdc_catalog_table"        -> (CdcQueries.catalogTableRead _),
    "cdc_composite_key"        -> (CdcQueries.compositeKeyMerge _),
    "cdc_bucketed_merge"       -> (CdcQueries.bucketedMerge _),
    "cdc_mor_merge"            -> (CdcQueries.morMerge _),
    "cdc_mor_catalog"          -> (CdcQueries.morCatalogRead _),
    "cdc_bucketed_catalog"     -> (CdcQueries.bucketedCatalogRead _),
    "cdc_router_counts"        -> (CdcQueries.routerCounts _),
    "cdc_router_counts_dms"    -> (CdcQueries.routerCountsDms _),
    "skew_join_sales"          -> (RelationalQueries.skewJoinSales _),
    // --- LLM-pipeline extensions (SURVEY §2.8): dedup family
    "llm_dedup_exact"          -> (LlmQueries.dedupExact _),
    "llm_dedup_corpus"         -> (LlmQueries.dedupCorpus _),
    "llm_dedup_cc"             -> (LlmQueries.dedupCc _),
    "llm_dedup_corpus_cc"      -> (LlmQueries.dedupCorpusCc _),
    "llm_neardup_jaccard"      -> (LlmQueries.nearDupJaccard _),
    "llm_neardup_jaccard_prefix" -> (LlmQueries.nearDupJaccardPrefix _),
    "llm_neardup_jaccard_hi"   -> (LlmQueries.nearDupJaccardHiFull _),
    "llm_prefix_candidate_stats" -> (LlmQueries.prefixCandidateStats _),
    "llm_span_dedup"           -> (LlmQueries.spanDedup _),
    "llm_span_dedup_stats"     -> (LlmQueries.spanDedupStats _),
    "llm_span_dedup_cut"       -> (LlmQueries.spanDedupCut _),
    "llm_span_dedup_incremental" -> (LlmQueries.spanDedupIncremental _),
    "llm_line_dedup_stats"     -> (LlmQueries.lineDedupStats _),
    "llm_line_dedup"           -> (LlmQueries.lineDedupBoilerplate _),
    "llm_line_dedup_first"     -> (LlmQueries.lineDedupFirst _),
    "llm_line_dedup_incremental" -> (LlmQueries.lineDedupIncremental _),
    "llm_pii_redact"           -> (LlmQueries.piiRedact _),
    "llm_pii_stats"            -> (LlmQueries.piiStats _),
    "llm_dsir_score"           -> (LlmQueries.dsirScore _),
    "llm_dsir_select"          -> (LlmQueries.dsirSelect _),
    "llm_url_normalize"        -> (LlmQueries.urlNormalize _),
    "llm_domain_cap"           -> (LlmQueries.domainCap _),
    "llm_domain_stats"         -> (LlmQueries.domainStats _),
    "llm_domain_cap_incremental" -> (LlmQueries.domainCapIncremental _),
    "llm_pagerank"             -> (LlmQueries.pagerank _),
    "llm_pagerank_dangling"    -> (LlmQueries.pagerankDangling _),
    "llm_pagerank_warm"        -> (LlmQueries.pagerankWarm _),
    "llm_shuffle_shards"       -> (LlmQueries.shuffleShards _),
    "llm_shuffle_stats"        -> (LlmQueries.shuffleStats _),
    "text_nfc_normalize"       -> (LlmQueries.nfcNormalize _),
    "text_strip_accents"       -> (LlmQueries.stripAccents _),
    "llm_split_leakage"        -> (LlmQueries.splitLeakage _),
    "llm_split_stats"          -> (LlmQueries.splitStats _),
    "llm_split_safe"           -> (LlmQueries.splitSafe _),
    "llm_split_safe_stats"     -> (LlmQueries.splitSafeStats _),
    "llm_snapshot_diff"        -> (LlmQueries.snapshotDiff _),
    "llm_snapshot_diff_stats"  -> (LlmQueries.snapshotDiffStats _),
    "llm_snapshot_diff_incremental" -> (LlmQueries.snapshotDiffIncremental _),
    "warc_wet_roundtrip"       -> (LlmQueries.warcWetRoundtrip _),
    "warc_gz_roundtrip"        -> (LlmQueries.warcGzRoundtrip _),
    "warc_html_extract"        -> (LlmQueries.warcHtmlExtract _),
    "warc_html_extract_encoded" -> (LlmQueries.warcHtmlExtractEncoded _),
    "warc_charset_extract"     -> (LlmQueries.warcCharsetExtract _),
    "warc_files_meta"          -> (LlmQueries.warcFilesMeta _),
    "llm_jsonl_roundtrip"      -> (LlmQueries.jsonlRoundtripPlain _),
    "llm_jsonl_gz_roundtrip"   -> (LlmQueries.jsonlRoundtripGz _),
    "llm_jsonl_zst_roundtrip"  -> (LlmQueries.jsonlRoundtripZst _),
    "llm_jsonl_inferred_roundtrip" -> (LlmQueries.jsonlRoundtripInferred _),
    "llm_orc_roundtrip"        -> (LlmQueries.orcRoundtrip _),
    "llm_csv_roundtrip"        -> (LlmQueries.csvRoundtrip _),
    "llm_avro_roundtrip"       -> (LlmQueries.avroRoundtrip _),
    "llm_tfrecord_roundtrip"   -> (LlmQueries.tfrecordRoundtrip _),
    "llm_tfrecord_gz_roundtrip" -> (LlmQueries.tfrecordGzRoundtrip _),
    "llm_tfrecord_zst_roundtrip" -> (LlmQueries.tfrecordZstRoundtrip _),
    "llm_tfrecord_tokens_roundtrip" -> (LlmQueries.tfrecordTokensRoundtrip _),
    "llm_tfrecord_pack_chain"  -> (LlmQueries.tfrecordPackChain _),
    "llm_tfrecord_inferred_roundtrip" -> (LlmQueries.tfrecordInferredRoundtrip _),
    "llm_chunk_chars"          -> (LlmQueries.chunkChars _),
    "llm_chunk_tokens"         -> (LlmQueries.chunkTokens _),
    "llm_chunk_stats"          -> (LlmQueries.chunkStats _),
    "llm_stratified_sample"    -> (LlmQueries.stratifiedSample _),
    "text_vocab_coverage"      -> (LlmQueries.vocabCoverage _),
    "events_distinct_incremental" -> (LlmQueries.eventsDistinctIncremental _),
    "events_distinct_incremental_check" -> (LlmQueries.eventsDistinctIncrementalCheck _),
    "text_compress_stats"      -> (LlmQueries.textCompressStats _),
    "text_compress_checksum"   -> (LlmQueries.textCompressChecksum _),
    "llm_lm_incremental"       -> (LlmQueries.lmIncremental _),
    "llm_lm_score"             -> (LlmQueries.lmScore _),
    "llm_lm_buckets"           -> (LlmQueries.lmBuckets _),
    "llm_nb_score"             -> (LlmQueries.nbScore _),
    "llm_nb_confusion"         -> (LlmQueries.nbConfusion _),
    "llm_nb_incremental"       -> (LlmQueries.nbIncremental _),
    "llm_neardup_minhash"      -> (LlmQueries.minhashNearDup _),
    "llm_simhash_fingerprints" -> (LlmQueries.simhashFingerprints _),
    "llm_simhash_neardup"      -> (LlmQueries.simhashNearDup _),
    "llm_winnow_fingerprints"  -> (LlmQueries.winnowFingerprints _),
    "llm_winnow_shared_pairs"  -> (LlmQueries.winnowSharedPairs _),
    // --- similarity search
    "llm_cosine_topk"          -> (LlmQueries.cosineTopK _),
    "llm_cosine_topk_lsh"      -> (LlmQueries.cosineTopKLsh _),
    "llm_cosine_topk_lsh_scale" -> (LlmQueries.cosineTopKLshScale _),
    "llm_cosine_topk_ivf"      -> (LlmQueries.cosineTopKIvf _),
    "llm_cosine_topk_ivf_indexed" -> (LlmQueries.cosineTopKIvfIndexed _),
    "llm_cosine_topk_pq"       -> (LlmQueries.cosineTopKPq _),
    "llm_ivf_cells"            -> (LlmQueries.ivfCellStats _),
    "llm_cosine_neardup"       -> (LlmQueries.cosineNearDup _),
    "llm_cosine_neardup_scale" -> (LlmQueries.cosineNearDupScale _),
    "llm_cosine_neardup_incremental" -> (LlmQueries.cosineNearDupIncremental _),
    "llm_embed_stats"          -> (LlmQueries.embedStats _),
    "llm_quantize_stats"       -> (LlmQueries.quantizeStats _),
    // --- driver-gated recall / parity rows for the probabilistic family
    //     (approx vs its exact oracle-green baseline, joined in Spark)
    "llm_lsh_recall"           -> (LlmQueries.lshRecall _),
    "llm_lsh_scale_recall"     -> (LlmQueries.lshScaleRecall _),
    "llm_ivf_recall"           -> (LlmQueries.ivfRecall _),
    "llm_pq_recall"            -> (LlmQueries.pqRecall _),
    "llm_ivf_indexed_parity"   -> (LlmQueries.ivfIndexedParity _),
    "llm_minhash_recall"       -> (LlmQueries.minhashRecall _),
    "llm_simhash_parity"       -> (LlmQueries.simhashParity _),
    "llm_lsh_candidate_stats"  -> (LlmQueries.lshCandidateStats _),
    "llm_semdedup"             -> (LlmQueries.semDedup _),
    "llm_semdedup_check"       -> (LlmQueries.semDedupCheck _),
    "llm_semdedup_incremental" -> (LlmQueries.semDedupIncremental _),
    "llm_semdedup_incremental_check" -> (LlmQueries.semDedupIncrementalCheck _),
    "llm_cosine_neardup_recall" -> (LlmQueries.cosineNearDupRecall _),
    "llm_cosine_neardup_scale_recall" -> (LlmQueries.cosineNearDupScaleRecall _),
    "llm_cosine_incremental_recall" -> (LlmQueries.cosineIncrementalRecall _),
    "llm_ivf_cells_checksum"   -> (LlmQueries.ivfCellsChecksum _),
    "llm_winnow_checksum"      -> (LlmQueries.winnowChecksum _),
    "llm_simhash_checksum"     -> (LlmQueries.simhashChecksum _),
    // --- text analysis
    "text_stats_per_lang"      -> (LlmQueries.textStatsPerLang _),
    "text_quality"             -> (LlmQueries.textQuality _),
    "text_quality_score"       -> (LlmQueries.textQualityScore _),
    "text_langid_counts"       -> (LlmQueries.langIdCounts _),
    "text_langid_ngram_counts" -> (LlmQueries.langIdNgramCounts _),
    "text_tfidf_top_terms"     -> (LlmQueries.tfIdfTopTerms _),
    "llm_bm25_scores"          -> (LlmQueries.bm25Scores _),
    "llm_bm25_topk"            -> (LlmQueries.bm25TopK _),
    "llm_bm25_incremental"     -> (LlmQueries.bm25Incremental _),
    "llm_bm25_multi"           -> (LlmQueries.bm25Multi _),
    "llm_bpe_train"            -> (LlmQueries.bpeTrain _),
    "llm_bpe_selftok"          -> (LlmQueries.bpeSelfTok _),
    "llm_unigram_tokens"       -> (LlmQueries.unigramTokens _),
    "llm_unigram_train"        -> (LlmQueries.unigramTrain _),
    "llm_unigram_selftok"      -> (LlmQueries.unigramSelftok _),
    "llm_unigram_incremental"  -> (LlmQueries.unigramIncremental _),
    "llm_pack_stats_unigram"   -> (LlmQueries.packStatsUnigram _),
    "llm_pack_stats_wordpiece" -> (LlmQueries.packStatsWordpiece _),
    "llm_pack_reconcile"       -> (LlmQueries.packReconcile _),
    "llm_phrase_counts"        -> (LlmQueries.phraseCounts _),
    "llm_phrase_stats"         -> (LlmQueries.phraseStats _),
    "llm_rrf_fusion"           -> (LlmQueries.rrfFusion _),
    "llm_hybrid_fusion"        -> (LlmQueries.hybridFusion _),
    "text_repetition_stats"    -> (LlmQueries.textRepetitionStats _),
    "docs_length_quantiles"    -> (LlmQueries.docsLengthQuantiles _),
    "docs_length_quantiles_approx" -> (LlmQueries.docsLengthQuantilesApprox _),
    "text_vocab_stats"         -> (LlmQueries.vocabStats _),
    "text_clean_stats"         -> (LlmQueries.cleanStats _),
    "llm_quality_filter"       -> (LlmQueries.qualityFilter _),
    "llm_sample_strata"        -> (LlmQueries.sampleStrata _),
    "llm_pack_stats"           -> (LlmQueries.packStats _),
    "llm_bpe_tokens"           -> (LlmQueries.bpeTokens _),
    "llm_wordpiece_tokens"     -> (LlmQueries.wordpieceTokens _),
    "llm_pack_stats_bpe"       -> (LlmQueries.packStatsBpe _),
    "llm_pack_greedy"          -> (LlmQueries.packGreedy _),
    "llm_pack_bestfit"         -> (LlmQueries.packBestfit _),
    "llm_pack_bestfit_check"   -> (LlmQueries.packBestfitCheck _),
    "llm_decontam"             -> (LlmQueries.decontam _),
    "llm_decontam_bloom"       -> (LlmQueries.decontamBloom _),
    "llm_dedup_incremental"    -> (LlmQueries.dedupIncremental _),
    "llm_minhash_incremental"  -> (LlmQueries.minhashIncremental _),
    "llm_minhash_incremental_recall" -> (LlmQueries.minhashIncrementalRecall _),
    "llm_simhash_incremental"  -> (LlmQueries.simhashIncremental _),
    "llm_simhash_incremental_parity" -> (LlmQueries.simhashIncrementalParity _),
    "llm_decontam_incremental" -> (LlmQueries.decontamIncremental _),
    "llm_clean_corpus"         -> (LlmQueries.cleanCorpus _),
    "llm_c4_clean"             -> (LlmQueries.c4Clean _),
    "llm_c4_stats"             -> (LlmQueries.c4Stats _),
    "llm_blocklist_filter"     -> (LlmQueries.blocklistFilter _),
    "llm_blocklist_stats"      -> (LlmQueries.blocklistStats _),
    "llm_mixture_stats"        -> (LlmQueries.mixtureStats _),
    "llm_mixture_rates"        -> (LlmQueries.mixtureRates _),
    "llm_mixture_sample"       -> (LlmQueries.mixtureSample _),
    "llm_kmeans"               -> (LlmQueries.kmeansAssign _),
    "llm_kmeans_sizes"         -> (LlmQueries.kmeansSizes _),
    "llm_kmeans_incremental"   -> (LlmQueries.kmeansIncremental _),
    "llm_dedup_cluster_sizes"  -> (LlmQueries.dedupClusterSizes _),
    // --- multimodal (real JDK image/audio codecs + AVI/MP4 container
    // parsers; only video frame DECODE is a disclosed stand-in — the
    // JDK ships no video codec)
    "mm_decode_meta"           -> (LlmQueries.mmDecodeMeta _),
    "mm_resize_meta"           -> (LlmQueries.mmResizeMeta _),
    "mm_image_features"        -> (LlmQueries.mmImageFeatures _),
    "mm_phash"                 -> (LlmQueries.mmPhash _),
    "mm_phash_neardup"         -> (LlmQueries.mmPhashNearDup _),
    "mm_phash_incremental"     -> (LlmQueries.mmPhashIncremental _),
    "mm_sniff_formats"         -> (LlmQueries.mmSniffFormats _),
    "mm_feature_topk"          -> (LlmQueries.mmFeatureTopK _),
    "mm_resize_checksum"       -> (LlmQueries.mmResizeChecksum _),
    "mm_audio_meta"            -> (LlmQueries.mmAudioMeta _),
    "mm_audio_sample_sums"     -> (LlmQueries.mmAudioSampleSums _),
    "mm_video_meta"            -> (LlmQueries.mmVideoMeta _),
    "mm_video_frames"          -> (LlmQueries.mmVideoFrames _),
    "mm_mp4_meta"              -> (LlmQueries.mmMp4Meta _),
    "mm_mp4_samples"           -> (LlmQueries.mmMp4Samples _),
    "mm_frame_sample"          -> (LlmQueries.mmFrameSample _),
    "mm_cdc_roundtrip"         -> (LlmQueries.cdcRoundtrip _),
    "mm_cdc_chunks"            -> (LlmQueries.cdcChunks _),
    "mm_cdc_dedup"             -> (LlmQueries.cdcDedupStats _),
    "mm_cdc_incremental"       -> (LlmQueries.cdcIncremental _),
    "mm_cdc_incremental_check" -> (LlmQueries.cdcIncrementalCheck _),
  )

  // Shared SQL fragments for the DuckDB oracles (kept identical to the
  // Spark-side arithmetic — see TextStats / Dedup scaladoc).
  private val W = """regexp_split_to_array(trim(text), '\s+')"""
  private val WL = """regexp_split_to_array(trim(lower(text)), '\s+')"""

  /** TextStats.nTokens restated for DuckDB (TextStats.TokenRe). */
  private val NTOKENS =
    """len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))"""

  /** BM25 score CTE chain shared by llm_bm25_scores / llm_bm25_topk /
    * llm_rrf_fusion — the Bm25.scores arithmetic verbatim: milli-scaled
    * dl/avgdl, linear smoothed idf with the 10^7 clamp, tf clamped at
    * 10^4, the 20000-scaled k1=1.2/b=0.75 saturation kernel, all BIGINT
    * integer division (`//` here, `DIV` in Spark — both truncating,
    * identical on the non-negative operands used). */
  private lazy val Bm25TermsSql =
    LlmQueries.Bm25QueryTerms.map(t => s"'$t'").mkString(", ")
  /** dl / corpus-stats / token-stream CTE bodies shared by every BM25
    * oracle (single-query, index-served, and multi-query). */
  private lazy val Bm25BaseCteSql =
    s"""d AS (SELECT doc_id,
       |    CASE WHEN trim(text) = '' THEN 0 ELSE len($W) END AS dl
       |  FROM documents),
       |s AS (SELECT count(*) AS n_docs,
       |        CAST(sum(dl) AS BIGINT) AS total_tokens FROM d),
       |t AS (SELECT doc_id, unnest($WL) AS term FROM documents)""".stripMargin
  /** The per-(doc, term) partial — Bm25.parts verbatim (aliases q/f/d/s
    * fixed by the CTE chains below). */
  private lazy val Bm25PartSql =
    """(least((1000 * (s.n_docs + 1)) // (f.df + 1), 10000000)
      |       * 44000 * least(q.tf, 10000))
      |      // (20000 * least(q.tf, 10000) + 6000
      |         + 18 * ((1000 * d.dl * s.n_docs) // s.total_tokens))""".stripMargin
  /** llm_bpe_train oracle: the full training replay, one CTE trio per
    * round (pair counts over the marked-symbol vocabulary → argmax
    * under (cnt DESC, a, b) → one replace() rewrite — the
    * Bpe.sqlTokenCount marker representation). MATERIALIZED is
    * load-bearing: v_k is referenced twice (p_{k+1} and v_{k+1}), so
    * inlining would expand 2^rounds (the llm_kmeans/llm_pagerank
    * lesson). */
  /** The training-replay CTE chain (WITH v0 … v_n), shared by
    * llm_bpe_train (emits the merge table) and llm_bpe_selftok (drives
    * the replace()-chain encoder with the learned pairs). */
  private lazy val BpeTrainCteSql = {
    val n = graft.ext.Bpe.FixtureNMerges
    val rounds = (1 to n).map { k =>
      s"""p$k AS MATERIALIZED (SELECT substr(t.ws[i.g], 2) AS a,
         |    substr(t.ws[i.g + 1], 2) AS b, CAST(sum(t.freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, string_split(rtrim(s, ' '), ' ') AS ws
         |        FROM v${k - 1}) t,
         |       unnest(generate_series(1, len(t.ws) - 1)) AS i(g)
         |  GROUP BY 1, 2),
         |m$k AS MATERIALIZED (SELECT a, b FROM p$k
         |  ORDER BY cnt DESC, a, b LIMIT 1),
         |v$k AS MATERIALIZED (SELECT t.freq,
         |    replace(t.s, chr(1)||m.a||' '||chr(1)||m.b||' ',
         |      chr(1)||m.a||m.b||' ') AS s
         |  FROM v${k - 1} t, m$k m)""".stripMargin
    }.mkString(",\n")
    s"""WITH v0 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS freq,
       |    regexp_replace(tok, '(.)', chr(1)||'\\1 ', 'g') AS s
       |  FROM (SELECT unnest(regexp_extract_all(text,
       |          '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS tok FROM documents)
       |  GROUP BY tok),
       |$rounds""".stripMargin
  }

  private lazy val BpeTrainSql = {
    val n = graft.ext.Bpe.FixtureNMerges
    val sel = (1 to n)
      .map(k => s"SELECT $k AS rank, a AS lhs, b AS rhs FROM m$k")
      .mkString("\nUNION ALL ")
    s"""$BpeTrainCteSql
       |SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs FROM ($sel)
       |ORDER BY rank""".stripMargin
  }

  /** llm_bpe_selftok oracle: encode every DISTINCT pre-token through
    * the replace() chain driven by the LEARNED pairs (each e_k cross
    * joins round k's 1-row argmax m_k), count markers, join back. */
  private lazy val BpeSelfTokSql = {
    val n = graft.ext.Bpe.FixtureNMerges
    val chain = (1 to n).map { k =>
      s"""e$k AS MATERIALIZED (SELECT e.tok,
         |    replace(e.s, chr(1)||m.a||' '||chr(1)||m.b||' ',
         |      chr(1)||m.a||m.b||' ') AS s
         |  FROM e${k - 1} e, m$k m)""".stripMargin
    }.mkString(",\n")
    s"""$BpeTrainCteSql,
       |t0 AS (SELECT doc_id, unnest(regexp_extract_all(text,
       |        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS tok FROM documents),
       |e0 AS MATERIALIZED (SELECT tok,
       |    regexp_replace(tok, '(.)', chr(1)||'\\1 ', 'g') AS s
       |  FROM (SELECT DISTINCT tok FROM t0)),
       |$chain,
       |cnt AS (SELECT tok,
       |    CAST(len(s) - len(replace(s, chr(1), '')) AS BIGINT) AS nb
       |  FROM e$n),
       |b AS (SELECT t0.doc_id, count(*) AS n_pre,
       |        CAST(sum(cnt.nb) AS BIGINT) AS n_bpe
       |      FROM t0 JOIN cnt USING (tok) GROUP BY 1)
       |SELECT d.doc_id, CAST(coalesce(b.n_pre, 0) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(b.n_bpe, 0) AS BIGINT) AS n_bpe_tokens
       |FROM documents d LEFT JOIN b USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** llm_unigram_tokens oracle: the Viterbi DP unrolled by POSITION —
    * level p's best cost' is the min over pieces ending at p of level
    * (p − len) plus Scale·cost + 1 (Unigram.Scale, interpolated so a
    * Scale change cannot desync the oracle), with the `<unk>` branch
    * always present; one generated MATERIALIZED CTE per level (each
    * level is read by up to maxPieceLen later levels). Pre-tokens
    * longer than [[UnigramOracleLevels]] would drop from the final
    * union and hash-fail loudly — the corpus max is 8. */
  private val UnigramOracleLevels = 16
  private lazy val UnigramCteSql = {
    val pieces = graft.ext.Unigram.FixturePieces
    val lMax = pieces.map(_._1.length).max
    val vals = pieces.map { case (p, c) => s"('$p', $c)" }.mkString(", ")
    val levels = (1 to UnigramOracleLevels).map { p =>
      val unk =
        s"""SELECT c.tok, c.cp + ${graft.ext.Unigram.Scale} * ${graft.ext.Unigram.UnkCost} + 1 AS cand
           |      FROM u${p - 1} c WHERE len(c.tok) >= $p""".stripMargin
      val branches = unk +: (1 to math.min(p, lMax)).map { l =>
        s"""SELECT c.tok, c.cp + ${graft.ext.Unigram.Scale} * pc.cost + 1 AS cand
           |      FROM u${p - l} c JOIN pc ON len(pc.piece) = $l
           |        AND substr(c.tok, ${p - l + 1}, $l) = pc.piece
           |      WHERE len(c.tok) >= $p""".stripMargin
      }
      s"""u$p AS MATERIALIZED (SELECT tok, min(cand) AS cp FROM (
         |    ${branches.mkString("\n    UNION ALL ")}) GROUP BY tok)""".stripMargin
    }.mkString(",\n")
    val fin = (1 to UnigramOracleLevels)
      .map(p => s"SELECT tok, cp FROM u$p WHERE len(tok) = $p")
      .mkString(" UNION ALL ")
    s"""WITH t0 AS (SELECT doc_id, unnest(regexp_extract_all(text,
       |        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS tok FROM documents),
       |vd AS (SELECT DISTINCT tok FROM t0),
       |pc (piece, cost) AS (VALUES $vals),
       |u0 AS MATERIALIZED (SELECT tok, CAST(0 AS BIGINT) AS cp FROM vd),
       |$levels,
       |f AS ($fin),
       |b AS (SELECT t0.doc_id, count(*) AS n_pre,
       |        CAST(sum(f.cp % ${graft.ext.Unigram.Scale}) AS BIGINT) AS np,
       |        CAST(sum(f.cp // ${graft.ext.Unigram.Scale}) AS BIGINT) AS tc
       |      FROM t0 JOIN f USING (tok) GROUP BY 1)""".stripMargin
  }

  // --------------------------------------------------------------
  // llm_unigram_train / llm_unigram_selftok: the FULL hard-EM
  // training replay (Unigram.trainDistributed), round for round —
  // seed substring counts → 3 E/M rounds → true-loss prune →
  // post-prune refit. Each E-step = DP levels by position (the
  // llm_unigram_tokens pattern) + the chosen piece per (word, pos)
  // under the shortest-last-piece tie-break + a recursive-CTE
  // backtrace + the freq-weighted usage aggregate; each M-step is the
  // integer bitlen refit (`length(bin(n))` = Unigram.bitlen). Words
  // longer than the unrolled level count would drop from the final
  // union and hash-fail loudly (corpus max pre-token is 8).
  // --------------------------------------------------------------
  private val UnigramTrainLevels = graft.ext.Unigram.OracleDpLevels

  /** One Viterbi DP over `wordsCte`(w) under `costCte`(piece, cost):
    * emits `{tag}_0..{tag}_L` and `{tag}b` (w, cp at len(w)). */
  private def unigramDpSql(tag: String, wordsCte: String,
                           costCte: String, maxPieceLen: Int): String = {
    val L = UnigramTrainLevels
    val levels = (1 to L).map { p =>
      val unk =
        s"""SELECT c.w, c.cp + ${graft.ext.Unigram.Scale} * ${graft.ext.Unigram.UnkCost} + 1 AS cand
           |      FROM ${tag}_${p - 1} c WHERE len(c.w) >= $p""".stripMargin
      val branches = unk +: (1 to math.min(p, maxPieceLen)).map { l =>
        s"""SELECT c.w, c.cp + ${graft.ext.Unigram.Scale} * pc.cost + 1 AS cand
           |      FROM ${tag}_${p - l} c JOIN $costCte pc ON len(pc.piece) = $l
           |        AND substr(c.w, ${p - l + 1}, $l) = pc.piece
           |      WHERE len(c.w) >= $p""".stripMargin
      }
      s"""${tag}_$p AS MATERIALIZED (SELECT w, min(cand) AS cp FROM (
         |    ${branches.mkString("\n    UNION ALL ")}) GROUP BY w)""".stripMargin
    }.mkString(",\n")
    val fin = (1 to L)
      .map(p => s"SELECT w, cp FROM ${tag}_$p WHERE len(w) = $p")
      .mkString(" UNION ALL ")
    s"""${tag}_0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS cp FROM $wordsCte),
       |$levels,
       |${tag}b AS MATERIALIZED ($fin)""".stripMargin
  }

  /** One E-step: DP + chosen piece per (w, pos) + recursive backtrace
    * + usage. Emits `{tag}u/{tag}c/{tag}p/{tag}s/{tag}g` on top of the
    * DP CTEs; usage = `{tag}g`(piece, cnt). */
  private def unigramSegSql(tag: String, wordsCte: String,
                            costCte: String, maxPieceLen: Int): String = {
    val L = UnigramTrainLevels
    val ucp = (0 to L)
      .map(p => s"SELECT w, $p AS pos, cp FROM ${tag}_$p")
      .mkString(" UNION ALL ")
    val cands = (1 to maxPieceLen).map { l =>
      s"""SELECT cur.w, cur.pos, pc.piece, $l AS plen
         |      FROM ${tag}u cur JOIN ${tag}u prev
         |        ON prev.w = cur.w AND prev.pos = cur.pos - $l
         |      JOIN $costCte pc ON len(pc.piece) = $l
         |        AND substr(cur.w, cur.pos - $l + 1, $l) = pc.piece
         |      WHERE cur.pos >= $l
         |        AND prev.cp + ${graft.ext.Unigram.Scale} * pc.cost + 1 = cur.cp""".stripMargin
    }.mkString("\n    UNION ALL ")
    s"""${unigramDpSql(tag, wordsCte, costCte, maxPieceLen)},
       |${tag}u AS MATERIALIZED ($ucp),
       |${tag}c AS MATERIALIZED (SELECT w, pos, piece FROM (
       |    SELECT w, pos, piece, row_number() OVER (
       |        PARTITION BY w, pos ORDER BY plen) AS rn
       |    FROM ($cands)) WHERE rn = 1),
       |${tag}p AS (SELECT w, len(w) AS pos FROM $wordsCte WHERE len(w) >= 1
       |  UNION ALL SELECT p.w, p.pos - len(c.piece)
       |    FROM ${tag}p p JOIN ${tag}c c ON c.w = p.w AND c.pos = p.pos
       |    WHERE p.pos > 0),
       |${tag}s AS MATERIALIZED (SELECT p.w, c.piece
       |  FROM ${tag}p p JOIN ${tag}c c ON c.w = p.w AND c.pos = p.pos
       |  WHERE p.pos > 0),
       |${tag}g AS MATERIALIZED (SELECT s.piece,
       |    CAST(sum(v.freq) AS BIGINT) AS cnt
       |  FROM ${tag}s s JOIN vd v USING (w) GROUP BY 1)""".stripMargin
  }

  /** One M-step: `costTag`(piece, cost) = bitlen refit of `usageCte`
    * over alphabet ∪ used multi-char pieces (Unigram.refit). */
  private def unigramRefitSql(costTag: String, usageCte: String): String =
    s"""$costTag AS MATERIALIZED (SELECT piece,
       |    CAST(length(bin(CAST((SELECT sum(cnt) FROM $usageCte) AS BIGINT)))
       |      - length(bin(greatest(cnt, 1))) + 1 AS BIGINT) AS cost
       |  FROM (SELECT a.piece, coalesce(u.cnt, CAST(0 AS BIGINT)) AS cnt
       |        FROM (SELECT piece FROM alpha) a
       |        LEFT JOIN $usageCte u USING (piece)
       |        UNION ALL
       |        SELECT piece, cnt FROM $usageCte WHERE len(piece) >= 2))""".stripMargin

  /** Exclusion DPs for the prune loss: one DP per (word, on-path
    * multi-char piece) pair, candidates forbidding that piece. Emits
    * `wx/ex_0..ex_L/exb`(w, x, cp). */
  private def unigramExDpSql(costCte: String, segCte: String,
                             maxPieceLen: Int): String = {
    val L = UnigramTrainLevels
    val levels = (1 to L).map { p =>
      val unk =
        s"""SELECT c.w, c.x, c.cp + ${graft.ext.Unigram.Scale} * ${graft.ext.Unigram.UnkCost} + 1 AS cand
           |      FROM ex_${p - 1} c WHERE len(c.w) >= $p""".stripMargin
      val branches = unk +: (1 to math.min(p, maxPieceLen)).map { l =>
        s"""SELECT c.w, c.x, c.cp + ${graft.ext.Unigram.Scale} * pc.cost + 1 AS cand
           |      FROM ex_${p - l} c JOIN $costCte pc ON len(pc.piece) = $l
           |        AND substr(c.w, ${p - l + 1}, $l) = pc.piece
           |        AND pc.piece <> c.x
           |      WHERE len(c.w) >= $p""".stripMargin
      }
      s"""ex_$p AS MATERIALIZED (SELECT w, x, min(cand) AS cp FROM (
         |    ${branches.mkString("\n    UNION ALL ")}) GROUP BY w, x)""".stripMargin
    }.mkString(",\n")
    val fin = (1 to L)
      .map(p => s"SELECT w, x, cp FROM ex_$p WHERE len(w) = $p")
      .mkString(" UNION ALL ")
    s"""wx AS MATERIALIZED (SELECT DISTINCT w, piece AS x FROM $segCte
       |  WHERE len(piece) >= 2),
       |ex_0 AS MATERIALIZED (SELECT w, x, CAST(0 AS BIGINT) AS cp FROM wx),
       |$levels,
       |exb AS MATERIALIZED ($fin)""".stripMargin
  }

  /** The full training chain: t0/vd → seed (sd/alpha/sk/c0) → EM
    * rounds r1..rN (cost tables c1..cN) → prune-base segmentation
    * `pb*` under cN → exclusion DPs → loss → kept multis → pruned
    * costs `cpr` → final refit round `fr*` → `cf`. */
  private lazy val UnigramTrainCteSql = {
    val sm = graft.ext.Unigram.TrainSeedMaxLen
    val topK = graft.ext.Unigram.TrainSeedTopK
    val rounds = graft.ext.Unigram.TrainEmRounds
    val keepK = graft.ext.Unigram.TrainKeepK
    val em = (1 to rounds).map { r =>
      unigramSegSql(s"r$r", "vd", s"c${r - 1}", sm) + ",\n" +
        unigramRefitSql(s"c$r", s"r${r}g")
    }.mkString(",\n")
    s"""WITH RECURSIVE t0 AS (SELECT doc_id, unnest(regexp_extract_all(text,
       |        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS tok FROM documents),
       |vd AS MATERIALIZED (SELECT tok AS w, CAST(count(*) AS BIGINT) AS freq
       |  FROM t0 GROUP BY tok),
       |sd AS MATERIALIZED (SELECT substr(w, s.g, l.g) AS piece,
       |    CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM vd, unnest(generate_series(1, $sm)) AS l(g),
       |       unnest(generate_series(1, $UnigramTrainLevels)) AS s(g)
       |  WHERE l.g <= len(w) AND s.g + l.g - 1 <= len(w)
       |  GROUP BY 1),
       |alpha AS MATERIALIZED (SELECT piece, cnt FROM sd WHERE len(piece) = 1),
       |sk AS MATERIALIZED (SELECT piece, cnt FROM alpha
       |  UNION ALL SELECT piece, cnt FROM (
       |    SELECT piece, cnt FROM sd WHERE len(piece) >= 2
       |    ORDER BY cnt DESC, piece LIMIT $topK)),
       |c0 AS MATERIALIZED (SELECT piece,
       |    CAST(length(bin(CAST((SELECT sum(cnt) FROM sk) AS BIGINT)))
       |      - length(bin(cnt)) + 1 AS BIGINT) AS cost FROM sk),
       |$em,
       |${unigramSegSql("pb", "vd", s"c$rounds", sm)},
       |${unigramExDpSql(s"c$rounds", "pbs", sm)},
       |lossx AS MATERIALIZED (SELECT e.x AS piece,
       |    CAST(sum(v.freq * (e.cp - b.cp)) AS BIGINT) AS loss
       |  FROM exb e JOIN pbb b USING (w) JOIN vd v USING (w) GROUP BY 1),
       |kmult AS MATERIALIZED (SELECT piece FROM lossx
       |  ORDER BY loss DESC, piece LIMIT $keepK),
       |cpr AS MATERIALIZED (SELECT piece, cost FROM c$rounds
       |  WHERE len(piece) = 1 OR piece IN (SELECT piece FROM kmult)),
       |${unigramSegSql("fr", "vd", "cpr", sm)},
       |${unigramRefitSql("cf", "frg")}""".stripMargin
  }

  private lazy val UnigramTrainSql =
    s"""$UnigramTrainCteSql
       |SELECT piece, CAST(cost AS BIGINT) AS cost FROM cf
       |ORDER BY piece""".stripMargin

  /** One EM round past `cf`, the batch twin of the monoid-merged
    * incremental refresh: the Spark side computes per-half usages and
    * merges; this replay computes the identical round whole-corpus. */
  private lazy val UnigramIncrementalSql =
    s"""$UnigramTrainCteSql,
       |${unigramSegSql("ic", "vd", "cf", graft.ext.Unigram.TrainSeedMaxLen)},
       |${unigramRefitSql("cif", "icg")}
       |SELECT piece, CAST(cost AS BIGINT) AS cost FROM cif
       |ORDER BY piece""".stripMargin

  private lazy val UnigramSelfTokSql =
    s"""$UnigramTrainCteSql,
       |${unigramDpSql("sf", "vd", "cf", graft.ext.Unigram.TrainSeedMaxLen)},
       |bb AS (SELECT t0.doc_id, count(*) AS n_pre,
       |        CAST(sum(f.cp % ${graft.ext.Unigram.Scale}) AS BIGINT) AS np,
       |        CAST(sum(f.cp // ${graft.ext.Unigram.Scale}) AS BIGINT) AS tc
       |      FROM t0 JOIN sfb f ON f.w = t0.tok GROUP BY 1)
       |SELECT d.doc_id, CAST(coalesce(bb.n_pre, 0) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(bb.np, 0) AS BIGINT) AS n_pieces,
       |  CAST(coalesce(bb.tc, 0) AS BIGINT) AS total_cost
       |FROM documents d LEFT JOIN bb USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Phrase-match CTE chain shared by llm_phrase_counts/_stats: every
    * start position where the normalized w-gram equals the normalized
    * phrase (LlmQueries.PhraseFixture interpolated as a VALUES list). */
  private lazy val PhraseCteSql = {
    val vals = LlmQueries.PhraseFixture
      .map { case (id, p) => s"($id, '$p')" }.mkString(", ")
    s"""WITH p (phrase_id, phrase) AS (VALUES $vals),
       |pn AS (SELECT phrase_id,
       |    array_to_string(regexp_split_to_array(trim(lower(phrase)), '\\s+'), ' ') AS phrase_norm,
       |    len(regexp_split_to_array(trim(lower(phrase)), '\\s+')) AS n_words
       |  FROM p),
       |w AS (SELECT doc_id, $WL AS ws FROM documents),
       |m AS (SELECT pn.phrase_id, w.doc_id, t.g AS pos
       |      FROM w, pn, unnest(generate_series(1, len(w.ws) - pn.n_words + 1)) AS t(g)
       |      WHERE len(w.ws) >= pn.n_words
       |        AND array_to_string(w.ws[t.g : t.g + pn.n_words - 1], ' ') = pn.phrase_norm)""".stripMargin
  }

  private lazy val Bm25ScoreCteSql =
    s"""WITH $Bm25BaseCteSql,
       |q AS (SELECT doc_id, term, count(*) AS tf FROM t
       |      WHERE term IN ($Bm25TermsSql) GROUP BY 1, 2),
       |f AS (SELECT term, count(*) AS df FROM q GROUP BY 1),
       |p AS (SELECT q.doc_id, $Bm25PartSql AS part
       |  FROM q JOIN f USING (term) JOIN d USING (doc_id) CROSS JOIN s),
       |bsc AS (SELECT doc_id, count(*) AS n_terms,
       |          CAST(sum(part) AS BIGINT) AS score_u
       |        FROM p GROUP BY doc_id)""".stripMargin

  /** The top-25 ranking body — shared VERBATIM by `llm_bm25_topk` and
    * `llm_bm25_incremental` (the decontam/bloom shared-SQL pattern):
    * the index-served result must equal the full recompute exactly. */
  private lazy val Bm25TopkSql =
    s"""$Bm25ScoreCteSql,
       |r AS (SELECT *, row_number() OVER (
       |        ORDER BY score_u DESC, doc_id ASC) AS rank FROM bsc)
       |SELECT doc_id, n_terms, score_u, CAST(rank AS BIGINT) AS rank
       |FROM r WHERE rank <= 25 ORDER BY rank""".stripMargin

  // PII fragments: regexes verbatim from PiiRedact (Java/RE2-identical
  // syntax only); the planted CTE is the byte-identical twin of
  // LlmQueries.piiDocs.
  // DSIR score CTE chain shared by llm_dsir_score / llm_dsir_select.
  private lazy val DsirScoreSql =
    s"""WITH w0 AS (SELECT doc_id, lang, $WL AS ws FROM documents),
       |w AS (SELECT * FROM w0
       |      WHERE len(ws) >= 1 AND NOT (len(ws) = 1 AND ws[1] = '')),
       |f AS (SELECT doc_id, lang, ws[i] AS feat
       |      FROM w, unnest(generate_series(1, len(ws))) AS t(i)
       |      UNION ALL
       |      SELECT doc_id, lang, ws[i] || ' ' || ws[i+1] AS feat
       |      FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
       |      WHERE len(ws) >= 2),
       |m AS (SELECT feat,
       |        CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
       |        CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c_r
       |      FROM f GROUP BY feat),
       |tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS tt,
       |        CAST(sum(c_r) AS BIGINT) AS tr, count(*) AS v FROM m),
       |d AS (SELECT doc_id, feat, count(*) AS n
       |      FROM f WHERE lang <> 'en' GROUP BY 1, 2),
       |s AS (SELECT d.doc_id, sum(d.n) AS n_features,
       |        sum(d.n * (length(format('{:b}', m.c_t + 1))
       |                   - length(format('{:b}', m.c_r + 1)))) AS feat_bits
       |      FROM d JOIN m USING (feat) GROUP BY 1),
       |sc AS (SELECT s.doc_id, s.n_features,
       |         s.feat_bits + s.n_features *
       |           (length(format('{:b}', tot.tr + tot.v))
       |            - length(format('{:b}', tot.tt + tot.v))) AS score_bits
       |       FROM s, tot)""".stripMargin

  private val PiiEmailSql = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val PiiIpSql    = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
  private val PiiPhoneSql = """\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}"""
  private val PiiPlantedSql =
    """SELECT doc_id, text ||
      |  CASE WHEN doc_id % 3 = 0
      |       THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 5 = 0
      |       THEN ' from 10.' || CAST(doc_id % 250 AS VARCHAR) || '.0.' ||
      |            CAST(doc_id % 200 AS VARCHAR)
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 7 = 0
      |       THEN ' call ' ||
      |            CASE WHEN doc_id % 2 = 0 THEN '(415) 555-' ELSE '415-555-' END ||
      |            lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |       ELSE '' END AS text
      |FROM documents""".stripMargin

  /** Byte-identical twin of LlmQueries.c4Docs: the word-soup corpus
    * restructured into 10-word lines with deterministic (doc_id,
    * line_idx)-keyed decorations — see the Scala side for the arms. */
  private lazy val C4PlantedSql =
    s"""SELECT doc_id,
       |  array_to_string(
       |    [array_to_string(ws[(i-1)*10+1:(i-1)*10+10], ' ') ||
       |       CASE CAST((doc_id + i) % 4 AS INTEGER)
       |         WHEN 0 THEN '.' WHEN 1 THEN '?' WHEN 2 THEN ''
       |         ELSE ' javascript.' END
       |     FOR i IN generate_series(1,
       |       CAST(floor((len(ws) - 1) / 10) AS BIGINT) + 1)],
       |    chr(10)) ||
       |  CASE WHEN doc_id % 17 = 0
       |       THEN chr(10) || 'lorem ipsum dolor sit.' ELSE '' END ||
       |  CASE WHEN doc_id % 19 = 0
       |       THEN chr(10) || 'config { block }.' ELSE '' END AS text
       |FROM (SELECT doc_id, $WL AS ws FROM documents)
       |WHERE len(ws) >= 1 AND NOT (len(ws) = 1 AND ws[1] = '')""".stripMargin

  /** The C4 line-keep predicate as a DuckDB list_filter lambda body —
    * shared by the clean and stats oracles. */
  private val C4KeptListSql =
    """list_filter(string_split(text, chr(10)),
      |      l -> regexp_matches(trim(l), '[.!?"]$')
      |           AND len(regexp_split_to_array(trim(l), '\s+')) >= 3
      |           AND NOT contains(lower(trim(l)), 'javascript'))""".stripMargin

  /** Byte-identical twin of LlmQueries.urlDocs — the messy-URL fixture
    * behind the llm_url_* / llm_domain_* rows. */
  private val UrlFixtureSql =
    """SELECT doc_id, n_chars,
      |  CASE WHEN doc_id % 4 = 0 THEN 'HTTP://'
      |       WHEN doc_id % 4 = 1 THEN 'HTTPS://' ELSE 'https://' END ||
      |  CASE WHEN doc_id % 3 = 0 THEN 'WWW.' || upper(source)
      |       WHEN doc_id % 3 = 1 THEN 'www.' || source ELSE source END ||
      |  CASE WHEN doc_id % 5 = 0 THEN '.co.uk' WHEN doc_id % 5 = 1 THEN '.org'
      |       WHEN doc_id % 5 = 2 THEN '.com' WHEN doc_id % 5 = 3 THEN '.net'
      |       ELSE '.com.au' END ||
      |  CASE WHEN doc_id % 7 = 0 THEN
      |         CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE ':443' END
      |       WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END ||
      |  '/Doc/' || CAST(doc_id AS VARCHAR) ||
      |  CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END ||
      |  CASE WHEN doc_id % 9 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
      |       WHEN doc_id % 9 = 1 THEN '?id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=x'
      |       WHEN doc_id % 9 = 2 THEN '?utm_a=1&utm_b=2'
      |       WHEN doc_id % 9 = 3 THEN '?a=1&utm_medium=m&b=2'
      |       ELSE '' END ||
      |  CASE WHEN doc_id % 8 = 0 THEN '#Section-2' ELSE '' END AS url
      |FROM documents""".stripMargin

  /** UrlOps.canonicalize restated rule-by-rule as a DuckDB CTE chain
    * over the fixture (RE2 `\1` backrefs in place of Java's `$1`; both
    * substitute empty for a non-participating group — verified), ending
    * in `d(doc_id, n_chars, url, url_canon, host, domain)`. */
  private val UrlDomainCteSql =
    s"""WITH p AS ($UrlFixtureSql),
       |s1 AS (SELECT doc_id, n_chars, url,
       |         regexp_replace(url, '#.*$$', '') AS u FROM p),
       |s2 AS (SELECT doc_id, n_chars, url,
       |         lower(regexp_extract(u, '^[^/]*//[^/]*')) ||
       |         substr(u, length(regexp_extract(u, '^[^/]*//[^/]*')) + 1) AS u
       |       FROM s1),
       |s3 AS (SELECT doc_id, n_chars, url,
       |         regexp_replace(regexp_replace(u,
       |           '^(https://[^/:?#]+):443([/?#].*)?$$', '\\1\\2'),
       |           '^(http://[^/:?#]+):80([/?#].*)?$$', '\\1\\2') AS u FROM s2),
       |s4 AS (SELECT doc_id, n_chars, url,
       |         regexp_replace(u, '^(https?://)www\\.', '\\1') AS u FROM s3),
       |s5 AS (SELECT doc_id, n_chars, url,
       |         regexp_replace(regexp_replace(u,
       |           '([?&])((utm_[a-z]+|fbclid|gclid)=[^&#]*&)+', '\\1', 'g'),
       |           '[?&](utm_[a-z]+|fbclid|gclid)=[^&#]*$$', '') AS u FROM s4),
       |s6 AS (SELECT doc_id, n_chars, url,
       |         regexp_replace(regexp_replace(regexp_replace(u,
       |           '\\?$$', ''), '/+\\?', '?'), '/+$$', '') AS u FROM s5),
       |c AS (SELECT doc_id, n_chars, url, u AS url_canon,
       |        regexp_extract(u, '^[a-z]+://([^/:?#]+)', 1) AS host FROM s6),
       |d AS (SELECT *,
       |        CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) IN
       |               ('co.uk','ac.uk','gov.uk','org.uk','com.au','net.au',
       |                'org.au','co.jp','or.jp','ne.jp','co.in','com.br',
       |                'com.cn','co.kr')
       |             AND regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$$', 1) <> ''
       |             THEN regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$$', 1)
       |             ELSE regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) END AS domain
       |      FROM c)""".stripMargin

  /** The CCNet trigram-LM scoring chain (NgramLm's integer-bit
    * arithmetic restated), ending in
    * `sc(doc_id, n_trigrams, total_bits, bits_per_trigram)` — shared by
    * `llm_lm_score` and the `llm_lm_buckets` tertile split. */
  private val LmScoreCteSql =
    """WITH t AS (SELECT doc_id, lower(text) AS txt FROM documents),
      |tri AS (SELECT doc_id, substr(txt, i, 3) AS tri
      |        FROM t, unnest(generate_series(1, len(txt) - 2)) AS s(i)
      |        WHERE len(txt) >= 3),
      |big AS (SELECT doc_id, substr(txt, i, 2) AS big
      |        FROM t, unnest(generate_series(1, len(txt) - 1)) AS s(i)
      |        WHERE len(txt) >= 2),
      |v AS (SELECT count(DISTINCT substr(txt, i, 1)) AS nv
      |      FROM t, unnest(generate_series(1, len(txt))) AS s(i)),
      |m3 AS (SELECT tri, count(*) AS c3 FROM tri GROUP BY tri),
      |m2 AS (SELECT big, count(*) AS c2 FROM big GROUP BY big),
      |scored AS (
      |  SELECT tri.doc_id,
      |    length(format('{:b}', m2.c2 + (SELECT nv FROM v)))
      |      - length(format('{:b}', m3.c3 + 1)) AS bits
      |  FROM tri JOIN m3 USING (tri)
      |  JOIN m2 ON m2.big = substr(tri.tri, 1, 2)),
      |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
      |         CAST(sum(bits) AS BIGINT) AS total_bits,
      |         CAST(sum(bits) AS DOUBLE) / count(*) AS bits_per_trigram
      |       FROM scored GROUP BY doc_id)""".stripMargin

  /** Shared by the `llm_nb_*` rows: the full Naive-Bayes train→score
    * loop (NaiveBayes.scala) as one CTE chain — heuristic-gate labels
    * (the llm_quality_filter predicate verbatim), per-(token, class)
    * counts with totals/vocab derived from the count table, and the
    * integer-bit log-likelihood-ratio via the same bitlen quantization
    * as LmScoreCteSql. */
  private lazy val NbScoreCteSql =
    s"""WITH lab AS (SELECT doc_id,
       |               (CAST($NWORDS AS BIGINT) >= 20 AND n_chars <= 450
       |                AND $STOPW >= 0.02) AS label
       |             FROM documents),
       |tk AS (SELECT doc_id, w AS tok
       |       FROM documents,
       |         unnest(list_filter($WL, w -> w <> '')) AS t(w)),
       |m AS (SELECT tok,
       |        count(*) FILTER (WHERE label) AS c_pos,
       |        count(*) FILTER (WHERE NOT label) AS c_neg
       |      FROM tk JOIN lab USING (doc_id) GROUP BY tok),
       |tot AS (SELECT CAST(sum(c_pos) AS BIGINT) AS t_pos,
       |          CAST(sum(c_neg) AS BIGINT) AS t_neg,
       |          count(*) AS v
       |        FROM m),
       |sc AS (SELECT tk.doc_id,
       |         CAST(count(*) AS BIGINT) AS n_tokens,
       |         CAST(sum(
       |           (length(format('{:b}', tot.t_neg + tot.v))
       |              - length(format('{:b}', m.c_neg + 1)))
       |           - (length(format('{:b}', tot.t_pos + tot.v))
       |              - length(format('{:b}', m.c_pos + 1)))
       |         ) AS BIGINT) AS score_bits
       |       FROM tk JOIN m USING (tok) CROSS JOIN tot
       |       GROUP BY tk.doc_id)""".stripMargin

  /** Shared by `llm_decontam` and `llm_decontam_bloom`: the bloom path
    * is an exact-equivalent plan variant, so it gates on the same SQL. */
  private lazy val DecontamSql =
    s"""WITH w AS (SELECT doc_id, $WL AS ws FROM documents),
       |bench AS (SELECT DISTINCT array_to_string(ws[g:g+7], ' ') AS shingle
       |          FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(g)
       |          WHERE doc_id % 17 = 0 AND len(ws) >= 8),
       |corpus AS (SELECT DISTINCT doc_id, array_to_string(ws[g:g+7], ' ') AS shingle
       |           FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(g)
       |           WHERE doc_id % 17 <> 0 AND len(ws) >= 8),
       |counts AS (SELECT doc_id, count(*) AS n_grams,
       |             count(*) FILTER (WHERE shingle IN (SELECT shingle FROM bench)) AS n_hits
       |           FROM corpus GROUP BY doc_id)
       |SELECT d.doc_id, CAST(coalesce(c.n_grams, 0) AS BIGINT) AS n_grams,
       |  CAST(coalesce(c.n_hits, 0) AS BIGINT) AS n_hits,
       |  coalesce(c.n_hits, 0) > 0 AS contaminated
       |FROM documents d LEFT JOIN counts c ON d.doc_id = c.doc_id
       |WHERE d.doc_id % 17 <> 0 ORDER BY d.doc_id""".stripMargin
  private val NWORDS =
    s"CASE WHEN trim(text) = '' THEN 0 ELSE len($W) END"
  private val MEANWL =
    s"round(CAST(list_aggregate(list_transform($W, w -> len(w)), 'sum') AS DOUBLE)" +
      s" / CAST(greatest(len($W), 1) AS DOUBLE), 6)"
  private val PUNCT =
    """round(CAST(len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE)""" +
      " / CAST(greatest(len(text), 1) AS DOUBLE), 6)"
  private val STOPW =
    s"round(CAST(len(list_filter($W, w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE)" +
      s" / CAST(greatest(len($W), 1) AS DOUBLE), 6)"

  /** Exact brute-force cosine top-5 (no presentation sort) — the
    * llm_cosine_topk oracle body, also wrapped as the live-recomputed
    * exact side of the ANN recall oracles. */
  private val ExactTopKSql =
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 20),
      |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
      |scored AS (SELECT query_id, neighbor_id,
      |             round(list_cosine_similarity(qv, cv), 6) AS sim
      |           FROM q, c WHERE query_id <> neighbor_id),
      |ranked AS (SELECT *, row_number() OVER (
      |             PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
      |           FROM scored)
      |SELECT query_id, neighbor_id, sim, rank FROM ranked
      |WHERE rank <= 5""".stripMargin

  /** Exact all-pairs cosine near-dup ground truth at threshold 0.35 —
    * the live exact side of the cosine near-dup recall oracles (fully
    * SQL-expressible at the registered corpus sizes; quadratic by
    * design, it is a check harness, not a production shape). */
  private val ExactCosinePairsSql =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |        round(list_cosine_similarity(a.e, b.e), 6) AS sim
      |      FROM v a JOIN v b ON a.vec_id < b.vec_id)
      |SELECT id_a, id_b, sim FROM p WHERE sim >= 0.35""".stripMargin

  /** Exact n-gram Jaccard pairs (no presentation sort) — the
    * llm_neardup_jaccard oracle body, also the live exact side of the
    * minhash recall oracle. */
  private lazy val JaccardPairsSql =
    s"""WITH w AS (SELECT doc_id, $WL AS ws FROM documents),
       |sh0 AS (SELECT DISTINCT doc_id, array_to_string(ws[g:g+2], ' ') AS shingle
       |       FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(g)
       |       WHERE len(ws) >= 3),
       |sh AS (SELECT doc_id, shingle FROM sh0
       |       WHERE shingle IN (SELECT shingle FROM sh0
       |                         GROUP BY shingle HAVING count(*) <= 50)),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
       |          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
       |          GROUP BY a.doc_id, b.doc_id)
       |SELECT id_a, id_b,
       |  round(CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
       |FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
       |           JOIN sizes sb ON inter.id_b = sb.doc_id
       |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.12""".stripMargin

  /** Exact n-gram Jaccard pairs at the PRODUCTION near-dup threshold
    * (0.8), uncapped — the shared oracle body of the prefix-filter
    * losslessness gate (llm_neardup_jaccard_prefix and
    * llm_neardup_jaccard_hi both hash against it). */
  private lazy val JaccardPairsHiSql =
    s"""WITH w AS (SELECT doc_id, $WL AS ws FROM documents),
       |sh AS (SELECT DISTINCT doc_id, array_to_string(ws[g:g+2], ' ') AS shingle
       |       FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(g)
       |       WHERE len(ws) >= 3),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
       |          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
       |          GROUP BY a.doc_id, b.doc_id)
       |SELECT id_a, id_b,
       |  round(CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
       |FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
       |           JOIN sizes sb ON inter.id_b = sb.doc_id
       |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.8""".stripMargin

  /** Chained-CTE replay of [[graft.ext.KMeans]]: every Lloyd round
    * unrolled — assignment d_i/a_i (BIGINT squared distances, argmin
    * tie-broken to the smallest cell), update s_i/c_{i+1}
    * (floor(sum/count) in DOUBLE — exact, the quotient's distance to
    * any integer is >= 1/count, far above ulp; empty cells inherit via
    * the LEFT JOIN's NULL arm). Fixed-point arithmetic makes the whole
    * iteration engine-independent; only the unroll depth is generated. */
  private def kmeansCtes(k: Int, iters: Int, dim: Int,
                         trainWhere: String = "TRUE",
                         probeWhere: String = "TRUE"): String = {
    val head =
      s"""WITH q AS (SELECT vec_id,
         |  [CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT) FOR x IN embedding] AS qv
         |  FROM embeddings),
         |qt AS (SELECT vec_id, qv FROM q WHERE $trainWhere),
         |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, qv
         |       FROM (SELECT vec_id, qv FROM qt ORDER BY vec_id LIMIT $k) sub)""".stripMargin
    // Training rounds run over qt; the FINAL assignment (af) runs over
    // the probe split under the last centroids.
    val rounds = (0 until iters).map { i =>
      s"""d$i AS (SELECT q.vec_id, c.cell,
         |    sum((q.qv[t.i]-c.qv[t.i])*(q.qv[t.i]-c.qv[t.i])) AS d
         |  FROM qt q CROSS JOIN c$i c
         |  CROSS JOIN unnest(generate_series(1, $dim)) AS t(i)
         |  GROUP BY q.vec_id, c.cell),
         |a$i AS (SELECT vec_id, cell FROM
         |    (SELECT vec_id, cell,
         |       row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
         |     FROM d$i)
         |  WHERE rn = 1),
         |s$i AS (SELECT a.cell, t.i AS pos, sum(q.qv[t.i]) AS sv, count(*) AS cnt
         |  FROM a$i a JOIN qt q USING (vec_id)
         |  CROSS JOIN unnest(generate_series(1, $dim)) AS t(i)
         |  GROUP BY a.cell, t.i),
         |c${i + 1} AS (SELECT c.cell,
         |    list(CASE WHEN s.sv IS NULL THEN c.qv[t.i]
         |         ELSE CAST(floor(CAST(s.sv AS DOUBLE)/CAST(s.cnt AS DOUBLE)) AS BIGINT) END
         |         ORDER BY t.i) AS qv
         |  FROM c$i c CROSS JOIN unnest(generate_series(1, $dim)) AS t(i)
         |  LEFT JOIN s$i s ON s.cell = c.cell AND s.pos = t.i
         |  GROUP BY c.cell)""".stripMargin
    }
    val fin =
      s"""df AS (SELECT q.vec_id, c.cell,
         |    sum((q.qv[t.i]-c.qv[t.i])*(q.qv[t.i]-c.qv[t.i])) AS d
         |  FROM (SELECT vec_id, qv FROM q WHERE $probeWhere) q
         |  CROSS JOIN c$iters c
         |  CROSS JOIN unnest(generate_series(1, $dim)) AS t(i)
         |  GROUP BY q.vec_id, c.cell),
         |af AS (SELECT vec_id, cell FROM
         |    (SELECT vec_id, cell,
         |       row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
         |     FROM df)
         |  WHERE rn = 1)""".stripMargin
    (Seq(head) ++ rounds ++ Seq(fin)).mkString(",\n")
  }

  private lazy val KMeansCtes = kmeansCtes(8, 3, 64)

  /** Incremental twin: train on the indexed split, assign the arriving
    * shard under the persisted centroids. */
  private lazy val KMeansIncCtes =
    kmeansCtes(8, 3, 64, trainWhere = "vec_id % 10 <> 0",
      probeWhere = "vec_id % 10 = 0")

  /** Exact side of the incremental-minhash recall gate: the UNCAPPED
    * Jaccard pair set (the signature index drops the df cap by design —
    * [[graft.ext.IncrementalMinHash]]) restricted to shard-touching
    * pairs, mirroring llm_dedup_incremental's restriction. */
  private lazy val JaccardPairsUncappedRestrictedSql =
    s"""WITH w AS (SELECT doc_id, $WL AS ws FROM documents),
       |sh AS (SELECT DISTINCT doc_id, array_to_string(ws[g:g+2], ' ') AS shingle
       |       FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(g)
       |       WHERE len(ws) >= 3),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
       |          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
       |          GROUP BY a.doc_id, b.doc_id)
       |SELECT id_a, id_b
       |FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
       |           JOIN sizes sb ON inter.id_b = sb.doc_id
       |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.12
       |  AND (id_a % 10 = 0 OR id_b % 10 = 0)""".stripMargin

  /** sf0.1 pins for the recall/parity oracles (sf0.001 and sf0.01 pins
    * are inlined at the use sites): measured once from the engine's
    * deterministic output, kept as named constants so a re-measure
    * touches one place. The driver's hash gate runs at sf0.01; these
    * make the same oracle text correct at the bench scale factor too. */
  /** Pin discriminator: documents/embeddings share a cardinality across
    * sf0.001 and sf0.01 (content differs), so the recall-pin CASEs key on
    * the lineitem count, which scales 6000 / 60000 / 600000. */
  private val SfDiscriminatorSql = "SELECT count(*) FROM lineitem"

  private val PinLsh01 = 98L
  private val PinNearDup01 = 3830L
  private val PinNearDupScale01 = 128L
  private val PinLshScale01 = 1L
  private val PinIvf01 = 64L
  // IVF-PQ found counts (measured from the deterministic engine output
  // per sf — see the llm_pq_recall entry). Residual/IVFADC codebooks at
  // ksub=256 + rerank=100 (r12): 65/55/62 vs IVF-Flat's 65/55/64 — the
  // 32x code compression now costs at most 2 recall points on these
  // probes (the r11 raw-position/32-code configuration paid 0/2/11).
  private val PinPq0001 = 65L
  private val PinPq001 = 55L
  private val PinPq01 = 62L
  private val PinMinhash01 = 256L
  private val PinMinhashInc01 = 53L
  private val PinSimhashInc0001 = 9L
  private val PinSimhashInc001 = 4L
  private val PinSimhashInc01 = 97L
  private val PinSimhash01 = 525L
  private val PinCands01 = 34117L

  /** A recall-row oracle: the exact side recomputed live (count over
    * `exactSql`), the approximate side pinned per scale factor — the
    * honest limit of what DuckDB can restate for seeded LSH planes /
    * trained centroids / xxhash64 minhash signatures, whose outputs are
    * nonetheless deterministic (driver-side seeds, fixed tie-breaks).
    * `sfCase` discriminates the scale factor by a live row count so the
    * same oracle text is correct at every gated sf. */
  private def recallOracle(exactSql: String, sfCountSql: String,
                           pins: Seq[(Long, Long)], nQueries: Boolean): String = {
    val cases = pins.map { case (n, hit) => s"WHEN $n THEN $hit" }.mkString(" ")
    val qCol = if (nQueries)
      "CAST((SELECT count(DISTINCT query_id) FROM exact) AS BIGINT) AS n_queries,\n  "
    else ""
    s"""WITH exact AS ($exactSql),
       |hit AS (SELECT CAST(CASE ($sfCountSql) $cases END AS BIGINT) AS n)
       |SELECT
       |  $qCol CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_exact,
       |  hit.n AS ${if (nQueries) "n_hit" else "n_found"},
       |  ${if (nQueries) "" else "CAST(0 AS BIGINT) AS n_spurious,\n  "}CAST(hit.n AS DOUBLE) /
       |    CAST((SELECT count(*) FROM exact) AS DOUBLE) AS recall
       |FROM hit""".stripMargin
  }

  /** Fixed-point PageRank oracle: the engine's integer iteration
    * restated as `iters` chained CTEs over the SAME synthetic link
    * graph (quadratic scatter / mod-97 hubs / affine permutation —
    * [[graft.queries.LlmQueries]] linkEdges). Integer sums are
    * shuffle-order-independent and `//` matches Spark's `DIV` on
    * non-negative operands, so the hash gate is exact. */
  private def pagerankOracleSql(iters: Int, dangling: Boolean = false): String = {
    // dangling variant: docs ≡ 0 mod 13 emit no out-edges (they keep
    // their in-links, so they stay in the node set as rank sinks)
    val srcFilter = if (dangling) " WHERE doc_id % 13 <> 0" else ""
    val head =
      s"""cnt AS (SELECT count(*) AS n FROM documents),
         |edges AS (
         |  SELECT doc_id AS src, (doc_id*doc_id + 1) % n AS dst FROM documents, cnt$srcFilter
         |  UNION ALL SELECT doc_id AS src, doc_id % 97 AS dst FROM documents$srcFilter
         |  UNION ALL SELECT doc_id AS src, (7*doc_id + 3) % n AS dst FROM documents, cnt$srcFilter),
         |nodes AS (SELECT DISTINCT src AS node FROM edges
         |          UNION SELECT DISTINCT dst FROM edges),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |nN AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micros FROM nodes)""".stripMargin
    val steps = (1 to iters).map { k =>
      if (!dangling)
        s"""r$k AS (SELECT n.node,
           |  CAST(150000 + (85 * coalesce(s.in_sum, 0)) // 100 AS BIGINT) AS rank_micros
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, CAST(sum(r.rank_micros // d.deg) AS BIGINT) AS in_sum
           |    FROM edges e JOIN r${k - 1} r ON e.src = r.node
           |    JOIN deg d ON e.src = d.src
           |    GROUP BY e.dst) s ON n.node = s.node)""".stripMargin
      else
        // the engine's redistribution restated: dangling mass D = rank
        // held by nodes with no out-edges, each node's incoming sum
        // gains D DIV |nodes| before damping (same integer ops).
        // MATERIALIZED: each r_k is referenced TWICE here (d_{k+1} and
        // the contribution join) — DuckDB inlines CTEs by default, so
        // without it the chain expands 2^iters scans and exhausts file
        // handles (observed at iters=10).
        s"""d$k AS MATERIALIZED (SELECT CAST(coalesce(sum(r.rank_micros), 0) AS BIGINT) AS dsum
           |  FROM r${k - 1} r LEFT JOIN deg dg ON r.node = dg.src
           |  WHERE dg.src IS NULL),
           |r$k AS MATERIALIZED (SELECT n.node,
           |  CAST(150000 + (85 * (coalesce(s.in_sum, 0) +
           |    (SELECT dsum FROM d$k) // (SELECT n FROM nN))) // 100 AS BIGINT) AS rank_micros
           |  FROM nodes n LEFT JOIN (
           |    SELECT e.dst AS node, CAST(sum(r.rank_micros // d.deg) AS BIGINT) AS in_sum
           |    FROM edges e JOIN r${k - 1} r ON e.src = r.node
           |    JOIN deg d ON e.src = d.src
           |    GROUP BY e.dst) s ON n.node = s.node)""".stripMargin
    }
    (head +: steps).mkString("WITH ", ",\n", "") +
      s"\nSELECT node AS doc_id, rank_micros FROM r$iters ORDER BY doc_id"
  }

  /** Warm-start PageRank oracle: the 10-round MASS-CONSERVING cold
    * chain over the already-crawled subgraph (sources with
    * doc_id % 10 <> 0; the not-yet-crawled docs dangle there, so each
    * cold round redistributes their mass — same integer form as the
    * `llm_pagerank_dangling` oracle), then a 4-round plain warm chain
    * over the FULL edge set seeded from r10 (new nodes start at scale
    * — the `coalesce` in w0; the full graph has no dangling nodes).
    * Same integer arithmetic as [[pagerankOracleSql]]; everything
    * live. MATERIALIZED on the cold chain for the same 2^iters
    * CTE-inlining reason documented there. */
  private def pagerankWarmOracleSql(coldIters: Int, warmIters: Int): String = {
    val head =
      s"""cnt AS (SELECT count(*) AS n FROM documents),
         |edges AS (
         |  SELECT doc_id AS src, (doc_id*doc_id + 1) % n AS dst FROM documents, cnt
         |  UNION ALL SELECT doc_id AS src, doc_id % 97 AS dst FROM documents
         |  UNION ALL SELECT doc_id AS src, (7*doc_id + 3) % n AS dst FROM documents, cnt),
         |edges_o AS (SELECT * FROM edges WHERE src % 10 <> 0),
         |nodes_o AS (SELECT DISTINCT src AS node FROM edges_o
         |            UNION SELECT DISTINCT dst FROM edges_o),
         |deg_o AS (SELECT src, count(*) AS deg FROM edges_o GROUP BY src),
         |nN_o AS (SELECT count(*) AS n FROM nodes_o),
         |nodes AS (SELECT DISTINCT src AS node FROM edges
         |          UNION SELECT DISTINCT dst FROM edges),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_micros FROM nodes_o)""".stripMargin
    def step(out: String, prev: String, nodesN: String, edgesN: String,
        degN: String) =
      s"""$out AS (SELECT n.node,
         |  CAST(150000 + (85 * coalesce(s.in_sum, 0)) // 100 AS BIGINT) AS rank_micros
         |  FROM $nodesN n LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(r.rank_micros // d.deg) AS BIGINT) AS in_sum
         |    FROM $edgesN e JOIN $prev r ON e.src = r.node
         |    JOIN $degN d ON e.src = d.src
         |    GROUP BY e.dst) s ON n.node = s.node)""".stripMargin
    val cold = (1 to coldIters).map { k =>
      s"""d$k AS MATERIALIZED (SELECT CAST(coalesce(sum(r.rank_micros), 0) AS BIGINT) AS dsum
         |  FROM r${k - 1} r LEFT JOIN deg_o dg ON r.node = dg.src
         |  WHERE dg.src IS NULL),
         |r$k AS MATERIALIZED (SELECT n.node,
         |  CAST(150000 + (85 * (coalesce(s.in_sum, 0) +
         |    (SELECT dsum FROM d$k) // (SELECT n FROM nN_o))) // 100 AS BIGINT) AS rank_micros
         |  FROM nodes_o n LEFT JOIN (
         |    SELECT e.dst AS node, CAST(sum(r.rank_micros // d.deg) AS BIGINT) AS in_sum
         |    FROM edges_o e JOIN r${k - 1} r ON e.src = r.node
         |    JOIN deg_o d ON e.src = d.src
         |    GROUP BY e.dst) s ON n.node = s.node)""".stripMargin
    }
    val seed =
      s"""w0 AS (SELECT n.node,
         |  CAST(coalesce(r.rank_micros, 1000000) AS BIGINT) AS rank_micros
         |  FROM nodes n LEFT JOIN r$coldIters r ON n.node = r.node)""".stripMargin
    val warm = (1 to warmIters).map(k =>
      step(s"w$k", s"w${k - 1}", "nodes", "edges", "deg"))
    ((head +: cold) ++ (seed +: warm)).mkString("WITH ", ",\n", "") +
      s"\nSELECT node AS doc_id, rank_micros FROM w$warmIters ORDER BY doc_id"
  }

  /** The perceptual-hash oracle kernel: the integer aHash restated from
    * the fixture pixel formula (decode-free — the engine side proves the
    * codec; this side proves the hash arithmetic). `plantDups` switches
    * to the dup-planted fixture (ids ≡ 5 mod 10 render id−5's raster
    * with pixel (0,0) inverted). Cell 63's bit is the BIGINT sign bit:
    * built as −2^63, the exact two's-complement weight. */
  private def phashCteSql(plantDups: Boolean): String = {
    val sid =
      if (plantDups)
        "CASE WHEN doc_id % 10 = 5 AND doc_id >= 5 THEN doc_id - 5 ELSE doc_id END"
      else "doc_id"
    // plain fixture: the smooth pixelValue gradient; dup fixture: the
    // mosaic (per-cell scrambled byte, red channel only) with the
    // planted (0,0) red+16 perturbation
    val v0 =
      if (plantDups)
        """((((sid % 100000)*64 + ((y*8)//h)*8 + (x*8)//w + 1)
          |             * 2654435761 % 1000000007)
          |            * (((sid % 100000)*64 + ((y*8)//h)*8 + (x*8)//w + 1)
          |             * 2654435761 % 1000000007)
          |            % 1000000007 % 256
          |           + CASE WHEN doc_id % 10 = 5 AND doc_id >= 5
          |                   AND x = 0 AND y = 0 THEN 16 ELSE 0 END) % 256
          |          * 65536""".stripMargin
      else "(sid*1000003 + y*1009 + x) % 16777216"
    s"""WITH src AS (SELECT doc_id, $sid AS sid FROM documents),
       |dims AS (SELECT doc_id, 8 + sid % 17 AS w, 8 + sid % 13 AS h, sid FROM src),
       |px AS (SELECT doc_id, x, y, w, h,
       |          $v0 AS v
       |        FROM dims, unnest(generate_series(0, w-1)) AS tx(x),
       |             unnest(generate_series(0, h-1)) AS ty(y)),
       |g AS (SELECT doc_id, ((y*8)//h)*8 + (x*8)//w AS cell,
       |        299*(v//65536) + 587*((v//256)%256) + 114*(v%256) AS gray FROM px),
       |c AS (SELECT doc_id, cell, sum(gray)//count(*) AS cavg FROM g GROUP BY doc_id, cell),
       |m AS (SELECT doc_id, sum(cavg)//64 AS cmean FROM c GROUP BY doc_id),
       |hs AS (SELECT c.doc_id,
       |         CAST(sum(CASE WHEN cavg > cmean THEN
       |           CASE WHEN cell = 63 THEN -9223372036854775807 - 1
       |                ELSE 1::BIGINT << CAST(cell AS INT) END
       |           ELSE 0 END) AS BIGINT) AS phash
       |       FROM c JOIN m ON c.doc_id = m.doc_id GROUP BY c.doc_id)""".stripMargin
  }

  /** Shared CTE for the text_nfc_* / text_strip_accents oracles: the
    * corpus with one planted denormalized exemplar per NFC rule family
    * (matches LlmQueries.nfcDocs byte-for-byte). */
  private val NfcPlantCteSql =
    """WITH p AS (SELECT doc_id, text || ' ' || CASE CAST(doc_id % 6 AS INT)
      |    WHEN 0 THEN chr(101)||chr(769)
      |    WHEN 1 THEN chr(65)||chr(778)
      |    WHEN 2 THEN chr(8491)
      |    WHEN 3 THEN chr(113)||chr(775)||chr(803)
      |    WHEN 4 THEN chr(7691)||chr(803)
      |    ELSE chr(4352)||chr(4449)||chr(4520) END AS text
      |  FROM documents)""".stripMargin

  /** Shared CTE for the llm_snapshot_* oracles: the two fixture
    * versions (v1 drops every 7th doc; v2 drops every 13th, appends a
    * marker to every 11th). */
  private val SnapshotCteSql =
    """WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
      |n AS (SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN text || ' v2'
      |        ELSE text END AS text
      |      FROM documents WHERE doc_id % 13 <> 0)""".stripMargin

  /** Shared CTE chain for the llm_split_* oracles: the capped
    * Jaccard-0.5 pair set (same CTE family as llm_dedup_cc — threshold
    * applied to the RAW ratio, round only on output, matching
    * Dedup.jaccardPairs), the key-hash 10% val split (Sampling.bucket
    * restated in BIGINT arithmetic), and the cross-split leak pairs. */
  private lazy val SplitLeakCteSql = {
    val m = graft.ext.Sampling.Multiplier
    val p = graft.ext.Sampling.Prime
    val mm = graft.ext.Sampling.Million
    val ppm = graft.queries.LlmQueries.ValPpm
    s"""WITH w AS (SELECT doc_id, $WL AS ws FROM documents),
       |sh0 AS (SELECT DISTINCT doc_id, array_to_string(ws[g:g+2], ' ') AS shingle
       |       FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(g)
       |       WHERE len(ws) >= 3),
       |sh AS (SELECT doc_id, shingle FROM sh0
       |       WHERE shingle IN (SELECT shingle FROM sh0
       |                         GROUP BY shingle HAVING count(*) <= 50)),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
       |          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
       |          GROUP BY a.doc_id, b.doc_id),
       |pairs AS (SELECT id_a, id_b,
       |    round(CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
       |  FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
       |             JOIN sizes sb ON inter.id_b = sb.doc_id
       |  WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5),
       |leak AS (SELECT CASE WHEN va THEN id_a ELSE id_b END AS val_doc,
       |           CASE WHEN va THEN id_b ELSE id_a END AS train_doc, jaccard
       |         FROM (SELECT id_a, id_b, jaccard,
       |                 (id_a * $m) % $p % $mm < $ppm AS va,
       |                 (id_b * $m) % $p % $mm < $ppm AS vb
       |               FROM pairs) t WHERE va <> vb)""".stripMargin
  }

  /** Shared CTE for the leakage-FREE split oracles: the capped 0.5
    * pair graph, its recursive-CTE connected components, and the
    * component-keyed split — every near-dup cluster hashes to ONE side
    * via its component min-id (isolated docs hash on their own id). */
  private lazy val SplitSafeCteSql = {
    val m = graft.ext.Sampling.Multiplier
    val p = graft.ext.Sampling.Prime
    val mm = graft.ext.Sampling.Million
    val ppm = graft.queries.LlmQueries.ValPpm
    s"""WITH RECURSIVE w AS (SELECT doc_id, $WL AS ws FROM documents),
       |sh0 AS (SELECT DISTINCT doc_id, array_to_string(ws[g:g+2], ' ') AS shingle
       |       FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(g)
       |       WHERE len(ws) >= 3),
       |sh AS (SELECT doc_id, shingle FROM sh0
       |       WHERE shingle IN (SELECT shingle FROM sh0
       |                         GROUP BY shingle HAVING count(*) <= 50)),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
       |          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
       |          GROUP BY a.doc_id, b.doc_id),
       |pairs AS (SELECT id_a, id_b FROM inter
       |          JOIN sizes sa ON inter.id_a = sa.doc_id
       |          JOIN sizes sb ON inter.id_b = sb.doc_id
       |          WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5),
       |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT DISTINCT u AS id FROM edges),
       |reach AS (SELECT id, id AS r FROM nodes
       |          UNION
       |          SELECT reach.id, e.v AS r FROM reach JOIN edges e ON reach.r = e.u),
       |comps AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
       |sp AS (SELECT d.doc_id,
       |         CASE WHEN (coalesce(c.comp, d.doc_id) * $m) % $p % $mm < $ppm
       |              THEN 'val' ELSE 'train' END AS split
       |       FROM documents d LEFT JOIN comps c ON d.doc_id = c.id)""".stripMargin
  }

  /** Shared CTE for the llm_shuffle_* oracles: the affine permutation,
    * range-slice shard, and within-shard rank with the ENGINE's own
    * constants interpolated (seed-derived A/B, P = 2^31−1, slice width
    * Q) — DuckDB reproduces the permutation bit-for-bit. */
  private lazy val ShuffleCteSql: String = {
    val (a, b) = graft.ext.ShardShuffle.affineConsts(
      graft.queries.LlmQueries.ShuffleSeed)
    val p = graft.ext.ShardShuffle.P
    val n = graft.queries.LlmQueries.ShuffleShards
    val q = (p + n - 1) / n
    s"""WITH s AS (SELECT doc_id, (doc_id * $a + $b) % $p AS skey
       |           FROM documents),
       |r AS (SELECT doc_id, CAST(skey // $q AS INT) AS shard,
       |        row_number() OVER (PARTITION BY skey // $q ORDER BY skey)
       |          - 1 AS pos_in_shard
       |      FROM s)""".stripMargin
  }

  /** Latest-per-key over raw events: shared by the three W1 forms. */
  private val LatestSql =
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the probabilistic ops → driver
    * records a weaker rows-only check (their correctness lives in the
    * scalatest recall/property suites). */
  def oracleSql: Map[String, String] =
    OracleSqlBase + ("llm_pack_reconcile" -> PackReconcileSql)

  /** Cross-tokenizer packing reconciliation (`llm_pack_reconcile`):
    * the four budget layouts aggregated side by side — n_docs must
    * agree (every layout packs every document exactly once; the spec
    * asserts it), the token budgets differ by tokenizer. Each arm
    * re-aggregates that twin's own full oracle body as a nested-WITH
    * subquery, so the reconciliation inherits the four chains'
    * exactness without CTE-name collisions. */
  private lazy val PackReconcileSql = {
    def arm(tok: String, name: String) =
      s"""SELECT '$tok' AS tokenizer, count(*) AS n_packs,
         |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
         |  CAST(sum(pack_tokens) AS BIGINT) AS sum_tokens,
         |  CAST(max(pack_tokens) AS BIGINT) AS max_pack_tokens
         |FROM (
         |${OracleSqlBase(name)})""".stripMargin
    s"""SELECT * FROM (
       |${arm("bpe", "llm_pack_stats_bpe")}
       |UNION ALL
       |${arm("regex", "llm_pack_stats")}
       |UNION ALL
       |${arm("unigram", "llm_pack_stats_unigram")}
       |UNION ALL
       |${arm("wordpiece", "llm_pack_stats_wordpiece")})
       |ORDER BY tokenizer""".stripMargin
  }

  private lazy val OracleSqlBase: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_revenue" ->
      """SELECT l_orderkey,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_revenue" ->
      """SELECT n_name,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "window_top3_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
        |        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |      FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "distinct_parts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "events_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // HLL++ drift gate: estimates are deterministic for fixed data/rsd
    // (hash-bucketed, no RNG) → pinned per sf; exact sums + type count
    // recomputed live. The error-bound property lives in SketchSpec.
    "events_approx_distinct_check" ->
      s"""WITH ex AS (SELECT event_type, count(DISTINCT value) AS ev,
         |              count(DISTINCT user_id) AS eu
         |            FROM events GROUP BY event_type)
         |SELECT CAST((SELECT count(*) FROM ex) AS BIGINT) AS n_types,
         |  CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN 986 WHEN 60000 THEN 8973 WHEN 600000 THEN 49084
         |  END AS BIGINT) AS sum_approx_values,
         |  CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN 75 WHEN 60000 THEN 750 WHEN 600000 THEN 7470
         |  END AS BIGINT) AS sum_approx_users,
         |  (SELECT CAST(sum(ev) AS BIGINT) FROM ex) AS sum_exact_values,
         |  (SELECT CAST(sum(eu) AS BIGINT) FROM ex) AS sum_exact_users""".stripMargin,
    "events_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start, event_type,
        |  count(*) AS n_events,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    // Dense hourly gap-fill: the axis is generated from the corpus's
    // own hour bounds (scalar subqueries into the list-form
    // generate_series), crossed with the distinct type set, zero-filled
    // by the left join — a missing hour reads 0, not absent.
    "events_hourly_gapfill" ->
      """WITH b AS (SELECT min(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS lo,
        |            max(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hi FROM events),
        |h AS (SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b),
        |              INTERVAL 1 HOUR)) AS hour_start),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |c AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
        |        event_type, count(*) AS n
        |      FROM events GROUP BY 1, 2)
        |SELECT h.hour_start, ty.event_type,
        |  CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
        |FROM h CROSS JOIN ty
        |LEFT JOIN c ON c.hour_start = h.hour_start AND c.event_type = ty.event_type
        |ORDER BY h.hour_start, ty.event_type""".stripMargin,
    // LOCF fill over the same dense axis: each missing hour repeats the
    // most recent observed count for its type; pre-first-observation
    // hours read 0.
    "events_hourly_locf" ->
      """WITH b AS (SELECT min(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS lo,
        |            max(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hi FROM events),
        |h AS (SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b),
        |              INTERVAL 1 HOUR)) AS hour_start),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |c AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
        |        event_type, count(*) AS n
        |      FROM events GROUP BY 1, 2),
        |ax AS (SELECT h.hour_start, ty.event_type, c.n
        |       FROM h CROSS JOIN ty
        |       LEFT JOIN c ON c.hour_start = h.hour_start AND c.event_type = ty.event_type)
        |SELECT hour_start, event_type,
        |  CAST(coalesce(last_value(n IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY hour_start
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS n_locf
        |FROM ax ORDER BY hour_start, event_type""".stripMargin,
    // Linear-interpolation fill, integer-exact: positions are the dense
    // axis row index per type; interp = (prev*(nextH-h)+next*(h-prevH))
    // * 1e6 // (nextH-prevH), all BIGINT with a non-negative numerator
    // so truncating division agrees across engines. Single-neighbor
    // edges stay NULL.
    "events_hourly_interp" ->
      """WITH b AS (SELECT min(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS lo,
        |            max(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hi FROM events),
        |h AS (SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b),
        |              INTERVAL 1 HOUR)) AS hour_start),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |c AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
        |        event_type, count(*) AS n
        |      FROM events GROUP BY 1, 2),
        |ax AS (SELECT h.hour_start, ty.event_type, c.n,
        |         CAST(row_number() OVER (PARTITION BY ty.event_type
        |           ORDER BY h.hour_start) AS BIGINT) AS hh
        |       FROM h CROSS JOIN ty
        |       LEFT JOIN c ON c.hour_start = h.hour_start AND c.event_type = ty.event_type),
        |nb AS (SELECT hour_start, event_type, n, hh,
        |         last_value(n IGNORE NULLS) OVER wp AS prev_v,
        |         last_value(CASE WHEN n IS NOT NULL THEN hh END IGNORE NULLS) OVER wp AS prev_h,
        |         first_value(n IGNORE NULLS) OVER wf AS next_v,
        |         first_value(CASE WHEN n IS NOT NULL THEN hh END IGNORE NULLS) OVER wf AS next_h
        |       FROM ax
        |       WINDOW wp AS (PARTITION BY event_type ORDER BY hour_start
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |              wf AS (PARTITION BY event_type ORDER BY hour_start
        |                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT hour_start, event_type,
        |  CAST(CASE WHEN n IS NOT NULL THEN n * 1000000
        |       ELSE (prev_v * (next_h - hh) + next_v * (hh - prev_h)) * 1000000
        |            // (next_h - prev_h) END AS BIGINT) AS n_interp_ppm
        |FROM nb ORDER BY hour_start, event_type""".stripMargin,
    // 6h-gap sessionization: lag flag → running sum → per-session rollup,
    // all integer epoch-millis arithmetic.
    "events_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms FROM events),
        |flagged AS (SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
        |                            OR ts_ms - lag(ts_ms) OVER w > 21600000
        |                           THEN 1 ELSE 0 END AS is_new
        |            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |ids AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |        FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_ms) AS start_ms, max(ts_ms) AS end_ms
        |FROM ids GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |                  AND o.o_orderdate >= TIMESTAMP '2001-06-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    // Exact per-language length quantiles (type-7 interpolation in both
    // engines; integer inputs → bit-identical doubles).
    "docs_length_quantiles" ->
      """SELECT lang,
        |  quantile_cont(n_chars, 0.5) AS p50,
        |  quantile_cont(n_chars, 0.9) AS p90,
        |  quantile_cont(n_chars, 0.99) AS p99,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // Repetition quality signals: the oracle recomputes the kernel's
    // single-pass counters with explode+group SQL (same split/trim/lower).
    "text_repetition_stats" ->
      """WITH base AS (SELECT doc_id, trim(lower(text)) AS t FROM documents),
        |words AS (SELECT doc_id, unnest(regexp_split_to_array(t, '\s+')) AS w
        |          FROM base WHERE t <> ''),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2),
        |wstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |                  CAST(max(c) AS BIGINT) AS top_word_count,
        |                  CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS repeated_words
        |           FROM wc GROUP BY 1),
        |warr AS (SELECT doc_id, regexp_split_to_array(t, '\s+') AS ws
        |         FROM base WHERE t <> ''),
        |bi AS (SELECT doc_id,
        |         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS b
        |       FROM warr WHERE len(ws) >= 2),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM bi GROUP BY 1, 2),
        |bstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |                  CAST(max(c) AS BIGINT) AS top_bigram_count FROM bc GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(w.n_words, 0) AS n_words,
        |  coalesce(w.top_word_count, 0) AS top_word_count,
        |  coalesce(w.repeated_words, 0) AS repeated_words,
        |  coalesce(b.n_bigrams, 0) AS n_bigrams,
        |  coalesce(b.top_bigram_count, 0) AS top_bigram_count,
        |  round(CAST(coalesce(w.repeated_words, 0) AS DOUBLE) /
        |        CAST(greatest(coalesce(w.n_words, 0), 1) AS DOUBLE), 6) AS repeated_word_fraction,
        |  round(CAST(coalesce(b.top_bigram_count, 0) AS DOUBLE) /
        |        CAST(greatest(coalesce(b.n_bigrams, 0), 1) AS DOUBLE), 6) AS top_bigram_fraction
        |FROM documents d
        |LEFT JOIN wstats w ON d.doc_id = w.doc_id
        |LEFT JOIN bstats b ON d.doc_id = b.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // As-of attribution: DuckDB's native ASOF LEFT JOIN vs our
    // union+window formulation — the temporal-join semantics check.
    "events_asof_attrib" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |            FROM events),
        |clicks AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'),
        |views  AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'view')
        |SELECT c.event_id, c.user_id, c.ts,
        |  v.event_id AS view_event_id, v.ts AS view_ts
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.ts
        |ORDER BY c.event_id""".stripMargin,
    // Pivot: fixed value list, FILTER-count equivalence (absent → 0).
    "events_pivot_counts" ->
      """SELECT user_id,
        |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Count-min-sketch contract check: n_users is the live anchor
    // (every distinct key probed); n_under = 0 is the CMS never-
    // underestimate guarantee (structural); n_over = 0 is the eps·N
    // bound, deterministic under the fixed seed (measured 0 per sf).
    "events_cms_check" ->
      """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(0 AS BIGINT) AS n_under, CAST(0 AS BIGINT) AS n_over
        |FROM events""".stripMargin,
    // Z-order clustered rectangle scan: the engine reads a manifest-
    // pruned file subset of its clustered copy; the oracle full-scans
    // the raw table — a green hash proves file skipping loses nothing.
    "events_zorder_pruned" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE user_id BETWEEN 10 AND 20 AND value BETWEEN 5 AND 10
        |ORDER BY event_id""".stripMargin,
    // Set operations: INTERSECT/EXCEPT restated verbatim in DuckDB.
    "events_audience_sets" ->
      """SELECT user_id, 'click_and_purchase' AS audience FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |UNION ALL
        |SELECT user_id, 'view_no_purchase' AS audience FROM (
        |  SELECT user_id FROM events WHERE event_type = 'view'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |ORDER BY audience, user_id""".stripMargin,
    // q17 shape: correlated scalar subquery, restated verbatim in DuckDB.
    "q17_avg_yearly" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
        |         AS avg_yearly
        |FROM lineitem l1
        |WHERE l_quantity < (SELECT 0.2 * avg(l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,
    // q18 shape: HAVING subquery semi-gates the join; deterministic top-100.
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 120)
        |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
        |  CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
        |  CAST(CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_qty
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
        |GROUP BY 1,2,3,4,5
        |ORDER BY o_totalprice DESC, o.o_orderkey LIMIT 100""".stripMargin,
    // Unpivot: UNION ALL restatement, labels = source column names.
    "lineitem_unpivot_charges" ->
      """WITH u AS (
        |  SELECT l_returnflag, 'l_extendedprice' AS component, l_extendedprice AS amount FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
        |SELECT l_returnflag, component,
        |  CAST(CAST(sum(CAST(amount AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS DOUBLE) AS total,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Window breadth: running decimal sum (ROWS frame), lag gap, lead,
    // ntile — one shared window order, deterministic tie-break.
    "events_user_running" ->
      """SELECT event_id, user_id,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER wf AS DECIMAL(18,6)) AS DOUBLE) AS run_sum,
        |  epoch_ms(CAST(ts AS TIMESTAMP)) - lag(epoch_ms(CAST(ts AS TIMESTAMP))) OVER wo AS gap_ms,
        |  lead(event_type) OVER wo AS next_type,
        |  CAST(ntile(4) OVER wo AS BIGINT) AS quartile
        |FROM events
        |WINDOW
        |  wo AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id),
        |  wf AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // ROLLUP with grouping id (Spark grouping_id bit order = 2*g(rf)+g(ls)).
    "q1_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) * 2 +
        |    CAST(grouping(l_linestatus) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q1_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) * 2 +
        |    CAST(grouping(l_linestatus) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    // Point-in-interval grid join vs DuckDB's native inequality join.
    "orders_window_shipments" ->
      """WITH pts AS (SELECT o.o_custkey AS ck, l.l_shipdate AS p
        |             FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |iv AS (SELECT o_orderkey, o_custkey AS ck, o_orderdate AS lo,
        |              o_orderdate + INTERVAL 30 DAY AS hi FROM orders)
        |SELECT iv.o_orderkey, CAST(count(*) AS BIGINT) AS n_shipments
        |FROM iv JOIN pts ON pts.ck = iv.ck AND pts.p >= iv.lo AND pts.p <= iv.hi
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_asof_next" ->
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |            FROM events),
        |clicks AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click'),
        |views  AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'view')
        |SELECT c.event_id, c.user_id, c.ts,
        |  v.event_id AS next_view_event_id, v.ts AS next_view_ts
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts <= v.ts
        |ORDER BY c.event_id""".stripMargin,
    // CDC: the oracle recomputes the synthesized-envelope semantics
    // directly from the events rows (mapping per CdcQueries scaladoc:
    // purchase→delete, mtime = epoch millis of ts / DMS string timestamp).
    "cdc_normalize_debezium" ->
      """SELECT event_type AS etype, event_id, user_id AS id, value,
        |  epoch_ms(ts) AS mtime, (event_type = 'purchase') AS _hoodie_is_deleted
        |FROM events ORDER BY event_id""".stripMargin,
    "cdc_normalize_strict" ->
      """SELECT event_type AS etype, event_id, user_id AS id, value,
        |  epoch_ms(ts) AS mtime, (event_type = 'purchase') AS _hoodie_is_deleted
        |FROM events ORDER BY event_id""".stripMargin,
    "cdc_normalize_dms" ->
      """SELECT event_type AS etype, event_id, user_id AS id, value,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS mtime,
        |  (event_type = 'purchase') AS _hoodie_is_deleted
        |FROM events ORDER BY event_id""".stripMargin,
    "cdc_normalize_flink" ->
      """SELECT event_type AS etype, event_id, user_id AS id, value,
        |  epoch_ms(ts) AS mtime, (event_type = 'purchase') AS _hoodie_is_deleted
        |FROM events ORDER BY event_id""".stripMargin,
    // Same oracle as cdc_normalize_debezium: InferAlways is the
    // reference's per-batch inference mode; the RESULT must be identical
    // to the cached mode, only the inference path differs.
    "cdc_normalize_inferalways" ->
      """SELECT event_type AS etype, event_id, user_id AS id, value,
        |  epoch_ms(ts) AS mtime, (event_type = 'purchase') AS _hoodie_is_deleted
        |FROM events ORDER BY event_id""".stripMargin,
    // DMS lexical ordering: dedup ranks by the STRING timestamp DESC
    // (fixed-width format, so lexical == chronological) — the oracle
    // orders by the very same string.
    "cdc_materialize_dms" ->
      """SELECT user_id AS id, event_id, event_type AS etype, value,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS mtime
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id
        |        ORDER BY strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') DESC,
        |                 event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'purchase' ORDER BY id""".stripMargin,
    "cdc_latest_rownumber" -> LatestSql,
    "cdc_latest_maxby"     -> LatestSql,
    "cdc_latest_sql"       -> LatestSql,
    "cdc_materialize_debezium" ->
      """SELECT user_id AS id, event_id, event_type AS etype, value, epoch_ms(ts) AS mtime
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'purchase' ORDER BY id""".stripMargin,
    "cdc_upsert_merge" ->
      """SELECT user_id AS id, event_id, event_type AS etype, value, epoch_ms(ts) AS mtime
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'purchase' ORDER BY id""".stripMargin,
    // Composite record key: latest per (id, etype); purchases are deletes
    // and never survive as keys.
    "cdc_composite_key" ->
      """SELECT user_id AS id, event_type AS etype, event_id, value, epoch_ms(ts) AS mtime
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id, event_type
        |        ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'purchase' ORDER BY id, etype""".stripMargin,
    // Same oracle as cdc_upsert_merge: the incremental bucketed layout
    // must produce the identical merged state.
    "cdc_bucketed_merge" ->
      """SELECT user_id AS id, event_id, event_type AS etype, value, epoch_ms(ts) AS mtime
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'purchase' ORDER BY id""".stripMargin,
    // Same oracle once more: the MERGE-ON-READ sink's delta-append +
    // read-side log merge must land on the identical final state.
    "cdc_mor_merge" ->
      """SELECT user_id AS id, event_id, event_type AS etype, value, epoch_ms(ts) AS mtime
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'purchase' ORDER BY id""".stripMargin,
    // Same oracle: the MOR snapshot-query VIEW read by name must serve
    // the identical merged state (the log fold lives in the view body).
    "cdc_mor_catalog" ->
      """SELECT user_id AS id, event_id, event_type AS etype, value, epoch_ms(ts) AS mtime
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'purchase' ORDER BY id""".stripMargin,
    // Same oracle again: the bucketed sink's catalog VIEW read by name
    // must equal the merged state (the 100 TB layout's hive-sync).
    "cdc_bucketed_catalog" ->
      """SELECT user_id AS id, event_id, event_type AS etype, value, epoch_ms(ts) AS mtime
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'purchase' ORDER BY id""".stripMargin,
    // Same oracle as cdc_upsert_merge: the by-name (catalog) read must
    // equal the merged state the two-batch upsert produced.
    "cdc_catalog_table" ->
      """SELECT user_id AS id, event_id, event_type AS etype, value, epoch_ms(ts) AS mtime
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'purchase' ORDER BY id""".stripMargin,
    "cdc_router_counts" ->
      """SELECT CASE WHEN user_id % 2 = 0 THEN 'user' ELSE 'product' END AS tbl,
        |  count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY tbl""".stripMargin,
    // DMS mixed stream: control records are rejected by the router, so
    // every count covers data records only; 'any' is the regex config
    // (user|product) matching both tables.
    "cdc_router_counts_dms" ->
      """SELECT tbl, cnt FROM (
        |  SELECT 'user' AS tbl, count(*) AS cnt FROM events WHERE user_id % 2 = 0
        |  UNION ALL
        |  SELECT 'product' AS tbl, count(*) AS cnt FROM events WHERE user_id % 2 <> 0
        |  UNION ALL
        |  SELECT 'any' AS tbl, count(*) AS cnt FROM events
        |) t ORDER BY tbl""".stripMargin,
    // Salted join ≡ plain join: the oracle computes the unsalted
    // semantics; the Spark side runs through SkewJoin.saltedJoin.
    "skew_join_sales" ->
      """SELECT n_name, count(*) AS n_orders,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_price
        |FROM orders JOIN nation
        |  ON (CASE WHEN o_orderkey % 10 < 7 THEN 0 ELSE o_orderkey % 25 END) = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "llm_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,
    // The sh0→sh df-cap mirrors the engine's JaccardMaxDf = 50 hot-shingle
    // cap (binds nothing on the test corpus; identical arithmetic).
    "llm_dedup_corpus" ->
      s"""WITH w AS (SELECT doc_id, $WL AS ws FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, array_to_string(ws[g:g+2], ' ') AS shingle
         |       FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(g)
         |       WHERE len(ws) >= 3),
         |sh AS (SELECT doc_id, shingle FROM sh0
         |       WHERE shingle IN (SELECT shingle FROM sh0
         |                         GROUP BY shingle HAVING count(*) <= 50)),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
         |          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id),
         |losers AS (SELECT DISTINCT id_b FROM inter
         |           JOIN sizes sa ON inter.id_a = sa.doc_id
         |           JOIN sizes sb ON inter.id_b = sb.doc_id
         |           WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5),
         |survivors AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
         |SELECT d.doc_id, d.lang, d.n_chars FROM documents d
         |JOIN survivors s ON d.doc_id = s.doc_id
         |WHERE d.doc_id NOT IN (SELECT id_b FROM losers)
         |ORDER BY d.doc_id""".stripMargin,
    // Connected components over the SAME capped pair set as
    // llm_dedup_corpus (threshold 0.5): the recursive CTE computes the
    // transitive closure and takes the min reachable id per node —
    // exactly what large-star/small-star converges to.
    "llm_dedup_cc" ->
      s"""WITH RECURSIVE w AS (SELECT doc_id, $WL AS ws FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, array_to_string(ws[g:g+2], ' ') AS shingle
         |       FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(g)
         |       WHERE len(ws) >= 3),
         |sh AS (SELECT doc_id, shingle FROM sh0
         |       WHERE shingle IN (SELECT shingle FROM sh0
         |                         GROUP BY shingle HAVING count(*) <= 50)),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
         |          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id),
         |pairs AS (SELECT id_a, id_b FROM inter
         |          JOIN sizes sa ON inter.id_a = sa.doc_id
         |          JOIN sizes sb ON inter.id_b = sb.doc_id
         |          WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT u AS id FROM edges),
         |reach AS (SELECT id, id AS r FROM nodes
         |          UNION
         |          SELECT reach.id, e.v AS r FROM reach JOIN edges e ON reach.r = e.u)
         |SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS comp
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    // CC-collapsed terminal corpus: the same recursive-CTE components,
    // feeding exact-survivor selection minus non-representatives.
    "llm_dedup_corpus_cc" ->
      s"""WITH RECURSIVE w AS (SELECT doc_id, $WL AS ws FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, array_to_string(ws[g:g+2], ' ') AS shingle
         |       FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(g)
         |       WHERE len(ws) >= 3),
         |sh AS (SELECT doc_id, shingle FROM sh0
         |       WHERE shingle IN (SELECT shingle FROM sh0
         |                         GROUP BY shingle HAVING count(*) <= 50)),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
         |          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id),
         |pairs AS (SELECT id_a, id_b FROM inter
         |          JOIN sizes sa ON inter.id_a = sa.doc_id
         |          JOIN sizes sb ON inter.id_b = sb.doc_id
         |          WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT u AS id FROM edges),
         |reach AS (SELECT id, id AS r FROM nodes
         |          UNION
         |          SELECT reach.id, e.v AS r FROM reach JOIN edges e ON reach.r = e.u),
         |comps AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
         |survivors AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)
         |SELECT d.doc_id, d.lang, d.n_chars FROM documents d
         |JOIN survivors s ON d.doc_id = s.doc_id
         |WHERE d.doc_id NOT IN (SELECT id FROM comps WHERE comp <> id)
         |ORDER BY d.doc_id""".stripMargin,
    "llm_neardup_jaccard" ->
      s"$JaccardPairsSql\nORDER BY id_a, id_b",
    // The prefix-filtered variant and its full-inverted-index twin run
    // at the PRODUCTION near-dup threshold (0.8, uncapped) and share
    // one oracle body — both equal to DuckDB ground truth IS the
    // prefix principle's losslessness proof.
    "llm_neardup_jaccard_prefix" ->
      s"$JaccardPairsHiSql\nORDER BY id_a, id_b",
    "llm_neardup_jaccard_hi" ->
      s"$JaccardPairsHiSql\nORDER BY id_a, id_b",
    // Candidate-reduction evidence: the oracle recomputes the full
    // inverted-index candidate count, the prefix-index candidate count
    // (same rarest-first (df, shingle) order, same rank inequality with
    // the same 1e-9 slack — IEEE-identical arithmetic in both engines),
    // and the final qualifying pair count.
    "llm_prefix_candidate_stats" ->
      s"""WITH w AS (SELECT doc_id, $WL AS ws FROM documents),
         |sh AS (SELECT DISTINCT doc_id, array_to_string(ws[g:g+2], ' ') AS shingle
         |       FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(g)
         |       WHERE len(ws) >= 3),
         |df AS (SELECT shingle, count(*) AS gdf FROM sh GROUP BY shingle),
         |szs AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |rk AS (SELECT s.doc_id, s.shingle, z.n_sh,
         |         row_number() OVER (PARTITION BY s.doc_id
         |                            ORDER BY d.gdf, s.shingle) AS rnk
         |       FROM sh s JOIN df d USING (shingle) JOIN szs z USING (doc_id)),
         |pre AS (SELECT doc_id, shingle, n_sh FROM rk
         |        WHERE CAST(n_sh - rnk + 1 AS DOUBLE) >=
         |              0.8 * CAST(n_sh AS DOUBLE) - 1e-9),
         |fullc AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id),
         |prec AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM pre a JOIN pre b USING (shingle)
         |         WHERE a.doc_id < b.doc_id
         |           AND CAST(least(a.n_sh, b.n_sh) AS DOUBLE) >=
         |               0.8 * CAST(greatest(a.n_sh, b.n_sh) AS DOUBLE) - 1e-9),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
         |          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id),
         |outp AS (SELECT id_a FROM inter
         |         JOIN szs sa ON inter.id_a = sa.doc_id
         |         JOIN szs sb ON inter.id_b = sb.doc_id
         |         WHERE CAST(n_inter AS DOUBLE) /
         |               CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.8)
         |SELECT (SELECT count(*) FROM fullc) AS full_cands,
         |       (SELECT count(*) FROM prec) AS prefix_cands,
         |       (SELECT count(*) FROM outp) AS pairs_out""".stripMargin,
    // Span-level exact substring dedup (Lee et al. 2022): the oracle
    // groups windows by their TEXT; the engine groups by a 128-bit
    // fingerprint — identical output short of a 2^-128-scale collision
    // (disclosed in SpanDedup's scaladoc; text/fingerprint parity is
    // additionally spec-asserted on this corpus).
    "llm_span_dedup" ->
      s"""WITH w AS (SELECT doc_id, $WL AS ws FROM documents),
         |g AS (SELECT doc_id, i AS pos, array_to_string(ws[i:i+11], ' ') AS gram
         |      FROM w, unnest(generate_series(1, len(ws) - 11)) AS t(i)
         |      WHERE len(ws) >= 12),
         |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
         |hits AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup)),
         |isl AS (SELECT doc_id, pos,
         |          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 12
         |               THEN 0 ELSE 1 END AS brk
         |        FROM hits),
         |sp AS (SELECT doc_id, pos,
         |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |       FROM isl)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |  CAST(max(pos) + 11 AS BIGINT) AS span_end,
         |  CAST(max(pos) + 11 - min(pos) + 1 AS BIGINT) AS span_words
         |FROM sp GROUP BY doc_id, island
         |ORDER BY doc_id, span_start""".stripMargin,
    "llm_span_dedup_stats" ->
      s"""WITH w AS (SELECT doc_id, $WL AS ws FROM documents),
         |g AS (SELECT doc_id, i AS pos, array_to_string(ws[i:i+11], ' ') AS gram
         |      FROM w, unnest(generate_series(1, len(ws) - 11)) AS t(i)
         |      WHERE len(ws) >= 12),
         |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
         |hits AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup)),
         |isl AS (SELECT doc_id, pos,
         |          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 12
         |               THEN 0 ELSE 1 END AS brk
         |        FROM hits),
         |sp AS (SELECT doc_id, pos,
         |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |       FROM isl),
         |spans AS (SELECT doc_id, max(pos) + 11 - min(pos) + 1 AS span_words
         |          FROM sp GROUP BY doc_id, island),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |          CAST(sum(len(ws)) AS BIGINT) AS total_words FROM w)
         |SELECT tot.n_docs, tot.total_words,
         |  CAST(count(DISTINCT spans.doc_id) AS BIGINT) AS docs_affected,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(spans.span_words) AS BIGINT) AS dup_words,
         |  CAST(sum(spans.span_words) AS DOUBLE) / tot.total_words AS dup_fraction
         |FROM spans, tot GROUP BY tot.n_docs, tot.total_words""".stripMargin,
    // Incremental ≡ full-recompute-restricted: the SAME span CTE over
    // CCNet/Dolma line-level dedup: "lines" are 10-word chunks (the
    // single-line fixture corpus has no newlines — disclosed adapter in
    // LlmQueries.LineW; a real corpus feeds LineDedup.lines the same
    // machinery). The oracle groups lines by TEXT; the engine by a
    // 128-bit fingerprint — identical short of a 2^-128-scale collision
    // (the SpanDedup disclosure; parity additionally spec-asserted).
    "llm_line_dedup_stats" ->
      s"""WITH w0 AS (SELECT doc_id, $WL AS ws FROM documents),
         |w AS (SELECT * FROM w0
         |      WHERE len(ws) >= 1 AND NOT (len(ws) = 1 AND ws[1] = '')),
         |l AS (SELECT doc_id, i + 1 AS line_idx,
         |        array_to_string(ws[(i*10+1):(i*10+10)], ' ') AS line
         |      FROM w, unnest(generate_series(0, (len(ws)-1)//10)) AS t(i)),
         |g AS (SELECT line, count(DISTINCT doc_id) AS df, count(*) AS n_occ
         |      FROM l GROUP BY line)
         |SELECT CAST(sum(n_occ) AS BIGINT) AS n_lines,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
         |  CAST(sum(CASE WHEN df >= 2 THEN n_occ ELSE 0 END) AS BIGINT) AS occ_dropped,
         |  CAST(max(df) AS BIGINT) AS max_df
         |FROM g""".stripMargin,
    "llm_line_dedup" ->
      s"""WITH w0 AS (SELECT doc_id, $WL AS ws FROM documents),
         |w AS (SELECT * FROM w0
         |      WHERE len(ws) >= 1 AND NOT (len(ws) = 1 AND ws[1] = '')),
         |l AS (SELECT doc_id, i + 1 AS line_idx,
         |        array_to_string(ws[(i*10+1):(i*10+10)], ' ') AS line
         |      FROM w, unnest(generate_series(0, (len(ws)-1)//10)) AS t(i)),
         |hot AS (SELECT line FROM l GROUP BY line
         |        HAVING count(DISTINCT doc_id) >= 2),
         |f AS (SELECT doc_id, line_idx, line,
         |        line IN (SELECT line FROM hot) AS dropped FROM l),
         |a AS (SELECT doc_id,
         |        coalesce(string_agg(CASE WHEN NOT dropped THEN line END,
         |                            ' ' ORDER BY line_idx), '') AS text,
         |        CAST(sum(CASE WHEN NOT dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |        CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
         |      FROM f GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.text, '') AS text,
         |  coalesce(a.n_kept, 0) AS n_kept,
         |  coalesce(a.n_dropped, 0) AS n_dropped
         |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // Strict keep-first: Spark's min(struct(doc_id, line_idx)) ==
    // row_number ordered by (doc_id, line_idx) — both total orders.
    "llm_line_dedup_first" ->
      s"""WITH w0 AS (SELECT doc_id, $WL AS ws FROM documents),
         |w AS (SELECT * FROM w0
         |      WHERE len(ws) >= 1 AND NOT (len(ws) = 1 AND ws[1] = '')),
         |l AS (SELECT doc_id, i + 1 AS line_idx,
         |        array_to_string(ws[(i*10+1):(i*10+10)], ' ') AS line
         |      FROM w, unnest(generate_series(0, (len(ws)-1)//10)) AS t(i)),
         |f AS (SELECT doc_id, line_idx, line,
         |        row_number() OVER (PARTITION BY line
         |                           ORDER BY doc_id, line_idx) AS rn
         |      FROM l),
         |a AS (SELECT doc_id,
         |        coalesce(string_agg(CASE WHEN rn = 1 THEN line END,
         |                            ' ' ORDER BY line_idx), '') AS text,
         |        CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |        CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
         |      FROM f GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.text, '') AS text,
         |  coalesce(a.n_kept, 0) AS n_kept,
         |  coalesce(a.n_dropped, 0) AS n_dropped
         |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // Incremental ≡ full-recompute-restricted: hot lines judged over
    // ALL documents (corpus + shard frequencies), the rewrite restricted
    // to shard docs. The engine never re-splits the corpus — it probes
    // the persisted per-epoch line-frequency partials — so a green hash
    // proves the df-sum arithmetic exactly.
    "llm_line_dedup_incremental" ->
      s"""WITH w0 AS (SELECT doc_id, $WL AS ws FROM documents),
         |w AS (SELECT * FROM w0
         |      WHERE len(ws) >= 1 AND NOT (len(ws) = 1 AND ws[1] = '')),
         |l AS (SELECT doc_id, i + 1 AS line_idx,
         |        array_to_string(ws[(i*10+1):(i*10+10)], ' ') AS line
         |      FROM w, unnest(generate_series(0, (len(ws)-1)//10)) AS t(i)),
         |hot AS (SELECT line FROM l GROUP BY line
         |        HAVING count(DISTINCT doc_id) >= 2),
         |f AS (SELECT doc_id, line_idx, line,
         |        line IN (SELECT line FROM hot) AS dropped
         |      FROM l WHERE doc_id % 10 = 0),
         |a AS (SELECT doc_id,
         |        coalesce(string_agg(CASE WHEN NOT dropped THEN line END,
         |                            ' ' ORDER BY line_idx), '') AS text,
         |        CAST(sum(CASE WHEN NOT dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |        CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
         |      FROM f GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.text, '') AS text,
         |  coalesce(a.n_kept, 0) AS n_kept,
         |  coalesce(a.n_dropped, 0) AS n_dropped
         |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
         |WHERE d.doc_id % 10 = 0
         |ORDER BY d.doc_id""".stripMargin,
    // Dolma-style PII masking. The corpus contains no PII (zero matches
    // for every pattern, verified at all sfs), so the fixture PLANTS
    // emails/IPs/phones deterministically from doc_id — the `p` CTE is
    // the byte-identical twin of LlmQueries.piiDocs, and the regexes
    // use only syntax with identical Java/RE2 semantics (PiiRedact
    // scaladoc). Redaction + counts are what the hash gates.
    "llm_pii_redact" ->
      s"""WITH p AS ($PiiPlantedSql)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '$PiiEmailSql', '|||EMAIL_ADDRESS|||', 'g'),
         |    '$PiiIpSql', '|||IP_ADDRESS|||', 'g'),
         |    '$PiiPhoneSql', '|||PHONE_NUMBER|||', 'g') AS text,
         |  CAST(len(regexp_extract_all(text, '$PiiEmailSql')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$PiiIpSql')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(text, '$PiiPhoneSql')) AS BIGINT) AS n_phones
         |FROM p ORDER BY doc_id""".stripMargin,
    "llm_pii_stats" ->
      s"""WITH p AS ($PiiPlantedSql),
         |c AS (SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$PiiEmailSql')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$PiiIpSql')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(text, '$PiiPhoneSql')) AS BIGINT) AS n_phones
         |FROM p)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN n_emails + n_ips + n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
         |  CAST(sum(n_emails) AS BIGINT) AS n_emails,
         |  CAST(sum(n_ips) AS BIGINT) AS n_ips,
         |  CAST(sum(n_phones) AS BIGINT) AS n_phones
         |FROM c""".stripMargin,
    // DSIR importance scoring (Xie et al. 2023): target = lang 'en',
    // raw = the rest; unigram+bigram features, Laplace over the union
    // vocabulary, the log-ratio quantized to whole bits with the same
    // integer bitlen arithmetic as llm_lm_score — so per-doc BIGINT
    // totals and the single final division are bit-identical across
    // engines. The engine keys the model on 128-bit fingerprints; the
    // oracle on feature text (the SpanDedup collision argument).
    "llm_dsir_score" ->
      s"""$DsirScoreSql
         |SELECT doc_id, CAST(n_features AS BIGINT) AS n_features,
         |  CAST(score_bits AS BIGINT) AS score_bits,
         |  CAST(score_bits AS DOUBLE) / n_features AS bits_per_feature
         |FROM sc ORDER BY doc_id""".stripMargin,
    // Deterministic top-k selection under the (score DESC, id) total
    // order — the resampling stand-in the operator reproduces exactly.
    "llm_dsir_select" ->
      s"""$DsirScoreSql,
         |sel AS (SELECT * FROM sc ORDER BY score_bits DESC, doc_id LIMIT 50)
         |SELECT doc_id, CAST(n_features AS BIGINT) AS n_features,
         |  CAST(score_bits AS BIGINT) AS score_bits,
         |  CAST(score_bits AS DOUBLE) / n_features AS bits_per_feature
         |FROM sel ORDER BY doc_id""".stripMargin,
    // FineWeb-style URL stage. The corpus has no URL column, so the
    // fixture derives a deliberately messy one deterministically from
    // (doc_id, source) — the `p` CTE is the byte-identical twin of
    // LlmQueries.urlDocs — and the oracle restates every
    // canonicalization rule as its own CTE; the hash gates rules 1-6
    // plus host/eTLD+1 extraction per document.
    "llm_url_normalize" ->
      s"""$UrlDomainCteSql
         |SELECT doc_id, url, url_canon, host, domain
         |FROM d ORDER BY doc_id""".stripMargin,
    // Per-domain cap: the engine's skew-safe two-phase top-N must equal
    // the oracle's single row_number() window under the deterministic
    // (n_chars DESC, doc_id) total order.
    "llm_domain_cap" ->
      s"""$UrlDomainCteSql,
         |r AS (SELECT doc_id, domain, n_chars,
         |        row_number() OVER (PARTITION BY domain
         |          ORDER BY n_chars DESC, doc_id) AS rk FROM d)
         |SELECT doc_id, domain, n_chars FROM r
         |WHERE rk <= ${graft.queries.LlmQueries.DomainCapN}
         |ORDER BY doc_id""".stripMargin,
    "llm_domain_stats" ->
      s"""$UrlDomainCteSql,
         |r AS (SELECT domain, n_chars,
         |        row_number() OVER (PARTITION BY domain
         |          ORDER BY n_chars DESC, doc_id) AS rk FROM d)
         |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN rk <= ${graft.queries.LlmQueries.DomainCapN}
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN rk <= ${graft.queries.LlmQueries.DomainCapN}
         |    THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept
         |FROM r GROUP BY domain ORDER BY domain""".stripMargin,
    // Incremental first-come domain admission: the oracle recomputes
    // the persisted budget live (first-come kept counts over the
    // existing split are just least(count, cap)) and ranks the shard
    // within it — the full-recompute restriction the index must equal.
    "llm_domain_cap_incremental" ->
      s"""$UrlDomainCteSql,
         |oldc AS (SELECT domain, least(count(*), ${graft.queries.LlmQueries.DomainAdmitCap}) AS n_old
         |         FROM d WHERE doc_id % 10 <> 0 GROUP BY domain),
         |b AS (SELECT doc_id, domain,
         |        row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rk
         |      FROM d WHERE doc_id % 10 = 0)
         |SELECT b.doc_id, b.domain,
         |  CAST(CASE WHEN coalesce(o.n_old, 0) + b.rk <=
         |    ${graft.queries.LlmQueries.DomainAdmitCap} THEN 1 ELSE 0 END AS INT) AS admitted
         |FROM b LEFT JOIN oldc o ON b.domain = o.domain
         |ORDER BY b.doc_id""".stripMargin,
    // Fixed-point PageRank: 10 chained CTEs reproduce the engine's
    // integer iteration bit-for-bit (rank DIV deg contributions,
    // (85*sum) DIV 100 damping) — see graft.ext.PageRank for why
    // fixed-point makes the result hash-gateable across engines.
    "llm_pagerank" -> pagerankOracleSql(iters = 10),
    // Mass-conserving variant over a graph with real dangling nodes:
    // the per-round redistribution (D DIV |nodes| added to every
    // incoming sum) restated in the same chained CTEs, bit-for-bit.
    "llm_pagerank_dangling" -> pagerankOracleSql(iters = 10, dangling = true),
    "llm_pagerank_warm" -> pagerankWarmOracleSql(coldIters = 10, warmIters = 4),
    // Seeded-permutation training shuffle: the oracle runs the SAME
    // affine map (constants interpolated from ShardShuffle.affineConsts,
    // so the two engines cannot drift) and the same range-slice/rank.
    "llm_shuffle_shards" ->
      s"""$ShuffleCteSql
         |SELECT doc_id, shard, pos_in_shard FROM r ORDER BY doc_id""".stripMargin,
    "llm_shuffle_stats" ->
      s"""$ShuffleCteSql
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(min(pos_in_shard) AS BIGINT) AS min_pos,
         |  CAST(max(pos_in_shard) AS BIGINT) AS max_pos,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM r GROUP BY shard ORDER BY shard""".stripMargin,
    // Split-leakage audit: cross-split near-dup pairs and the per-split
    // rollup, over the identical capped 0.5-threshold pair CTE.
    "llm_split_leakage" ->
      s"""$SplitLeakCteSql
         |SELECT val_doc, train_doc, jaccard FROM leak
         |ORDER BY val_doc, train_doc""".stripMargin,
    "llm_split_stats" ->
      s"""$SplitLeakCteSql,
         |d AS (SELECT CASE WHEN (doc_id * ${graft.ext.Sampling.Multiplier})
         |        % ${graft.ext.Sampling.Prime} % ${graft.ext.Sampling.Million}
         |        < ${graft.queries.LlmQueries.ValPpm}
         |      THEN 'val' ELSE 'train' END AS split, n_chars FROM documents),
         |ld AS (SELECT DISTINCT 'val' AS split, val_doc AS doc_id FROM leak
         |       UNION SELECT DISTINCT 'train', train_doc FROM leak),
         |lc AS (SELECT split, CAST(count(*) AS BIGINT) AS n_leak_docs
         |       FROM ld GROUP BY split),
         |base AS (SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |           CAST(sum(n_chars) AS BIGINT) AS chars_sum
         |         FROM d GROUP BY split)
         |SELECT base.split, n_docs, chars_sum,
         |  CAST(coalesce(n_leak_docs, 0) AS BIGINT) AS n_leak_docs
         |FROM base LEFT JOIN lc USING (split) ORDER BY base.split""".stripMargin,
    // Leakage-free split: the oracle independently re-derives the pair
    // graph, its components (recursive CTE), the component-keyed
    // split, and the crossing-pair count — a live 0 = 0 gate, not a
    // pinned zero.
    "llm_split_safe" ->
      s"""$SplitSafeCteSql
         |SELECT doc_id, split FROM sp ORDER BY doc_id""".stripMargin,
    "llm_split_safe_stats" ->
      s"""$SplitSafeCteSql
         |SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM sp WHERE split = 'train')
         |    AS n_train,
         |  (SELECT CAST(count(*) AS BIGINT) FROM sp WHERE split = 'val')
         |    AS n_val,
         |  (SELECT CAST(count(*) AS BIGINT) FROM pairs p
         |     JOIN sp a ON p.id_a = a.doc_id
         |     JOIN sp b ON p.id_b = b.doc_id
         |   WHERE a.split <> b.split) AS leak_pairs""".stripMargin,
    // Snapshot diff: the oracle rebuilds both fixture versions and
    // classifies by comparing TEXT directly — the engine's map-side
    // digest shortcut must land on identical statuses.
    "llm_snapshot_diff" ->
      s"""$SnapshotCteSql
         |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         |  CASE WHEN o.doc_id IS NULL THEN 'added'
         |       WHEN n.doc_id IS NULL THEN 'removed'
         |       WHEN o.text <> n.text THEN 'changed'
         |       ELSE 'unchanged' END AS status
         |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
         |ORDER BY doc_id""".stripMargin,
    "llm_snapshot_diff_stats" ->
      s"""$SnapshotCteSql,
         |d AS (SELECT CASE WHEN o.doc_id IS NULL THEN 'added'
         |        WHEN n.doc_id IS NULL THEN 'removed'
         |        WHEN o.text <> n.text THEN 'changed'
         |        ELSE 'unchanged' END AS status
         |      FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
         |SELECT status, CAST(count(*) AS BIGINT) AS n_docs
         |FROM d GROUP BY status ORDER BY status""".stripMargin,
    // Incremental diff: the full-diff CASE restricted to the arriving
    // shard's ids (removals are whole-snapshot facts, so the shard form
    // reports added/changed/unchanged only).
    "llm_snapshot_diff_incremental" ->
      """WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
        |b AS (SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN text || ' v2'
        |        ELSE text END AS text
        |      FROM documents WHERE doc_id % 10 = 0)
        |SELECT b.doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN o.text <> b.text THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM b LEFT JOIN o ON b.doc_id = o.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    // NFC normalization: the oracle plants the identical denormalized
    // suffixes via chr() (one exemplar per NFC rule family) and
    // normalizes with DuckDB's utf8proc — a green hash proves the JVM
    // and utf8proc NFC kernels agree byte-for-byte.
    "text_nfc_normalize" ->
      s"""$NfcPlantCteSql
         |SELECT doc_id, nfc_normalize(text) AS norm_text,
         |  CAST(length(text) AS BIGINT) AS len_raw,
         |  CAST(length(nfc_normalize(text)) AS BIGINT) AS len_norm,
         |  nfc_normalize(text) <> text AS changed
         |FROM p ORDER BY doc_id""".stripMargin,
    // Accent folding over the same planted corpus: DuckDB's
    // strip_accents is utf8proc NFD→STRIPMARK(Mn/Mc/Me)→NFC — the
    // engine's expression restates exactly that chain on the JVM.
    "text_strip_accents" ->
      s"""$NfcPlantCteSql
         |SELECT doc_id, strip_accents(text) AS stripped,
         |  CAST(length(text) AS BIGINT) AS len_raw,
         |  CAST(length(strip_accents(text)) AS BIGINT) AS len_stripped
         |FROM p ORDER BY doc_id""".stripMargin,
    // WARC/WET container round-trip: the engine wraps the corpus into
    // real WARC/1.0 WET files (CRLF framing, Content-Length octets;
    // gz variant = one gzip member per record, the Common Crawl layout)
    // and parses them back map-side. The oracle reads the ORIGINAL
    // table — a green hash proves the container framing byte-exactly.
    "warc_wet_roundtrip" ->
      """SELECT doc_id, text,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS content_length
        |FROM documents ORDER BY doc_id""".stripMargin,
    "warc_gz_roundtrip" ->
      """SELECT doc_id, text,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS content_length
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Raw-crawl HTML extraction: the engine wraps each doc in a fixture
    // page with noise planted on every rule (raw-text drops, comments,
    // attribute '>', inline tags, padding whitespace, entities), frames
    // it as WARC `response` records (.warc.gz layout), and extracts the
    // text back. The oracle rebuilds the EXPECTED extraction from the
    // original table + the planted constants (title line, entity
    // exemplar line with chr() for quote/apostrophe/NBSP) — a green
    // hash proves HTTP split + all extraction rule families.
    "warc_html_extract" ->
      """SELECT doc_id,
        |  'planted-title-' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |  text || chr(10) ||
        |  'amp=& lt=< gt=> quot=' || chr(34) || ' apos=' || chr(39) ||
        |  ' dec=A hex=B' || chr(10) || 'nbsp=' || chr(160) || 'end' AS text
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Wire-encoded twin: same extraction chain with the HTTP bodies
    // stored AS RECEIVED (gzip / deflate / chunked / gzip+chunked per
    // doc_id % 5, Common Crawl's storage contract); the shared oracle
    // proves de-chunk + inflate restore the bytes exactly.
    "warc_html_extract_encoded" ->
      """SELECT doc_id,
        |  'planted-title-' || CAST(doc_id AS VARCHAR) || chr(10) ||
        |  text || chr(10) ||
        |  'amp=& lt=< gt=> quot=' || chr(34) || ' apos=' || chr(39) ||
        |  ' dec=A hex=B' || chr(10) || 'nbsp=' || chr(160) || 'end' AS text
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Charset-resolution chain (ext/CharsetDetect.scala): the engine
    // plants each page's HTTP body under doc_id%7 of {ctype utf-8,
    // utf-16le BOM over a wrong ctype, utf-16be BOM, <meta> latin-1,
    // ctype GBK, http-equiv cp1252, undeclared latin-1 fallback}, each
    // with a per-charset non-ASCII exemplar line; the oracle
    // reconstructs the exemplar from the same constants — a green hash
    // proves BOM > Content-Type > meta > probe precedence end-to-end.
    "warc_charset_extract" ->
      s"""SELECT doc_id,
         |  'planted-title-' || CAST(doc_id AS VARCHAR) || chr(10) ||
         |  text || chr(10) ||
         |  'amp=& lt=< gt=> quot=' || chr(34) || ' apos=' || chr(39) ||
         |  ' dec=A hex=B' || chr(10) || 'nbsp=' || chr(160) || 'end' || chr(10) ||
         |  'charset-exemplar: ' || CASE CAST(doc_id % 7 AS INTEGER)
         |    ${graft.ext.Warc.CharsetExemplars.zipWithIndex
              .map { case (e, i) => s"WHEN $i THEN '$e'" }.mkString("\n|    ")}
         |  END AS text
         |FROM documents ORDER BY doc_id""".stripMargin,
    // JSONL (Dolma/RedPajama layout) round-trip: serialize → line-frame
    // → explicit-schema FAILFAST parse; the oracle reads the ORIGINAL
    // table, so a green hash proves escaping + framing byte-exactly.
    // The gz variant shares the SQL (the decontam/bloom pattern).
    "llm_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "llm_jsonl_gz_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "llm_jsonl_zst_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Inferred-schema twin: no schema contract supplied — the struct is
    // inferred from a bounded head probe of every shard, then parsed
    // FAILFAST; the shared SQL proves inferred TYPES landed exactly.
    "llm_jsonl_inferred_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Format round-trips through Spark's built-in ORC / CSV
    // datasources: the oracle reads the ORIGINAL parquet table, so a
    // green hash proves type-exact round-tripping (the jsonl pattern).
    "llm_orc_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "llm_csv_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Avro object-container round-trip (ext/AvroIo.scala): same
    // original-table oracle as jsonl/ORC/CSV — green hash proves the
    // container encode/decode is type- and byte-exact.
    "llm_avro_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // TFRecord round-trip (ext/TfRecordIo.scala): hand-rolled
    // tf.train.Example protobuf + CRC32C framing; same original-table
    // oracle — green hash proves varint/proto/framing byte-exactly.
    "llm_tfrecord_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "llm_tfrecord_gz_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "llm_tfrecord_zst_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // TFRecord LIST features — the packed token-id sequence plus
    // parallel bytes/float lists, one Example per doc, every element
    // exploded back out: the oracle restates each (doc, pos, tok, id,
    // weight) tuple from the ORIGINAL table (lateral generate_series
    // index, 1-based list subscript), so a green hash proves
    // multi-value encode/decode element-exactly.
    "llm_tfrecord_tokens_roundtrip" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(text,
        |    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS toks FROM documents),
        |e AS (SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos, toks[u.i] AS tok
        |      FROM t, unnest(generate_series(1, len(toks))) AS u(i))
        |SELECT doc_id, pos, tok,
        |       CAST(length(tok) AS BIGINT) * 1000003 + pos AS tok_id,
        |       CAST(length(tok) AS FLOAT4) AS tf
        |FROM e ORDER BY doc_id, pos""".stripMargin,
    // Schema-INFERRED TFRecord read (the reference's per-batch
    // spark.read.json inference theme, applied to the container): no
    // schema supplied; inference yields list-superset columns and
    // element_at recovers the scalars — original-table oracle.
    "llm_tfrecord_inferred_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Training-shard delivery chain: concat-then-chunk pack assignment
    // (the llm_pack_stats layout) -> per-pack token-id sequences
    // concatenated in doc order -> TFRecord int64_list Examples ->
    // read back -> length + id checksum + POSITION-WEIGHTED checksum
    // (pins concatenation order). The oracle restates everything live:
    // shard scramble, running offsets, within-pack offsets (start
    // offset minus the pack's first-doc offset), per-token fingerprint
    // ids — all BIGINT-exact in both engines.
    "llm_tfrecord_pack_chain" ->
      """WITH d AS (SELECT doc_id,
        |    ((doc_id * 2654435761) % 1000000007) % 1000000 % 8 AS shard,
        |    regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS toks,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |laid AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS so
        |         FROM d),
        |p AS (SELECT *, CAST(so // 2048 AS BIGINT) AS pack_id,
        |        so - min(so) OVER (PARTITION BY shard, so // 2048) AS off_in_pack
        |      FROM laid),
        |docagg AS (SELECT CAST(shard AS BIGINT) AS shard, pack_id,
        |        count(*) AS n_docs
        |      FROM p GROUP BY 1, 2),
        |t AS (SELECT CAST(shard AS BIGINT) AS shard, pack_id,
        |        CAST(len(toks[u.i]) AS BIGINT) * 1000003 + (u.i - 1) AS id,
        |        off_in_pack + (u.i - 1) AS wpos
        |      FROM p, unnest(generate_series(1, len(toks))) AS u(i)),
        |tokagg AS (SELECT shard, pack_id, count(*) AS n_ids,
        |        CAST(sum(id) AS BIGINT) AS id_checksum,
        |        CAST(sum(id * wpos) AS BIGINT) AS pos_checksum
        |      FROM t GROUP BY 1, 2)
        |SELECT d.shard, d.pack_id, d.n_docs,
        |  coalesce(tk.n_ids, 0) AS n_ids,
        |  coalesce(tk.id_checksum, 0) AS id_checksum,
        |  coalesce(tk.pos_checksum, 0) AS pos_checksum
        |FROM docagg d LEFT JOIN tokagg tk USING (shard, pack_id)
        |ORDER BY shard, pack_id""".stripMargin,
    // Sliding-window chunking (ext/Chunker.scala): generate_series of
    // 1-based start offsets, substr/list_slice windows — the chunk
    // TEXT itself is hash-gated byte-for-byte, not just the counts.
    "llm_chunk_chars" ->
      s"""WITH g AS (SELECT doc_id, text,
         |    unnest(generate_series(1, length(text), ${graft.queries.LlmQueries.ChunkCharS})) AS gs
         |  FROM documents WHERE length(text) > 0)
         |SELECT doc_id, CAST((gs - 1) // ${graft.queries.LlmQueries.ChunkCharS} AS BIGINT) AS chunk_id,
         |  CAST(gs AS BIGINT) AS start_pos,
         |  substr(text, CAST(gs AS BIGINT), ${graft.queries.LlmQueries.ChunkCharW}) AS chunk,
         |  CAST(least(${graft.queries.LlmQueries.ChunkCharW}, length(text) - gs + 1) AS BIGINT) AS n_chunk_chars
         |FROM g ORDER BY doc_id, chunk_id""".stripMargin,
    "llm_chunk_tokens" ->
      s"""WITH t AS (SELECT doc_id,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS toks
         |  FROM documents),
         |tn AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
         |g AS (SELECT doc_id, toks,
         |    unnest(generate_series(1, len(toks), ${graft.queries.LlmQueries.ChunkTokS})) AS gs
         |  FROM tn)
         |SELECT doc_id, CAST((gs - 1) // ${graft.queries.LlmQueries.ChunkTokS} AS BIGINT) AS chunk_id,
         |  CAST(gs AS BIGINT) AS start_token,
         |  array_to_string(list_slice(toks, gs, gs + ${graft.queries.LlmQueries.ChunkTokW} - 1), ' ') AS chunk,
         |  CAST(least(${graft.queries.LlmQueries.ChunkTokW}, len(toks) - gs + 1) AS BIGINT) AS n_chunk_tokens
         |FROM g ORDER BY doc_id, chunk_id""".stripMargin,
    "llm_chunk_stats" ->
      s"""WITH t AS (SELECT doc_id,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS toks
         |  FROM documents),
         |tn AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
         |g AS (SELECT doc_id, toks,
         |    unnest(generate_series(1, len(toks), ${graft.queries.LlmQueries.ChunkTokS})) AS gs
         |  FROM tn),
         |c AS (SELECT doc_id,
         |    CAST(least(${graft.queries.LlmQueries.ChunkTokW}, len(toks) - gs + 1) AS BIGINT) AS n
         |  FROM g)
         |SELECT doc_id, count(*) AS n_chunks, CAST(sum(n) AS BIGINT) AS sum_units,
         |  min(n) AS min_units, max(n) AS max_units
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Exact-k stratified sample (ext/Sampling.stratifiedK): the
    // two-phase salted ranking restated as the plain per-group
    // row_number window over the same (hash-bucket, key) total order.
    "llm_stratified_sample" ->
      s"""WITH r AS (SELECT lang, doc_id,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY ((doc_id * ${graft.ext.Sampling.Multiplier}) % ${graft.ext.Sampling.Prime}) % ${graft.ext.Sampling.Million},
         |        doc_id) AS rk
         |  FROM documents)
         |SELECT lang, doc_id, CAST(rk AS BIGINT) AS sample_rank
         |FROM r WHERE rk <= ${graft.queries.LlmQueries.StratifiedK}
         |ORDER BY lang, sample_rank""".stripMargin,
    // Vocabulary coverage curve (ext/TextStats.vocabCoverage):
    // cumulative ppm is BIGINT-exact ((cum * 1e6) // total).
    "text_vocab_coverage" ->
      s"""WITH w AS (SELECT unnest(list_filter(
         |    regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '')) AS term
         |  FROM documents),
         |f AS (SELECT term, count(*) AS freq FROM w GROUP BY term),
         |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS n FROM f),
         |r AS (SELECT term, freq,
         |    row_number() OVER (ORDER BY freq DESC, term) AS rank,
         |    sum(freq) OVER (ORDER BY freq DESC, term) AS cum
         |  FROM f)
         |SELECT CAST(rank AS BIGINT) AS rank, term,
         |  CAST(freq AS BIGINT) AS freq,
         |  CAST((cum * 1000000) // (SELECT n FROM tot) AS BIGINT) AS cum_ppm
         |FROM r WHERE rank <= ${graft.queries.LlmQueries.VocabTopN}
         |ORDER BY rank""".stripMargin,
    // Compression-ratio gate (CompressStats.scala): n_docs and the raw
    // UTF-8 byte total are LIVE; the deflate aggregates are pinned per
    // sf — zlib exists in neither SQL engine (the xxhash64/minhash
    // pinned-oracle discipline; determinism + monotonicity properties
    // carried by CompressStatsSpec).
    "text_compress_checksum" ->
      s"""SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         |  (SELECT CAST(sum(octet_length(encode(text))) AS BIGINT)
         |   FROM documents) AS sum_raw,
         |  CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN 75598
         |    WHEN 60000 THEN 74349
         |    WHEN 600000 THEN 740682 END AS BIGINT) AS sum_deflate,
         |  CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN 48
         |    WHEN 60000 THEN 44
         |    WHEN 600000 THEN 44 END AS BIGINT) AS min_deflate,
         |  CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN 231
         |    WHEN 60000 THEN 232
         |    WHEN 600000 THEN 235 END AS BIGINT) AS max_deflate""".stripMargin,
    // Per-file record/byte audit: file = 50 consecutive ids, plus the
    // warcinfo record whose fixed block length is interpolated from the
    // same constant the writer uses.
    "warc_files_meta" ->
      s"""SELECT doc_id // 50 AS file_id,
         |  CAST(count(*) + 1 AS BIGINT) AS n_records,
         |  CAST(count(*) AS BIGINT) AS n_conversion,
         |  CAST(sum(octet_length(CAST(text AS BLOB)))
         |       + ${graft.ext.Warc.WarcinfoBlock.getBytes("UTF-8").length}
         |       AS BIGINT) AS block_bytes
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    // ALL documents (the dup set sees corpus + shard occurrences), hits
    // restricted to shard docs. The engine never re-windows the corpus
    // — it probes the persisted per-epoch window-count partials — so a
    // green hash proves the count-sum arithmetic exactly.
    "llm_span_dedup_incremental" ->
      s"""WITH w AS (SELECT doc_id, $WL AS ws FROM documents),
         |g AS (SELECT doc_id, i AS pos, array_to_string(ws[i:i+11], ' ') AS gram
         |      FROM w, unnest(generate_series(1, len(ws) - 11)) AS t(i)
         |      WHERE len(ws) >= 12),
         |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
         |hits AS (SELECT doc_id, pos FROM g
         |         WHERE gram IN (SELECT gram FROM dup) AND doc_id % 10 = 0),
         |isl AS (SELECT doc_id, pos,
         |          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 12
         |               THEN 0 ELSE 1 END AS brk
         |        FROM hits),
         |sp AS (SELECT doc_id, pos,
         |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |       FROM isl)
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |  CAST(max(pos) + 11 AS BIGINT) AS span_end,
         |  CAST(max(pos) + 11 - min(pos) + 1 AS BIGINT) AS span_words
         |FROM sp GROUP BY doc_id, island
         |ORDER BY doc_id, span_start""".stripMargin,
    // Incremental LM ≡ full retrain restricted to the shard: counts are
    // a monoid, so the summed per-epoch model must reproduce the
    // full-corpus scores bit-for-bit.
    "llm_lm_incremental" ->
      """WITH t AS (SELECT doc_id, lower(text) AS txt FROM documents),
        |tri AS (SELECT doc_id, substr(txt, i, 3) AS tri
        |        FROM t, unnest(generate_series(1, len(txt) - 2)) AS s(i)
        |        WHERE len(txt) >= 3),
        |big AS (SELECT doc_id, substr(txt, i, 2) AS big
        |        FROM t, unnest(generate_series(1, len(txt) - 1)) AS s(i)
        |        WHERE len(txt) >= 2),
        |v AS (SELECT count(DISTINCT substr(txt, i, 1)) AS nv
        |      FROM t, unnest(generate_series(1, len(txt))) AS s(i)),
        |m3 AS (SELECT tri, count(*) AS c3 FROM tri GROUP BY tri),
        |m2 AS (SELECT big, count(*) AS c2 FROM big GROUP BY big),
        |scored AS (
        |  SELECT tri.doc_id,
        |    length(format('{:b}', m2.c2 + (SELECT nv FROM v)))
        |      - length(format('{:b}', m3.c3 + 1)) AS bits
        |  FROM tri JOIN m3 USING (tri)
        |  JOIN m2 ON m2.big = substr(tri.tri, 1, 2)
        |  WHERE tri.doc_id % 10 = 0)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        |  CAST(sum(bits) AS BIGINT) AS total_bits,
        |  CAST(sum(bits) AS DOUBLE) / count(*) AS bits_per_trigram
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // The dedup REWRITE: drop every duplicated-span occurrence except
    // the lexicographically first (min doc_id, then min pos). A word
    // position is cut iff covered by some duplicated window and by no
    // surviving occurrence.
    "llm_span_dedup_cut" ->
      s"""WITH w AS (SELECT doc_id, $WL AS ws FROM documents),
         |words AS (SELECT doc_id, i AS j, ws[i] AS word
         |          FROM w, unnest(generate_series(1, len(ws))) AS t(i)),
         |g AS (SELECT doc_id, i AS pos, array_to_string(ws[i:i+11], ' ') AS gram
         |      FROM w, unnest(generate_series(1, len(ws) - 11)) AS t(i)
         |      WHERE len(ws) >= 12),
         |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
         |hits AS (SELECT doc_id, pos, gram FROM g
         |         WHERE gram IN (SELECT gram FROM dup)),
         |surv AS (SELECT gram, min(doc_id) AS sd FROM hits GROUP BY gram),
         |surv2 AS (SELECT h.gram, s.sd, min(h.pos) AS sp
         |          FROM hits h JOIN surv s ON h.gram = s.gram AND h.doc_id = s.sd
         |          GROUP BY h.gram, s.sd),
         |hit2 AS (SELECT h.doc_id, h.pos,
         |           (h.doc_id = s.sd AND h.pos = s.sp) AS is_surv
         |         FROM hits h JOIN surv2 s ON h.gram = s.gram),
         |cover AS (SELECT doc_id, pos + k AS j, max(is_surv) AS sc
         |          FROM hit2, unnest(generate_series(0, 11)) AS t(k)
         |          GROUP BY doc_id, pos + k),
         |kept AS (SELECT words.doc_id, words.j, words.word,
         |           coalesce(c.sc, TRUE) AS keep
         |         FROM words LEFT JOIN cover c
         |           ON words.doc_id = c.doc_id AND words.j = c.j)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |  CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_cut,
         |  coalesce(string_agg(word, ' ' ORDER BY j) FILTER (WHERE keep), '')
         |    AS text_dedup
         |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // CCNet-style n-gram LM score: per-trigram cost quantized to whole
    // bits via binary-string length (bin() / format('{:b}') — pure
    // integer arithmetic, so no transcendental or sum-order divergence;
    // see NgramLm's scaladoc), one final BIGINT/BIGINT division.
    "llm_lm_score" ->
      s"""$LmScoreCteSql
         |SELECT doc_id, n_trigrams, total_bits, bits_per_trigram
         |FROM sc ORDER BY doc_id""".stripMargin,
    // CCNet's head/middle/tail selection: exact rank tertiles under the
    // (bits_per_trigram ASC, doc_id) total order — the engine computes
    // the rank DISTRIBUTED (range slices + offset prefix-sum, see
    // GlobalRank), the oracle with a plain global row_number(); a green
    // hash proves the distributed rank exactly equals the single-window
    // form.
    "llm_lm_buckets" ->
      s"""$LmScoreCteSql,
         |r AS (SELECT doc_id,
         |        row_number() OVER (ORDER BY bits_per_trigram ASC, doc_id ASC) - 1 AS lm_rank,
         |        count(*) OVER () AS n
         |      FROM sc)
         |SELECT doc_id, CAST(lm_rank AS BIGINT) AS lm_rank,
         |  CASE WHEN (lm_rank + 1) * 3 <= n THEN 'head'
         |       WHEN (lm_rank + 1) * 3 <= 2 * n THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM r ORDER BY doc_id""".stripMargin,
    // Model-based quality classification (NaiveBayes.scala): the full
    // train→score loop restated live — heuristic-gate labels, one
    // (token, class) count table, integer-bit log-likelihood-ratio
    // (same bitlen quantization as llm_lm_score, see NaiveBayes's
    // scaladoc for the exactness argument).
    "llm_nb_score" ->
      s"""$NbScoreCteSql
         |SELECT doc_id, n_tokens, score_bits, score_bits > 0 AS predicted
         |FROM sc ORDER BY doc_id""".stripMargin,
    // The classifier's self-predictions against its own training
    // labels: 4 integer-count rows (the production sanity check before
    // trusting off-gate generalization).
    "llm_nb_confusion" ->
      s"""$NbScoreCteSql
         |SELECT lab.label, sc.score_bits > 0 AS predicted,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM sc JOIN lab USING (doc_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Incremental ≡ full retrain: the engine scores the shard under the
    // SUMMED per-epoch count model (base + shard1 epochs); the oracle
    // retrains on the FULL corpus and restricts to shard docs — a green
    // hash proves the count-monoid equivalence.
    "llm_nb_incremental" ->
      s"""$NbScoreCteSql
         |SELECT doc_id, n_tokens, score_bits, score_bits > 0 AS predicted
         |FROM sc WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin,
    // Incremental ≡ full-recompute-restricted: the SAME full-corpus
    // Jaccard CTE (combined-df cap included), restricted to pairs with
    // at least one side in the arriving shard (doc_id % 10 = 0). The
    // engine side never recomputes the full self-join — it reads the
    // persisted shingle index — so a green hash here proves the
    // incremental path's cap arithmetic exactly.
    "llm_dedup_incremental" ->
      s"""$JaccardPairsSql
         |  AND (id_a % 10 = 0 OR id_b % 10 = 0)
         |ORDER BY id_a, id_b""".stripMargin,
    // Incremental decontam ≡ the llm_decontam report restricted to the
    // shard (per-doc counts don't depend on other corpus docs; the
    // bench gram set is identical whether read or recomputed).
    "llm_decontam_incremental" ->
      s"""WITH w AS (SELECT doc_id, $WL AS ws FROM documents),
         |bench AS (SELECT DISTINCT array_to_string(ws[g:g+7], ' ') AS shingle
         |          FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(g)
         |          WHERE doc_id % 17 = 0 AND len(ws) >= 8),
         |corpus AS (SELECT DISTINCT doc_id, array_to_string(ws[g:g+7], ' ') AS shingle
         |           FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(g)
         |           WHERE doc_id % 17 <> 0 AND doc_id % 10 = 0 AND len(ws) >= 8),
         |counts AS (SELECT doc_id, count(*) AS n_grams,
         |             count(*) FILTER (WHERE shingle IN (SELECT shingle FROM bench)) AS n_hits
         |           FROM corpus GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(c.n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(coalesce(c.n_hits, 0) AS BIGINT) AS n_hits,
         |  coalesce(c.n_hits, 0) > 0 AS contaminated
         |FROM documents d LEFT JOIN counts c ON d.doc_id = c.doc_id
         |WHERE d.doc_id % 17 <> 0 AND d.doc_id % 10 = 0
         |ORDER BY d.doc_id""".stripMargin,
    // Dup-cluster size histogram: the llm_dedup_cc recursive-CTE
    // components, rolled up twice (comp → size, size → n_clusters).
    "llm_dedup_cluster_sizes" ->
      s"""WITH RECURSIVE w AS (SELECT doc_id, $WL AS ws FROM documents),
         |sh0 AS (SELECT DISTINCT doc_id, array_to_string(ws[g:g+2], ' ') AS shingle
         |       FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(g)
         |       WHERE len(ws) >= 3),
         |sh AS (SELECT doc_id, shingle FROM sh0
         |       WHERE shingle IN (SELECT shingle FROM sh0
         |                         GROUP BY shingle HAVING count(*) <= 50)),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
         |          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id),
         |pairs AS (SELECT id_a, id_b FROM inter
         |          JOIN sizes sa ON inter.id_a = sa.doc_id
         |          JOIN sizes sb ON inter.id_b = sb.doc_id
         |          WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT u AS id FROM edges),
         |reach AS (SELECT id, id AS r FROM nodes
         |          UNION
         |          SELECT reach.id, e.v AS r FROM reach JOIN edges e ON reach.r = e.u),
         |comps AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
         |cs AS (SELECT comp, count(*) AS cluster_size FROM comps GROUP BY comp)
         |SELECT cluster_size, count(*) AS n_clusters
         |FROM cs GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,
    // Terminal clean corpus: quality keep rules → decontamination drop
    // → exact-dup survivors minus CC non-roots, with the near-dup pair
    // graph computed among the cleaned docs (so its df-cap counts and
    // components differ from llm_dedup_corpus_cc's full-corpus ones).
    "llm_clean_corpus" ->
      s"""WITH RECURSIVE q AS (
         |  SELECT doc_id, text, lang, n_chars FROM documents
         |  WHERE doc_id % 17 <> 0 AND $NWORDS >= 20
         |    AND n_chars <= 450 AND $STOPW >= 0.02),
         |w AS (SELECT doc_id, $WL AS ws FROM documents),
         |bgr AS (SELECT DISTINCT array_to_string(ws[g:g+7], ' ') AS shingle
         |        FROM w, unnest(generate_series(1, len(ws) - 7)) AS t(g)
         |        WHERE doc_id % 17 = 0 AND len(ws) >= 8),
         |cgr AS (SELECT DISTINCT q.doc_id, array_to_string(ws[g:g+7], ' ') AS shingle
         |        FROM q JOIN w ON q.doc_id = w.doc_id,
         |          unnest(generate_series(1, len(ws) - 7)) AS t(g)
         |        WHERE len(ws) >= 8),
         |dirty AS (SELECT DISTINCT doc_id FROM cgr
         |          WHERE shingle IN (SELECT shingle FROM bgr)),
         |c AS (SELECT * FROM q
         |      WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
         |cw AS (SELECT c.doc_id, ws FROM c JOIN w ON c.doc_id = w.doc_id),
         |sh0 AS (SELECT DISTINCT doc_id, array_to_string(ws[g:g+2], ' ') AS shingle
         |       FROM cw, unnest(generate_series(1, len(ws) - 2)) AS t(g)
         |       WHERE len(ws) >= 3),
         |sh AS (SELECT doc_id, shingle FROM sh0
         |       WHERE shingle IN (SELECT shingle FROM sh0
         |                         GROUP BY shingle HAVING count(*) <= 50)),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
         |          FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id),
         |pairs AS (SELECT id_a, id_b FROM inter
         |          JOIN sizes sa ON inter.id_a = sa.doc_id
         |          JOIN sizes sb ON inter.id_b = sb.doc_id
         |          WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5),
         |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
         |          UNION ALL SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT u AS id FROM edges),
         |reach AS (SELECT id, id AS r FROM nodes
         |          UNION
         |          SELECT reach.id, e.v AS r FROM reach JOIN edges e ON reach.r = e.u),
         |comps AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
         |survivors AS (SELECT min(doc_id) AS doc_id FROM c GROUP BY text)
         |SELECT d.doc_id, d.lang, d.n_chars FROM c d
         |JOIN survivors s ON d.doc_id = s.doc_id
         |WHERE d.doc_id NOT IN (SELECT id FROM comps WHERE comp <> id)
         |ORDER BY d.doc_id""".stripMargin,
    // C4 page cleaning over the decorated fixture: the oracle replays
    // the identical (doc_id, line_idx)-keyed decoration, then the same
    // three line rules + two page markers + min-line floor. clean_text
    // is compared byte-for-byte.
    "llm_c4_clean" ->
      s"""WITH p AS ($C4PlantedSql),
         |k AS (SELECT doc_id, $C4KeptListSql AS kl,
         |        len(string_split(text, chr(10))) AS n_in
         |      FROM p
         |      WHERE NOT contains(lower(text), 'lorem ipsum')
         |        AND NOT contains(text, '{'))
         |SELECT doc_id, array_to_string(kl, chr(10)) AS clean_text,
         |  CAST(len(kl) AS BIGINT) AS n_lines_kept,
         |  CAST(n_in AS BIGINT) AS n_lines_in
         |FROM k WHERE len(kl) >= 2 ORDER BY doc_id""".stripMargin,
    "llm_c4_stats" ->
      s"""WITH p AS ($C4PlantedSql),
         |per AS (SELECT doc_id,
         |          (contains(lower(text), 'lorem ipsum')
         |           OR contains(text, '{')) AS marker,
         |          len(string_split(text, chr(10))) AS n_in,
         |          $C4KeptListSql AS kl
         |        FROM p)
         |SELECT CAST(count(*) AS BIGINT) AS docs_in,
         |  CAST(sum(CASE WHEN marker THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_dropped_marker,
         |  CAST(sum(CASE WHEN NOT marker AND len(kl) < 2 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS docs_dropped_minlines,
         |  CAST(sum(CASE WHEN NOT marker AND len(kl) >= 2 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS docs_kept,
         |  CAST(sum(CASE WHEN NOT marker AND len(kl) >= 2 THEN n_in ELSE 0 END)
         |    AS BIGINT) AS lines_in_kept_docs,
         |  CAST(sum(CASE WHEN NOT marker AND len(kl) >= 2 THEN len(kl)
         |    ELSE 0 END) AS BIGINT) AS lines_kept
         |FROM per""".stripMargin,
    // Token-exact blocklist: whole-word equality after the same
    // lower+whitespace split (never substring — "class" cannot match a
    // blocklist "ass").
    "llm_blocklist_filter" ->
      """SELECT doc_id, lang, n_chars FROM documents d
        |WHERE NOT EXISTS (
        |  SELECT 1
        |  FROM unnest(regexp_split_to_array(trim(lower(d.text)), '\s+')) AS t(w)
        |  WHERE w IN ('slow', 'vector', 'spam'))
        |ORDER BY doc_id""".stripMargin,
    "llm_blocklist_stats" ->
      """SELECT w AS term, CAST(count(DISTINCT doc_id) AS BIGINT) AS docs_flagged
        |FROM documents d,
        |     unnest(regexp_split_to_array(trim(lower(d.text)), '\s+')) AS t(w)
        |WHERE w IN ('slow', 'vector', 'spam')
        |GROUP BY w ORDER BY term""".stripMargin,
    // Benchmark-overlap decontamination: every 17th doc_id is the
    // benchmark suite; 8-word grams, Jaccard-family tokenization. The
    // corpus-side DISTINCT mirrors array_distinct in Dedup.shingles.
    "llm_decontam" -> DecontamSql,
    // The Bloom-prefiltered path must produce the IDENTICAL report —
    // same oracle; a green hash proves the sketch's fpp never reaches
    // the answer (false positives die in the exact verify join).
    "llm_decontam_bloom" -> DecontamSql,
    "llm_cosine_topk" ->
      s"$ExactTopKSql ORDER BY query_id, rank",
    // Recall / parity oracles for the probabilistic family: exact side
    // recomputed live, deterministic approximate side pinned per gated
    // scale factor (see recallOracle's scaladoc). Pins measured from the
    // engine's own deterministic output at sf0.001 / sf0.01 / sf0.1.
    // The scale-factor discriminator is the LINEITEM row count —
    // documents/embeddings deliberately have the same cardinality at
    // sf0.001 and sf0.01 (only their content differs), so only a table
    // that scales with sf can tell the pins apart.
    "llm_lsh_recall" -> recallOracle(ExactTopKSql, SfDiscriminatorSql,
      Seq(6000L -> 99L, 60000L -> 97L, 600000L -> PinLsh01), nQueries = true),
    "llm_lsh_scale_recall" -> recallOracle(ExactTopKSql, SfDiscriminatorSql,
      Seq(6000L -> 4L, 60000L -> 2L, 600000L -> PinLshScale01), nQueries = true),
    "llm_ivf_recall" -> recallOracle(ExactTopKSql, SfDiscriminatorSql,
      Seq(6000L -> 65L, 60000L -> 55L, 600000L -> PinIvf01), nQueries = true),
    // IVF-PQ: same probes as llm_ivf_recall, candidates ADC-shortlisted
    // from 8-byte codes before the exact rerank — the pin records what
    // the 32x code compression costs vs the IVF-Flat pin above.
    "llm_pq_recall" -> recallOracle(ExactTopKSql, SfDiscriminatorSql,
      Seq(6000L -> PinPq0001, 60000L -> PinPq001, 600000L -> PinPq01),
      nQueries = true),
    "llm_minhash_recall" -> recallOracle(JaccardPairsSql, SfDiscriminatorSql,
      Seq(6000L -> 28L, 60000L -> 25L, 600000L -> PinMinhash01), nQueries = false),
    // Incremental-minhash gate: exact side = UNCAPPED shard-touching
    // Jaccard pairs recomputed live; found side pinned (banded xxhash64
    // signatures are deterministic given the preset).
    "llm_minhash_incremental_recall" -> recallOracle(
      JaccardPairsUncappedRestrictedSql, SfDiscriminatorSql,
      Seq(6000L -> 12L, 60000L -> 6L, 600000L -> PinMinhashInc01),
      nQueries = false),
    // Near-dup recall rows: at the registered corpus sizes the exact
    // all-pairs cosine ground truth IS SQL-expressible, so the oracle
    // recomputes the whole denominator live; only the deterministic
    // LSH-found count is pinned (found pairs verify with the identical
    // rounded sim expression, hence n_spurious = 0 by construction).
    // SemDeDup gate: n_vectors and n_catchable (vectors with a
    // smaller-id exact neighbor at tau — the structural superset of the
    // prunable set) live; the deterministic pruned count pinned per sf;
    // n_spurious_pruned is live-computed engine-side and must be ZERO
    // (pruned ⊆ catchable holds structurally — both sides score with
    // the same rounded pairSim).
    "llm_semdedup_check" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |        round(list_cosine_similarity(a.e, b.e), 6) AS sim
         |      FROM v a JOIN v b ON a.vec_id < b.vec_id),
         |c AS (SELECT DISTINCT id_b FROM p WHERE sim >= 0.35),
         |pin AS (SELECT CAST(CASE ($SfDiscriminatorSql)
         |          WHEN 6000 THEN 71 WHEN 60000 THEN 74
         |          WHEN 600000 THEN 792 END AS BIGINT) AS n)
         |SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_vectors,
         |  CAST((SELECT count(*) FROM c) AS BIGINT) AS n_catchable,
         |  pin.n AS n_pruned,
         |  CAST(0 AS BIGINT) AS n_spurious_pruned,
         |  CAST(pin.n AS DOUBLE) /
         |    CAST((SELECT count(*) FROM c) AS DOUBLE) AS coverage
         |FROM pin""".stripMargin,
    // Incremental SemDeDup gate: same structural property restricted to
    // the shard (catchable = shard vectors with a smaller-id exact
    // neighbor anywhere — the witness is real whichever side of the
    // index it sat on).
    "llm_semdedup_incremental_check" ->
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |        round(list_cosine_similarity(a.e, b.e), 6) AS sim
         |      FROM v a JOIN v b ON a.vec_id < b.vec_id),
         |c AS (SELECT DISTINCT id_b FROM p
         |      WHERE sim >= 0.35 AND id_b % 10 = 0),
         |pin AS (SELECT CAST(CASE ($SfDiscriminatorSql)
         |          WHEN 6000 THEN 4 WHEN 60000 THEN 7
         |          WHEN 600000 THEN 68 END AS BIGINT) AS n)
         |SELECT CAST((SELECT count(*) FROM v WHERE vec_id % 10 = 0)
         |    AS BIGINT) AS n_shard,
         |  CAST((SELECT count(*) FROM c) AS BIGINT) AS n_catchable,
         |  pin.n AS n_pruned,
         |  CAST(0 AS BIGINT) AS n_spurious_pruned,
         |  CAST(pin.n AS DOUBLE) /
         |    CAST((SELECT count(*) FROM c) AS DOUBLE) AS coverage
         |FROM pin""".stripMargin,
    "llm_cosine_neardup_recall" -> recallOracle(ExactCosinePairsSql,
      SfDiscriminatorSql,
      Seq(6000L -> 234L, 60000L -> 254L, 600000L -> PinNearDup01),
      nQueries = false),
    // Incremental embedding near-dup: exact side = the all-pairs ground
    // truth restricted to shard-touching pairs (live); found count
    // (IVF probe of the persisted old-split index + exact within-shard
    // pairs) deterministic per sf. Recall ~0.6-0.69 is the nProbe=4/16
    // regime on this isotropic corpus — same envelope as llm_ivf_recall.
    "llm_cosine_incremental_recall" -> recallOracle(
      s"$ExactCosinePairsSql AND (id_a % 10 = 0 OR id_b % 10 = 0)",
      SfDiscriminatorSql,
      Seq(6000L -> 29L, 60000L -> 44L, 600000L -> 474L), nQueries = false),
    "llm_cosine_neardup_scale_recall" -> recallOracle(ExactCosinePairsSql,
      SfDiscriminatorSql,
      Seq(6000L -> 11L, 60000L -> 10L, 600000L -> PinNearDupScale01),
      nQueries = false),
    // IVF occupancy checksum: the partition-function invariant
    // (every vector in exactly one cell) is live; the used-cell count
    // and largest inverted list are centroid-deterministic → pinned.
    "llm_ivf_cells_checksum" ->
      s"""SELECT CAST(16 AS BIGINT) AS n_cells_used,
         |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_assigned,
         |  CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN 41 WHEN 60000 THEN 43 WHEN 600000 THEN 142
         |  END AS BIGINT) AS largest_cell""".stripMargin,
    // Winnowing checksum: n_docs counts ALL documents live; the
    // fingerprinted-doc count and totals are deterministic given the
    // rolling-hash constants → pinned (a doc too short for the k=24
    // window would surface as an n_fingerprinted pin drift).
    "llm_winnow_checksum" ->
      s"""SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         |  CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN 500 WHEN 60000 THEN 500 WHEN 600000 THEN 5000
         |  END AS BIGINT) AS n_fingerprinted,
         |  CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN 55606 WHEN 60000 THEN 54050 WHEN 600000 THEN 539043
         |  END AS BIGINT) AS total_fingerprints,
         |  CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN 200 WHEN 60000 THEN 206 WHEN 600000 THEN 212
         |  END AS BIGINT) AS max_per_doc,
         |  CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN 28 WHEN 60000 THEN 26 WHEN 600000 THEN 456
         |  END AS BIGINT) AS n_shared_pairs""".stripMargin,
    // SimHash fingerprint checksum: n_docs live; fingerprinted-doc count
    // and xor/min/max of the seed-deterministic 64-bit fingerprints
    // pinned per sf (on these fixtures every doc tokenizes, so the
    // pinned n_fingerprinted equals the doc count — but the live column
    // does not DEPEND on that invariant).
    "llm_simhash_checksum" ->
      s"""SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         |  CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN 500 WHEN 60000 THEN 500 WHEN 600000 THEN 5000
         |  END AS BIGINT) AS n_fingerprinted,
         |  CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN 4843820489233471456
         |    WHEN 60000 THEN 3115557629347205372
         |    WHEN 600000 THEN -2844038271569729404 END AS BIGINT) AS fp_xor,
         |  CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN -8943239126811899278
         |    WHEN 60000 THEN -9029380471571314544
         |    WHEN 600000 THEN -9177009643977262960 END AS BIGINT) AS fp_min,
         |  CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN 8962514540629716032
         |    WHEN 60000 THEN 9106627254795937810
         |    WHEN 600000 THEN 9214709523272673936 END AS BIGINT) AS fp_max""".stripMargin,
    // Serving-path parity: fully SQL-expressible — the written IVF index
    // must return exactly the in-memory probe's rows (5 per query), so
    // the mismatch count is the constant 0, no per-sf pin required.
    "llm_ivf_indexed_parity" ->
      """SELECT
        |  CAST(5 * (SELECT count(*) FROM embeddings WHERE vec_id < 20) AS BIGINT) AS n_memory,
        |  CAST(5 * (SELECT count(*) FROM embeddings WHERE vec_id < 20) AS BIGINT) AS n_indexed,
        |  CAST(0 AS BIGINT) AS n_mismatch""".stripMargin,
    // Blocking-parity: pigeonhole blocking is lossless within the Hamming
    // ball and candidates verify exactly, so blocked == brute force and
    // the mismatch count is the constant 0. The pair counts are
    // hash-seed-dependent → pinned per sf like the recall rows.
    "llm_simhash_parity" ->
      s"""WITH n AS (SELECT CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN 27 WHEN 60000 THEN 17 WHEN 600000 THEN $PinSimhash01 END AS BIGINT) AS p)
         |SELECT p AS n_brute, p AS n_blocked, CAST(0 AS BIGINT) AS n_mismatch
         |FROM n""".stripMargin,
    // Incremental-simhash gate: blocked-incremental ≡ brute restricted
    // (blocking is lossless in the Hamming ball), zero mismatches; the
    // deterministic pair count pinned per sf.
    "llm_simhash_incremental_parity" ->
      s"""WITH n AS (SELECT CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN ${PinSimhashInc0001} WHEN 60000 THEN ${PinSimhashInc001} WHEN 600000 THEN $PinSimhashInc01 END AS BIGINT) AS p)
         |SELECT p AS n_brute, p AS n_blocked, CAST(0 AS BIGINT) AS n_mismatch
         |FROM n""".stripMargin,
    // LSH prune observability: n_possible recomputed live, the
    // deterministic candidate count pinned per sf; the fraction is the
    // IEEE division of the two (bit-identical across engines).
    "llm_lsh_candidate_stats" ->
      s"""WITH nc AS (SELECT CAST(count(*) AS BIGINT) AS v FROM embeddings),
         |nq AS (SELECT CAST(count(*) AS BIGINT) AS v FROM embeddings WHERE vec_id < 20),
         |cand AS (SELECT CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN 8488 WHEN 60000 THEN 8508 WHEN 600000 THEN $PinCands01 END AS BIGINT) AS v)
         |SELECT cand.v AS n_candidates, nc.v * nq.v AS n_possible,
         |  CAST(cand.v AS DOUBLE) / CAST(nc.v * nq.v AS DOUBLE) AS fraction
         |FROM cand, nc, nq""".stripMargin,
    "llm_embed_stats" ->
      """SELECT vec_id,
        |  round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm,
        |  round(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 6) AS sq_norm,
        |  CAST(len(embedding) AS BIGINT) AS dim
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // int8 quantization audit: floor codes (round diverges across
    // engines), elementwise IEEE double math in fixed order.
    "llm_quantize_stats" ->
      """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |m AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS max_abs FROM v),
        |q AS (SELECT vec_id, e, max_abs,
        |        CASE WHEN max_abs = 0 THEN list_transform(e, x -> CAST(0 AS BIGINT))
        |             ELSE list_transform(e, x -> CAST(floor(x * 127.0 / max_abs) AS BIGINT))
        |        END AS codes
        |      FROM m)
        |SELECT vec_id, max_abs,
        |  CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum,
    |  CASE WHEN max_abs = 0 THEN 0.0
        |       ELSE list_max(list_transform(generate_series(1, len(e)),
        |              i -> abs(e[i] - CAST(codes[i] AS DOUBLE) * max_abs / 127.0)))
        |  END AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,
    "text_stats_per_lang" ->
      s"""SELECT lang, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  CAST(sum($NWORDS) AS BIGINT) AS total_words
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // Data-mixture planning rollup: per (source, lang) token budget and
    // each cell's share of the corpus total. Same token regex as
    // text_quality (the engine's TokenRe).
    "llm_mixture_stats" ->
      s"""WITH g AS (SELECT source, lang, count(*) AS n_docs,
         |    CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS total_tokens,
         |    CAST(sum(n_chars) AS BIGINT) AS total_chars
         |  FROM documents GROUP BY source, lang)
         |SELECT source, lang, n_docs, total_tokens, total_chars,
         |  round(CAST(total_tokens AS DOUBLE) /
         |    CAST((SELECT sum(total_tokens) FROM g) AS DOUBLE), 6) AS token_share
         |FROM g ORDER BY source, lang""".stripMargin,
    // Distributed fixed-point k-means: the oracle unrolls all 3 Lloyd
    // rounds + the final assignment; integer distances and
    // floor-division means make every round bit-identical across
    // engines (see kmeansCtes).
    "llm_kmeans" ->
      s"$KMeansCtes\nSELECT vec_id, cell FROM af ORDER BY vec_id",
    "llm_kmeans_sizes" ->
      s"""$KMeansCtes
         |SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(sum(vec_id) AS BIGINT) AS id_checksum
         |FROM af GROUP BY cell ORDER BY cell""".stripMargin,
    // Incremental: the oracle replays train-on-indexed-split (vec_id %
    // 10 <> 0) and assigns only the arriving shard under the final
    // centroids — exactly what the engine's persisted model does.
    "llm_kmeans_incremental" ->
      s"$KMeansIncCtes\nSELECT vec_id, cell FROM af ORDER BY vec_id",
    // Temperature mixture (alpha=0.5, budget 25k tokens): weights are
    // floor(sqrt(tokens)) — sqrt is IEEE-correctly-rounded in BOTH
    // engines (pow is not, which is why only the integer-exact alphas
    // exist) — and rates are BIGINT truncating division, so every
    // column reproduces bit-for-bit.
    "llm_mixture_rates" ->
      s"""WITH g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum($NTOKENS) AS BIGINT) AS total_tokens
         |  FROM documents GROUP BY lang),
         |w AS (SELECT lang, n_docs, total_tokens,
         |        CAST(floor(sqrt(CAST(total_tokens AS DOUBLE))) AS BIGINT)
         |          AS weight
         |      FROM g)
         |SELECT lang, n_docs, total_tokens, weight,
         |  CAST(least(1000000, (25000 * weight * 1000000) //
         |    ((SELECT sum(weight) FROM w) * total_tokens)) AS BIGINT)
         |    AS rate_ppm
         |FROM w ORDER BY lang""".stripMargin,
    // The sample itself: the Knuth-scramble key bucket is pure BIGINT
    // arithmetic, so the oracle replays the exact kept set (id_checksum
    // pins it, not just the counts).
    "llm_mixture_sample" ->
      s"""WITH g AS (SELECT lang, CAST(sum($NTOKENS) AS BIGINT) AS total_tokens
         |  FROM documents GROUP BY lang),
         |w AS (SELECT lang, total_tokens,
         |        CAST(floor(sqrt(CAST(total_tokens AS DOUBLE))) AS BIGINT)
         |          AS weight FROM g),
         |r AS (SELECT lang, least(1000000, (25000 * weight * 1000000) //
         |        ((SELECT sum(weight) FROM w) * total_tokens)) AS rate_ppm
         |      FROM w),
         |kept AS (SELECT d.doc_id, d.lang, $NTOKENS AS toks
         |         FROM documents d JOIN r USING (lang)
         |         WHERE ((d.doc_id * 2654435761) % 1000000007) % 1000000
         |               < r.rate_ppm)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs_kept,
         |  CAST(sum(toks) AS BIGINT) AS tokens_kept,
         |  CAST(sum(doc_id) AS BIGINT) AS id_checksum
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id,
         |  CAST($NWORDS AS BIGINT) AS n_words,
         |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens,
         |  $STOPW AS stopword_ratio,
         |  $MEANWL AS mean_word_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    // The composed C4-shaped filter: verdict + FIRST failing rule, the
    // same decision table as the Spark side (rule order is contract).
    "llm_quality_filter" ->
      s"""WITH m AS (SELECT doc_id, CAST($NWORDS AS BIGINT) AS n_words,
         |             n_chars, $STOPW AS stopword_ratio
         |           FROM documents),
         |r AS (SELECT *, CASE WHEN n_words < 20 THEN 'too_short'
         |                     WHEN n_chars > 450 THEN 'too_long'
         |                     WHEN stopword_ratio < 0.02 THEN 'low_stopword'
         |                     ELSE 'ok' END AS reason
         |      FROM m)
         |SELECT doc_id, n_words, n_chars, stopword_ratio, reason,
         |  reason = 'ok' AS keep
         |FROM r ORDER BY doc_id""".stripMargin,
    "text_quality_score" ->
      s"""SELECT doc_id, $PUNCT AS punct_ratio,
         |  least(CAST(len(text) AS DOUBLE) / 200.0, 1.0) * 0.4
         |    + (1.0 - least($PUNCT * 4.0, 1.0)) * 0.3
         |    + (1.0 - least(abs($MEANWL - 5.0) / 5.0, 1.0)) * 0.3 AS quality_score
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_langid_counts" ->
      s"""WITH s AS (SELECT
         |    len(list_filter($WL, w -> w IN ('the','and','of','is','with'))) AS en,
         |    len(list_filter($WL, w -> w IN ('el','la','de','que','con'))) AS es,
         |    len(list_filter($WL, w -> w IN ('le','la','et','est','avec'))) AS fr
         |  FROM documents)
         |SELECT lang_pred, count(*) AS n_docs FROM (
         |  SELECT CASE WHEN greatest(en, es, fr) = 0 THEN 'unk'
         |              WHEN fr > en AND fr > es THEN 'fr'
         |              WHEN es > en THEN 'es'
         |              ELSE 'en' END AS lang_pred
         |  FROM s) t
         |GROUP BY lang_pred ORDER BY lang_pred""".stripMargin,
    "text_langid_ngram_counts" ->
      """WITH g AS (SELECT CASE WHEN len(lower(text)) >= 3
        |    THEN list_transform(range(1, len(lower(text)) - 1), i -> substr(lower(text), i, 3))
        |    ELSE [] END AS tg FROM documents),
        |s AS (SELECT
        |    len(list_filter(tg, t -> t IN ('the', 'he ', ' th', 'ing', 'and'))) AS en,
        |    len(list_filter(tg, t -> t IN ('de ', ' de', 'la ', 'os ', 'ión'))) AS es,
        |    len(list_filter(tg, t -> t IN ('le ', ' le', 'es ', 'ent', 'que'))) AS fr
        |  FROM g)
        |SELECT lang_pred, count(*) AS n_docs FROM (
        |  SELECT CASE WHEN greatest(en, es, fr) = 0 THEN 'unk'
        |              WHEN fr > en AND fr > es THEN 'fr'
        |              WHEN es > en THEN 'es'
        |              ELSE 'en' END AS lang_pred
        |  FROM s) t
        |GROUP BY lang_pred ORDER BY lang_pred""".stripMargin,
    "text_vocab_stats" ->
      s"""WITH w AS (SELECT doc_id, unnest($WL) AS term FROM documents),
         |t AS (SELECT doc_id, term FROM w WHERE term <> ''),
         |d AS (SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
         |      FROM t GROUP BY term)
         |SELECT CAST(sum(tf) AS BIGINT) AS n_occurrences,
         |  count(*) AS n_distinct_terms,
         |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax_docfreq,
         |  CAST(max(df) AS BIGINT) AS max_df
         |FROM d""".stripMargin,
    "text_clean_stats" ->
      """SELECT doc_id, CAST(len(text) AS BIGINT) AS raw_len,
        |  CAST(len(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS BIGINT) AS clean_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Key-hash sampling: the Knuth-scramble bucket is pure BIGINT
    // arithmetic, so DuckDB selects the identical 20% of documents.
    "llm_sample_strata" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |WHERE ((doc_id * 2654435761) % 1000000007) % 1000000 < 200000
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // Concat-then-chunk packing: shard scramble, running token sum, and
    // integer chunk division — all integer-exact in both engines.
    "llm_pack_stats" ->
      """WITH d AS (SELECT doc_id,
        |    ((doc_id * 2654435761) % 1000000007) % 1000000 % 8 AS shard,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |laid AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS start_offset
        |         FROM d)
        |SELECT CAST(shard AS BIGINT) AS shard, CAST(start_offset // 2048 AS BIGINT) AS pack_id,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM laid GROUP BY shard, pack_id
        |ORDER BY shard, pack_id""".stripMargin,
    // Document-boundary next-fit packing: the oracle replays the
    // per-shard sequential fold as a recursive CTE — each step advances
    // every shard's cursor one document, carrying (pack_id, fill); the
    // rollup must then match the engine's mapPartitions fold exactly.
    "llm_pack_greedy" ->
      s"""WITH RECURSIVE d AS (SELECT doc_id,
         |    ((doc_id * 2654435761) % 1000000007) % 1000000 % 8 AS shard,
         |    CAST($NTOKENS AS BIGINT) AS n_tokens
         |  FROM documents),
         |b AS (SELECT *, row_number() OVER (
         |        PARTITION BY shard ORDER BY doc_id) AS i FROM d),
         |nf AS (
         |  SELECT doc_id, shard, n_tokens, i,
         |    CAST(0 AS BIGINT) AS pack_id, n_tokens AS fill
         |  FROM b WHERE i = 1
         |  UNION ALL
         |  SELECT b.doc_id, b.shard, b.n_tokens, b.i,
         |    CASE WHEN nf.fill + b.n_tokens > 2048
         |         THEN nf.pack_id + 1 ELSE nf.pack_id END,
         |    CASE WHEN nf.fill + b.n_tokens > 2048
         |         THEN b.n_tokens ELSE nf.fill + b.n_tokens END
         |  FROM nf JOIN b ON b.shard = nf.shard AND b.i = nf.i + 1)
         |SELECT CAST(shard AS BIGINT) AS shard, pack_id, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM nf GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin,
    // BFD gate: live doc/token totals + the structural facts that pin
    // best-fit between its bounds (see LlmQueries.packBestfitCheck).
    "llm_pack_bestfit_check" ->
      s"""SELECT count(*) AS n_docs,
         |  CAST(sum($NTOKENS) AS BIGINT) AS total_tokens,
         |  true AS partition_exact, true AS within_budget_ok,
         |  true AS le_nextfit_ok, true AS ge_lowerbound_ok
         |FROM documents""".stripMargin,
    // WordPiece token counts: the oracle replays greedy
    // longest-match-first EXACTLY as a recursive CTE — a position
    // chain where each step consumes the longest piece allowed at that
    // position (the NOT EXISTS guard kills shorter matches; the `cont`
    // flag switches the start vs ## piece class), and a word whose
    // chain dies before len+1 collapses to [UNK] = 1 (the BERT rule).
    // Piece table interpolated from WordPiece.sqlPiecesValues; counts
    // evaluated once per DISTINCT pre-token, joined back.
    "llm_wordpiece_tokens" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id,
         |    unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS tok
         |  FROM documents),
         |v AS (SELECT DISTINCT tok FROM t),
         |pieces(piece, len, cont) AS (SELECT * FROM (VALUES
         |   ${graft.ext.WordPiece.sqlPiecesValues})),
         |seg AS (
         |  SELECT tok, 1 AS pos, 0 AS n FROM v
         |  UNION ALL
         |  SELECT s.tok, s.pos + p.len, s.n + 1
         |  FROM seg s JOIN pieces p
         |    ON p.cont = (s.pos > 1)
         |   AND substr(s.tok, s.pos, p.len) = p.piece
         |   AND NOT EXISTS (SELECT 1 FROM pieces p2
         |                   WHERE p2.cont = (s.pos > 1)
         |                     AND p2.len > p.len
         |                     AND substr(s.tok, s.pos, p2.len) = p2.piece)
         |  WHERE s.pos <= len(s.tok)),
         |done AS (SELECT tok, arg_max(n, pos) AS n, max(pos) AS pos
         |         FROM seg GROUP BY tok),
         |e AS (SELECT tok,
         |    CAST(CASE WHEN pos = len(tok) + 1 THEN n ELSE 1 END AS BIGINT) AS n
         |  FROM done),
         |b AS (SELECT t.doc_id, count(*) AS n_pre, CAST(sum(e.n) AS BIGINT) AS n_wp
         |      FROM t JOIN e USING (tok) GROUP BY t.doc_id)
         |SELECT d.doc_id, CAST(coalesce(b.n_pre, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(b.n_wp, 0) AS BIGINT) AS n_wp_tokens
         |FROM documents d LEFT JOIN b USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // BPE token counts: the oracle re-tokenizes with the SAME regex
    // pre-tokenizer, then recomputes every BPE count through the
    // rank-ordered replace() chain over marker-framed symbols (one
    // replace per merge — the exact single-pass-per-rank semantics the
    // engine encodes with; see Bpe.sqlTokenCount). Counts evaluated
    // once per DISTINCT pre-token, joined back.
    "llm_bpe_tokens" ->
      s"""WITH t AS (SELECT doc_id,
         |    unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS tok
         |  FROM documents),
         |v AS (SELECT DISTINCT tok FROM t),
         |e AS (SELECT tok, ${graft.ext.Bpe.sqlTokenCount("tok")} AS n FROM v),
         |b AS (SELECT t.doc_id, count(*) AS n_pre, CAST(sum(e.n) AS BIGINT) AS n_bpe
         |      FROM t JOIN e USING (tok) GROUP BY t.doc_id)
         |SELECT d.doc_id, CAST(coalesce(b.n_pre, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(b.n_bpe, 0) AS BIGINT) AS n_bpe_tokens
         |FROM documents d LEFT JOIN b USING (doc_id) ORDER BY d.doc_id""".stripMargin,
    // Token-exact packing: the llm_pack_stats layout with n_tokens
    // replaced by the BPE count above — shard scramble, running sum,
    // and chunk division all integer-exact in both engines.
    "llm_pack_stats_bpe" ->
      s"""WITH t AS (SELECT doc_id,
         |    unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS tok
         |  FROM documents),
         |v AS (SELECT DISTINCT tok FROM t),
         |e AS (SELECT tok, ${graft.ext.Bpe.sqlTokenCount("tok")} AS n FROM v),
         |b AS (SELECT t.doc_id, CAST(sum(e.n) AS BIGINT) AS n_bpe
         |      FROM t JOIN e USING (tok) GROUP BY t.doc_id),
         |d AS (SELECT doc_id,
         |    ((doc_id * 2654435761) % 1000000007) % 1000000 % 8 AS shard,
         |    CAST(coalesce(b.n_bpe, 0) AS BIGINT) AS n_tokens
         |  FROM documents LEFT JOIN b USING (doc_id)),
         |laid AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS start_offset
         |         FROM d)
         |SELECT CAST(shard AS BIGINT) AS shard, CAST(start_offset // 2048 AS BIGINT) AS pack_id,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM laid GROUP BY shard, pack_id
         |ORDER BY shard, pack_id""".stripMargin,
    // WordPiece-budgeted packing twin: the llm_pack_stats layout with
    // n_tokens from the greedy WordPiece chain (the recursive-CTE
    // kernel of llm_wordpiece_tokens), then the same shard scramble /
    // running sum / chunk division — all integer-exact.
    "llm_pack_stats_wordpiece" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id,
         |    unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS tok
         |  FROM documents),
         |v AS (SELECT DISTINCT tok FROM t),
         |pieces(piece, len, cont) AS (SELECT * FROM (VALUES
         |   ${graft.ext.WordPiece.sqlPiecesValues})),
         |seg AS (
         |  SELECT tok, 1 AS pos, 0 AS n FROM v
         |  UNION ALL
         |  SELECT s.tok, s.pos + p.len, s.n + 1
         |  FROM seg s JOIN pieces p
         |    ON p.cont = (s.pos > 1)
         |   AND substr(s.tok, s.pos, p.len) = p.piece
         |   AND NOT EXISTS (SELECT 1 FROM pieces p2
         |                   WHERE p2.cont = (s.pos > 1)
         |                     AND p2.len > p.len
         |                     AND substr(s.tok, s.pos, p2.len) = p2.piece)
         |  WHERE s.pos <= len(s.tok)),
         |done AS (SELECT tok, arg_max(n, pos) AS n, max(pos) AS pos
         |         FROM seg GROUP BY tok),
         |e AS (SELECT tok,
         |    CAST(CASE WHEN pos = len(tok) + 1 THEN n ELSE 1 END AS BIGINT) AS n
         |  FROM done),
         |b AS (SELECT t.doc_id, CAST(sum(e.n) AS BIGINT) AS n_wp
         |      FROM t JOIN e USING (tok) GROUP BY t.doc_id),
         |d AS (SELECT doc_id,
         |    ((doc_id * 2654435761) % 1000000007) % 1000000 % 8 AS shard,
         |    CAST(coalesce(b.n_wp, 0) AS BIGINT) AS n_tokens
         |  FROM documents LEFT JOIN b USING (doc_id)),
         |laid AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS start_offset
         |         FROM d)
         |SELECT CAST(shard AS BIGINT) AS shard, CAST(start_offset // 2048 AS BIGINT) AS pack_id,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM laid GROUP BY shard, pack_id
         |ORDER BY shard, pack_id""".stripMargin,
    // tf·N/df with LINEAR idf (no ln): pure IEEE int-ratio math, so the
    // doubles are bit-identical across engines.
    "text_tfidf_top_terms" ->
      s"""WITH w AS (SELECT doc_id, unnest($WL) AS term FROM documents),
         |t AS (SELECT doc_id, term FROM w WHERE term <> ''),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |scored AS (SELECT doc_id, term, tf, df,
         |             CAST(tf AS DOUBLE) * n / df AS score
         |           FROM tf JOIN df USING (term) CROSS JOIN n),
         |ranked AS (SELECT *, row_number() OVER (
         |             PARTITION BY doc_id ORDER BY score DESC, term) AS rank
         |           FROM scored)
         |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
         |  score, CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    // BM25 retrieval: every scoring quantity is BIGINT (see
    // Bm25ScoreCteSql above) so the full ranking reproduces bit-for-bit.
    "llm_bm25_scores" ->
      s"""$Bm25ScoreCteSql
         |SELECT doc_id, n_terms, score_u FROM bsc ORDER BY doc_id""".stripMargin,
    "llm_bm25_topk" -> Bm25TopkSql,
    // served from the persisted postings index after the shard fold —
    // same SQL as llm_bm25_topk IS the gate (see LlmQueries scaladoc)
    "llm_bm25_incremental" -> Bm25TopkSql,
    // Distributed BPE training: the oracle replays every round; a green
    // hash proves the distributed pair counts, the deterministic
    // argmax, and the fold-based merge rewrite all equal the classic
    // sequential algorithm bit-for-bit.
    "llm_bpe_train" -> BpeTrainSql,
    // Self-trained tokenization: train → encode → count, one oracle.
    "llm_bpe_selftok" -> BpeSelfTokSql,
    // Unigram-LM tokenization: the Viterbi DP replayed position-by-
    // position; the integer epsilon objective makes the minimum (and
    // the decoded piece count / raw cost) engine-unambiguous.
    "llm_unigram_tokens" ->
      s"""$UnigramCteSql
         |SELECT d.doc_id, CAST(coalesce(b.n_pre, 0) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(b.np, 0) AS BIGINT) AS n_pieces,
         |  CAST(coalesce(b.tc, 0) AS BIGINT) AS total_cost
         |FROM documents d LEFT JOIN b USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // Distributed Unigram-LM training: the COMPLETE hard-EM run
    // replayed as chained CTEs (seed → 3 E/M rounds → true-loss prune
    // → post-prune refit) — the llm_bpe_train discipline for the
    // second tokenizer family.
    "llm_unigram_train" -> UnigramTrainSql,
    // Train → Viterbi-encode with the learned vocabulary → per-doc
    // counts, one oracle statement (the llm_bpe_selftok closure).
    "llm_unigram_selftok" -> UnigramSelfTokSql,
    // Incremental vocabulary refresh: per-half usage slices merged
    // monoidally then refit must equal the batch next round exactly.
    "llm_unigram_incremental" -> UnigramIncrementalSql,
    // Piece-exact packing under the unigram tokenizer: the shared
    // concat-then-chunk layout with n_tokens = the Viterbi piece count.
    "llm_pack_stats_unigram" ->
      s"""$UnigramCteSql,
         |dn AS (SELECT d.doc_id,
         |    ((d.doc_id * 2654435761) % 1000000007) % 1000000 % 8 AS shard,
         |    CAST(coalesce(b.np, 0) AS BIGINT) AS n_tokens
         |  FROM documents d LEFT JOIN b USING (doc_id)),
         |laid AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY shard
         |           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND
         |           CURRENT ROW) - n_tokens AS BIGINT) AS start_offset
         |         FROM dn)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |  CAST(start_offset // 2048 AS BIGINT) AS pack_id,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM laid GROUP BY shard, pack_id
         |ORDER BY shard, pack_id""".stripMargin,
    // Exact phrase search: the oracle matches gram TEXT at every start
    // position (the engine matches 128-bit fingerprints — text never
    // crosses its shuffle — so a green hash also witnesses fp↔text
    // agreement, the LineDedup discipline).
    "llm_phrase_counts" ->
      s"""$PhraseCteSql
         |SELECT CAST(phrase_id AS BIGINT) AS phrase_id, doc_id,
         |  count(*) AS n_occurrences, CAST(min(pos) AS BIGINT) AS first_pos
         |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "llm_phrase_stats" ->
      s"""$PhraseCteSql,
         |c AS (SELECT phrase_id, count(DISTINCT doc_id) AS n_docs,
         |        count(*) AS n_occ FROM m GROUP BY 1)
         |SELECT CAST(pn.phrase_id AS BIGINT) AS phrase_id, pn.phrase_norm,
         |  CAST(coalesce(c.n_docs, 0) AS BIGINT) AS n_docs,
         |  CAST(coalesce(c.n_occ, 0) AS BIGINT) AS n_occurrences
         |FROM pn LEFT JOIN c USING (phrase_id)
         |ORDER BY phrase_id""".stripMargin,
    // Batch retrieval: per-(doc, term) partials computed once over the
    // union term set, fanned out to queries by the qt join; df is the
    // corpus document frequency (identical to the single-query rows).
    "llm_bm25_multi" ->
      s"""WITH $Bm25BaseCteSql,
         |qt AS (SELECT DISTINCT * FROM (VALUES ${
        LlmQueries.Bm25MultiQueries
          .map { case (q, t) => s"($q, '$t')" }.mkString(", ")
      }) AS v(query_id, term)),
         |terms AS (SELECT DISTINCT term FROM qt),
         |q AS (SELECT doc_id, t.term, count(*) AS tf FROM t
         |      JOIN terms USING (term) GROUP BY 1, 2),
         |f AS (SELECT term, count(*) AS df FROM q GROUP BY 1),
         |p AS (SELECT q.doc_id, q.term, $Bm25PartSql AS part
         |  FROM q JOIN f USING (term) JOIN d USING (doc_id) CROSS JOIN s),
         |ms AS (SELECT qt.query_id, p.doc_id, count(*) AS n_terms,
         |         CAST(sum(part) AS BIGINT) AS score_u
         |       FROM p JOIN qt USING (term) GROUP BY 1, 2),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY score_u DESC, doc_id ASC) AS rank FROM ms)
         |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_terms,
         |  score_u, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    // Reciprocal-rank fusion of the BM25 and linear-tf·idf rankings:
    // top-100 pools, rrf = 10^9 // (60 + rank) summed — integer-exact,
    // absent-from-pool ranks as 0 (1-based ranks, so unambiguous).
    "llm_rrf_fusion" ->
      s"""$Bm25ScoreCteSql,
         |rb AS (SELECT doc_id, row_number() OVER (
         |         ORDER BY score_u DESC, doc_id ASC) AS rank_bm25 FROM bsc
         |       QUALIFY rank_bm25 <= 100),
         |lsc AS (SELECT q.doc_id, CAST(sum(least(q.tf, 10000) *
         |          least((1000 * (s.n_docs + 1)) // (f.df + 1), 10000000))
         |          AS BIGINT) AS score_u
         |        FROM q JOIN f USING (term) CROSS JOIN s GROUP BY q.doc_id),
         |rl AS (SELECT doc_id, row_number() OVER (
         |         ORDER BY score_u DESC, doc_id ASC) AS rank_lin FROM lsc
         |       QUALIFY rank_lin <= 100),
         |fused AS (SELECT coalesce(rb.doc_id, rl.doc_id) AS doc_id,
         |    CAST(coalesce(rb.rank_bm25, 0) AS BIGINT) AS rank_bm25,
         |    CAST(coalesce(rl.rank_lin, 0) AS BIGINT) AS rank_lin,
         |    CAST(coalesce(1000000000 // (60 + rb.rank_bm25), 0)
         |       + coalesce(1000000000 // (60 + rl.rank_lin), 0) AS BIGINT) AS rrf_u
         |  FROM rb FULL OUTER JOIN rl ON rb.doc_id = rl.doc_id),
         |rr AS (SELECT *, row_number() OVER (
         |         ORDER BY rrf_u DESC, doc_id ASC) AS rank FROM fused)
         |SELECT doc_id, rank_bm25, rank_lin, rrf_u, CAST(rank AS BIGINT) AS rank
         |FROM rr WHERE rank <= 25 ORDER BY rank""".stripMargin,
    // Hybrid lexical+vector retrieval: BM25 ranking fused with the
    // round-6 cosine ranking (query vector vec_id = 7, self excluded)
    // by integer RRF over top-100 pools.
    "llm_hybrid_fusion" ->
      s"""$Bm25ScoreCteSql,
         |rb AS (SELECT doc_id, row_number() OVER (
         |         ORDER BY score_u DESC, doc_id ASC) AS rank_bm25 FROM bsc
         |       QUALIFY rank_bm25 <= 100),
         |cq AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 7),
         |cs AS (SELECT vec_id AS doc_id,
         |         round(list_cosine_similarity(qv, embedding::DOUBLE[]), 6) AS sim
         |       FROM embeddings, cq WHERE vec_id <> 7),
         |rc AS (SELECT doc_id, row_number() OVER (
         |         ORDER BY sim DESC, doc_id ASC) AS rank_cos FROM cs
         |       QUALIFY rank_cos <= 100),
         |fused AS (SELECT coalesce(rb.doc_id, rc.doc_id) AS doc_id,
         |    CAST(coalesce(rb.rank_bm25, 0) AS BIGINT) AS rank_bm25,
         |    CAST(coalesce(rc.rank_cos, 0) AS BIGINT) AS rank_cos,
         |    CAST(coalesce(1000000000 // (60 + rb.rank_bm25), 0)
         |       + coalesce(1000000000 // (60 + rc.rank_cos), 0) AS BIGINT) AS rrf_u
         |  FROM rb FULL OUTER JOIN rc ON rb.doc_id = rc.doc_id),
         |rr AS (SELECT *, row_number() OVER (
         |         ORDER BY rrf_u DESC, doc_id ASC) AS rank FROM fused)
         |SELECT doc_id, rank_bm25, rank_cos, rrf_u, CAST(rank AS BIGINT) AS rank
         |FROM rr WHERE rank <= 25 ORDER BY rank""".stripMargin,
    // mm_decode_meta: blobs are REAL ImageIO-encoded PNG/BMP bytes whose
    // format and dimensions are pure functions of doc_id; the oracle
    // restates the fixture formulas, so a green hash proves the real
    // encode→header-decode round trip.
    "mm_decode_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
        |  CAST(8 + doc_id % 17 AS BIGINT) AS width,
        |  CAST(8 + doc_id % 13 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mm_resize_meta: decode → bilinear AffineTransformOp to 16×12 →
    // re-encode PNG → header-decode; the whole chain must report the
    // target metadata. Resized PIXELS are pinned by mm_resize_checksum.
    "mm_resize_meta" ->
      """SELECT doc_id, 'png' AS format,
        |  CAST(16 AS BIGINT) AS width, CAST(12 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mm_image_features: exact per-channel pixel sums recomputed from
    // the fixture pixel formula v=(doc_id*1000003+y*1009+x)%2^24 —
    // proves the full-raster decode is pixel-perfect for BOTH codecs.
    "mm_image_features" ->
      """WITH dims AS (SELECT doc_id, 8 + doc_id % 17 AS w, 8 + doc_id % 13 AS h
        |              FROM documents),
        |px AS (SELECT doc_id, (doc_id*1000003 + y*1009 + x) % 16777216 AS v
        |       FROM dims, unnest(generate_series(0, w-1)) AS tx(x),
        |            unnest(generate_series(0, h-1)) AS ty(y))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pixels,
        |  CAST(sum(v // 65536) AS BIGINT) AS sum_r,
        |  CAST(sum((v // 256) % 256) AS BIGINT) AS sum_g,
        |  CAST(sum(v % 256) AS BIGINT) AS sum_b
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Perceptual hash: engine decodes the REAL blob and hashes the
    // raster; the oracle recomputes the identical integer aHash from
    // the pixel formula — a green hash proves codec + kernel together.
    "mm_phash" ->
      s"""${phashCteSql(plantDups = false)}
         |SELECT doc_id, phash FROM hs ORDER BY doc_id""".stripMargin,
    // Near-dup pairs: the oracle joins ALL pairs at Hamming <= 3; the
    // engine's 4-block pigeonhole join must lose nothing in the radius.
    "mm_phash_neardup" ->
      s"""${phashCteSql(plantDups = true)}
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
         |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    // Mixed-blob routing: real container bytes per id formula; the
    // sniffed route must equal the synthesized type.
    "mm_sniff_formats" ->
      """SELECT doc_id, CASE CAST(doc_id % 5 AS INT)
        |  WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' WHEN 2 THEN 'wav'
        |  WHEN 3 THEN 'avi' ELSE 'mp4' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Incremental image dedup: the same all-pairs truth RESTRICTED to
    // pairs touching the arriving shard (ids = 5 mod 10) — the blocked
    // index probe must equal it exactly.
    "mm_phash_incremental" ->
      s"""${phashCteSql(plantDups = true)}
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
         |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= 3
         |  AND (a.doc_id % 10 = 5 OR b.doc_id % 10 = 5)
         |ORDER BY id_a, id_b""".stripMargin,
    // mm_feature_topk: decode → channel-sum features → cosine top-3.
    // Fully live: sums are exact integers (< 2^53 products), sqrt and
    // division are IEEE-correctly-rounded, and both engines evaluate
    // the same left-associated expression → bit-identical doubles, no
    // rounding anywhere.
    "mm_feature_topk" ->
      """WITH dims AS (SELECT doc_id, 8 + doc_id % 17 AS w, 8 + doc_id % 13 AS h
        |              FROM documents),
        |px AS (SELECT doc_id, (doc_id*1000003 + y*1009 + x) % 16777216 AS v
        |       FROM dims, unnest(generate_series(0, w-1)) AS tx(x),
        |            unnest(generate_series(0, h-1)) AS ty(y)),
        |f0 AS (SELECT doc_id,
        |        CAST(sum(v // 65536) AS DOUBLE) AS r,
        |        CAST(sum((v // 256) % 256) AS DOUBLE) AS g,
        |        CAST(sum(v % 256) AS DOUBLE) AS b
        |      FROM px GROUP BY doc_id),
        |f AS (SELECT * FROM f0 WHERE r*r + g*g + b*b > 0),
        |q AS (SELECT doc_id AS query_id, r AS qr, g AS qg, b AS qb
        |      FROM f WHERE doc_id < 20),
        |s AS (SELECT query_id, c.doc_id AS neighbor_id,
        |        (qr*c.r + qg*c.g + qb*c.b) /
        |        (sqrt(qr*qr + qg*qg + qb*qb) * sqrt(c.r*c.r + c.g*c.g + c.b*c.b)) AS sim
        |      FROM q JOIN f c ON c.doc_id <> query_id),
        |ranked AS (SELECT *, row_number() OVER (
        |             PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
        |           FROM s)
        |SELECT query_id, neighbor_id, sim, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    // mm_resize_checksum gate row: n_docs live; the bilinear-resized
    // pixel checksum XOR is JDK-deterministic → pinned per sf.
    "mm_resize_checksum" ->
      s"""SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_resized,
         |  CAST(CASE ($SfDiscriminatorSql)
         |    WHEN 6000 THEN -2712053491407801085
         |    WHEN 60000 THEN -2712053491407801085
         |    WHEN 600000 THEN -1892458704104904103
         |  END AS BIGINT) AS resized_xor,
         |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_target_dims""".stripMargin,
    // mm_audio_meta: real WAV bytes written and header-parsed by
    // javax.sound.sampled; frames = 800+(doc_id%100)*8 at 8 kHz.
    "mm_audio_meta" ->
      """SELECT doc_id, 'wave' AS format, CAST(1 AS BIGINT) AS channels,
        |  CAST(8000 AS BIGINT) AS sample_rate,
        |  CAST(800 + (doc_id % 100) * 8 AS BIGINT) AS n_frames,
        |  CAST(100 + doc_id % 100 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mm_audio_sample_sums: full PCM decode, exact integer sums from
    // the fixture sample formula v=(id*31 + i*7)%65536 - 32768 — proves
    // the javax.sound read path sample-exact, not just the header.
    "mm_audio_sample_sums" ->
      """WITH f AS (SELECT doc_id, 800 + (doc_id % 100) * 8 AS n FROM documents),
        |s AS (SELECT doc_id, (doc_id*31 + i*7) % 65536 - 32768 AS v
        |      FROM f, unnest(generate_series(0, n-1)) AS t(i))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(v) AS BIGINT) AS sum_s,
        |  CAST(sum(abs(v)) AS BIGINT) AS sum_abs
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // mm_video_meta: real AVI/RIFF container bytes, chunk-walk parsed;
    // the oracle restates the fixture formulas (25 fps ⇒ 40 ms/frame);
    // n_frames_demuxed counts actual movi '00db' chunks and must agree.
    "mm_video_meta" ->
      """SELECT doc_id, 'avi' AS container,
        |  CAST(16 + (doc_id % 9) * 2 AS BIGINT) AS width,
        |  CAST(12 + (doc_id % 7) * 2 AS BIGINT) AS height,
        |  CAST(4 + doc_id % 6 AS BIGINT) AS n_frames,
        |  CAST(4 + doc_id % 6 AS BIGINT) AS n_frames_demuxed,
        |  CAST((4 + doc_id % 6) * 40 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mm_mp4_meta: real ISO-BMFF bytes, box-walk parsed; every output
    // field restates a fixture formula (timescale 1000 ⇒ duration in
    // ms, 25 fps ⇒ 40 ms/sample, fixed 16-byte samples ⇒ mdat length).
    "mm_mp4_meta" ->
      """SELECT doc_id, 'isom' AS brand, CAST(1000 AS BIGINT) AS timescale,
        |  CAST((4 + doc_id % 6) * 40 AS BIGINT) AS duration_ms,
        |  CAST(1 AS BIGINT) AS n_tracks,
        |  CAST(16 + (doc_id % 9) * 2 AS BIGINT) AS width,
        |  CAST(12 + (doc_id % 7) * 2 AS BIGINT) AS height,
        |  CAST(4 + doc_id % 6 AS BIGINT) AS n_samples,
        |  CAST((4 + doc_id % 6) * 16 AS BIGINT) AS mdat_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mm_mp4_samples: the sample-table demux (stsz/stsc/stco slicing)
    // hash-gated — same payload formulas as mm_video_frames, sample
    // column names.
    "mm_mp4_samples" ->
      """WITH f AS (SELECT doc_id, g AS sample_idx
        |           FROM documents,
        |             unnest(generate_series(0, CAST(3 + doc_id % 6 AS BIGINT))) AS t(g)
        |           WHERE doc_id < 100)
        |SELECT doc_id, CAST(sample_idx AS BIGINT) AS sample_idx,
        |  CAST(16 AS BIGINT) AS sample_len,
        |  CAST((SELECT sum((doc_id * 31 + sample_idx * 7 + j * 13) % 256)
        |        FROM unnest(generate_series(0, 15)) AS u(j)) AS BIGINT) AS sample_sum
        |FROM f ORDER BY doc_id, sample_idx""".stripMargin,
    // mm_video_frames: the demuxer's chunk boundaries and payload bytes
    // hash-gated — frame count, length, and byte sum all restated from
    // the container/payload formulas (25 fps fixture, 16-byte frames).
    "mm_video_frames" ->
      """WITH f AS (SELECT doc_id, g AS frame_idx
        |           FROM documents,
        |             unnest(generate_series(0, CAST(3 + doc_id % 6 AS BIGINT))) AS t(g)
        |           WHERE doc_id < 100)
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(16 AS BIGINT) AS frame_len,
        |  CAST((SELECT sum((doc_id * 31 + frame_idx * 7 + j * 13) % 256)
        |        FROM unnest(generate_series(0, 15)) AS u(j)) AS BIGINT) AS frame_sum
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    // Gear-CDC reassembly gate (ext/GearChunk.scala): every column
    // lives off the blob length alone — green hash proves the
    // content-defined chunk lens partition each blob exactly and the
    // ordered chunk concatenation is byte-identical (sha256 compare
    // executed engine-side in the same pass).
    "mm_cdc_roundtrip" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS blob_bytes,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS sum_chunk_bytes,
        |  true AS contiguous_ok, true AS reassembled_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Persisted-HLL incremental distinct gate
    // (ext/IncrementalDistinct.scala): n_types and the exact distinct
    // sum are live; zero merge mismatches = epoch-sketch union ≡
    // single-pass sketch; zero outside-envelope = estimates within 5%
    // of exact.
    "events_distinct_incremental_check" ->
      """WITH e AS (SELECT event_type,
        |    count(DISTINCT user_id) AS d
        |  FROM events GROUP BY event_type)
        |SELECT CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(0 AS BIGINT) AS n_merge_mismatch,
        |  CAST(0 AS BIGINT) AS n_outside_5pct,
        |  CAST(sum(d) AS BIGINT) AS sum_exact
        |FROM e""".stripMargin,
    // Incremental gear-CDC parity gate: n_docs / sum_blob_bytes live
    // from the batch split's text lengths; n_mismatch 0 = the
    // bucket-pruned store probe equals the from-scratch recompute on
    // every column for every doc.
    "mm_cdc_incremental_check" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(0 AS BIGINT) AS n_mismatch,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_blob_bytes
        |FROM documents
        |WHERE doc_id % 10 = 0 AND octet_length(encode(text)) > 0""".stripMargin,
    // mm_frame_sample: mirror the slicing arithmetic (floor, not round —
    // Spark's cast-to-int truncates; DuckDB's rounds).
    "mm_frame_sample" ->
      """WITH f AS (SELECT doc_id, octet_length(encode(text)) AS L, g AS frame_idx
        |           FROM documents, unnest(generate_series(0, 3)) AS t(g))
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |  CAST(least(16, greatest(0,
        |    L - (CAST(floor(frame_idx * greatest(L - 16, 1) / 3.0) AS INT) + 1) + 1))
        |    AS BIGINT) AS frame_len
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
  )

  /** Machine-checkable gate manifest: every registered query WITHOUT an
    * [[oracleSql]] entry (rows-only — hash-seeded or probabilistic
    * output DuckDB cannot restate verbatim) maps to the companion gate
    * query whose oracle-green row carries its correctness: recall rows
    * recompute the exact ground truth live and pin the deterministic
    * approximate side; parity rows prove blocked ≡ brute-force;
    * checksum rows pin the seed-deterministic values themselves.
    * `GatesManifestSpec` asserts the mapping is total (no rows-only
    * query ships ungated) and well-formed (every gate target HAS an
    * oracle); [[Verify]] emits it as `gates.json` so the driver
    * artifact shows the linkage. */
  val gates: Map[String, String] = Map(
    // approx sketches → drift/envelope rows against the exact twin
    "docs_length_quantiles_approx" -> "docs_length_quantiles",
    "events_approx_distinct"       -> "events_approx_distinct_check",
    // sign-LSH family → live-exact-denominator recall rows
    "llm_cosine_neardup"           -> "llm_cosine_neardup_recall",
    "llm_cosine_neardup_scale"     -> "llm_cosine_neardup_scale_recall",
    "llm_cosine_neardup_incremental" -> "llm_cosine_incremental_recall",
    "llm_cosine_topk_lsh"          -> "llm_lsh_recall",
    "llm_cosine_topk_lsh_scale"    -> "llm_lsh_scale_recall",
    // SemDeDup → structural-subset + live-catchable coverage rows
    "llm_semdedup"                 -> "llm_semdedup_check",
    "llm_semdedup_incremental"     -> "llm_semdedup_incremental_check",
    // IVF family → recall + serving parity + cell-occupancy checksum
    "llm_cosine_topk_ivf"          -> "llm_ivf_recall",
    "llm_cosine_topk_ivf_indexed"  -> "llm_ivf_indexed_parity",
    "llm_cosine_topk_pq"           -> "llm_pq_recall",
    "llm_ivf_cells"                -> "llm_ivf_cells_checksum",
    // minhash/simhash/winnowing → recall, parity, and value checksums
    "llm_neardup_minhash"          -> "llm_minhash_recall",
    "llm_minhash_incremental"      -> "llm_minhash_incremental_recall",
    "llm_simhash_incremental"      -> "llm_simhash_incremental_parity",
    "llm_simhash_fingerprints"     -> "llm_simhash_checksum",
    "llm_simhash_neardup"          -> "llm_simhash_parity",
    "llm_winnow_fingerprints"      -> "llm_winnow_checksum",
    "llm_winnow_shared_pairs"      -> "llm_winnow_checksum",
    // best-fit-decreasing packing → bounds + partition-exactness gate
    "llm_pack_bestfit"             -> "llm_pack_bestfit_check",
    // deflate signal → live-raw + pinned-deflate aggregate checksum
    "text_compress_stats"          -> "text_compress_checksum",
    // gear CDC → single-pass reassembly-integrity row (lens contiguous
    // + sum to blob length + sha256(concat chunks) == sha256(blob))
    "mm_cdc_chunks"                -> "mm_cdc_roundtrip",
    "mm_cdc_dedup"                 -> "mm_cdc_roundtrip",
    // incremental CDC → store-probe ≡ from-scratch parity row (live
    // sum_blob_bytes pins the byte accounting)
    "mm_cdc_incremental"           -> "mm_cdc_incremental_check",
    // persisted-HLL incremental distinct → merge-lossless + 5% envelope
    // row with live exact sums
    "events_distinct_incremental"  -> "events_distinct_incremental_check",
  )
}
