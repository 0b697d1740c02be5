package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the oracle-checked operator catalog ([[Queries]]);
  * `oracleSql` the DuckDB equivalents ([[Oracles]]). Keys present in
  * `queries` but not in `oracleSql` are non-SQL-expressible operators
  * (recursive/semantic chunker, LSH, SimHash) covered by ScalaTest
  * specs and the driver's rows-only check.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full RAG slice — chunk → embed → store → top-5 retrieve →
    * cited context per query (SURVEY §7.2). */
  def entry(spark: SparkSession): DataFrame = {
    val docs = io.Tables.documents(spark, "/root/testdata/sf0.001")
    pipeline.RagPipeline.run(spark, docs,
      Seq("spark window merge join", "stream batch dedup"), "simple")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // chunking
    "q_chunk_fixed" -> (Queries.q_chunk_fixed _),
    "q_chunk_summary" -> (Queries.q_chunk_summary _),
    "q_chunk_percentiles" -> (Queries.q_chunk_percentiles _),
    "q_chunk_ids" -> (Queries.q_chunk_ids _),
    "q_adjacent_overlap" -> (Queries.q_adjacent_overlap _),
    "q_overlap_stats" -> (Queries.q_overlap_stats _),
    "q_boundary_sweep" -> (Queries.q_boundary_sweep _),
    "q_chunk_recursive" -> (Queries.q_chunk_recursive _),
    "q_doc_split" -> (Queries.q_doc_split _),
    "q_chunk_recursive_split" -> (Queries.q_chunk_recursive_split _),
    "q_chunk_cdc" -> (Queries.q_chunk_cdc _),
    "q_cdc_shared" -> (Queries.q_cdc_shared _),
    "q_cdc_dedup" -> (Queries.q_cdc_dedup _),
    "q_chunk_semantic" -> (Queries.q_chunk_semantic _),
    "q_chunk_semantic_corpus" -> (Queries.q_chunk_semantic_corpus _),
    // flagship pipeline, end to end
    "q_rag_e2e" -> (Queries.q_rag_e2e _),
    "q_rag_e2e_hybrid" -> (Queries.q_rag_e2e_hybrid _),
    // vector retrieval
    "q_topk_cosine" -> (Queries.q_topk_cosine _),
    "q_topk_many" -> (Queries.q_topk_many _),
    "q_topk_mmr" -> (Queries.q_topk_mmr _),
    "q_topk_filtered" -> (Queries.q_topk_filtered _),
    "q_cosine_pairs" -> (Queries.q_cosine_pairs _),
    "q_embed_pool" -> (Queries.q_embed_pool _),
    "q_near_dup_cosine" -> (Queries.q_near_dup_cosine _),
    "q_near_dup_lsh" -> (Queries.q_near_dup_lsh _),
    "q_near_dup_signlsh" -> (Queries.q_near_dup_signlsh _),
    "q_signlsh_bands" -> (Queries.q_signlsh_bands _),
    "q_brp_keys" -> (Queries.q_brp_keys _),
    "q_topk_lsh" -> (Queries.q_topk_lsh _),
    "q_topk_signlsh" -> (Queries.q_topk_signlsh _),
    "q_topk_ivf" -> (Queries.q_topk_ivf _),
    "q_ann_recall" -> (Queries.q_ann_recall _),
    "q_quantize_int8" -> (Queries.q_quantize_int8 _),
    "q_topk_int8_rerank" -> (Queries.q_topk_int8_rerank _),
    "q_topk_ivf_crafted" -> (Queries.q_topk_ivf_crafted _),
    "q_topk_ivf_indexed" -> (Queries.q_topk_ivf_indexed _),
    "q_topk_pq" -> (Queries.q_topk_pq _),
    "q_topk_pq_rerank" -> (Queries.q_topk_pq_rerank _),
    "q_topk_ivfpq" -> (Queries.q_topk_ivfpq _),
    "q_topk_ivfpq_indexed" -> (Queries.q_topk_ivfpq_indexed _),
    "q_pq_recall" -> (Queries.q_pq_recall _),
    "q_ivfpq_recall" -> (Queries.q_ivfpq_recall _),
    "q_topk_ivfpq_res" -> (Queries.q_topk_ivfpq_res _),
    "q_ivfpq_res_recall" -> (Queries.q_ivfpq_res_recall _),
    // tabular surface
    "q_filter_conj" -> (Queries.q_filter_conj _),
    "q_date_between" -> (Queries.q_date_between _),
    "q_string_preds" -> (Queries.q_string_preds _),
    "q_tpch_q1" -> (Queries.q_tpch_q1 _),
    "q_join_broadcast" -> (Queries.q_join_broadcast _),
    "q_join_multi" -> (Queries.q_join_multi _),
    "q_semi_join" -> (Queries.q_semi_join _),
    "q_anti_join" -> (Queries.q_anti_join _),
    "q_join_salted" -> (Queries.q_join_salted _),
    "q_asof_join" -> (Queries.q_asof_join _),
    "q_range_join" -> (Queries.q_range_join _),
    "q_window_suite" -> (Queries.q_window_suite _),
    "q_rollup" -> (Queries.q_rollup _),
    "q_window_topk" -> (Queries.q_window_topk _),
    "q_running_sum" -> (Queries.q_running_sum _),
    "q_first_per_group" -> (Queries.q_first_per_group _),
    "q_value_counts" -> (Queries.q_value_counts _),
    "q_distinct_values" -> (Queries.q_distinct_values _),
    "q_histogram" -> (Queries.q_histogram _),
    "q_group_collect" -> (Queries.q_group_collect _),
    "q_page_offset" -> (Queries.q_page_offset _),
    "q_topn_global" -> (Queries.q_topn_global _),
    "q_year_quarter" -> (Queries.q_year_quarter _),
    "q_valid_dates" -> (Queries.q_valid_dates _),
    "q_url_parse" -> (Queries.q_url_parse _),
    "q_json_extract" -> (Queries.q_json_extract _),
    "q_base64" -> (Queries.q_base64 _),
    // dedup
    "q_dedup_exact" -> (Queries.q_dedup_exact _),
    "q_substr_spans" -> (Queries.q_substr_spans _),
    "q_substr_dedup" -> (Queries.q_substr_dedup _),
    "q_dedup_incremental" -> (Queries.q_dedup_incremental _),
    "q_minhash_sig" -> (Queries.q_minhash_sig _),
    "q_minhash_candidates" -> (Queries.q_minhash_candidates _),
    "q_minhash_verified" -> (Queries.q_minhash_verified _),
    "q_ngram_jaccard" -> (Queries.q_ngram_jaccard _),
    "q_simhash_candidates" -> (Queries.q_simhash_candidates _),
    "q_dup_clusters" -> (Queries.q_dup_clusters _),
    "q_dup_clusters_embedding" -> (Queries.q_dup_clusters_embedding _),
    "q_semdedup" -> (Queries.q_semdedup _),
    "q_kmeans_topics" -> (Queries.q_kmeans_topics _),
    "q_line_dedup" -> (Queries.q_line_dedup _),
    "q_dsir_weights" -> (Queries.q_dsir_weights _),
    "q_mm_afp" -> (Queries.q_mm_afp _),
    "q_semdedup_incremental" -> (Queries.q_semdedup_incremental _),
    "q_dsir_select" -> (Queries.q_dsir_select _),
    "q_contamination" -> (Queries.q_contamination _),
    "q_decontaminate" -> (Queries.q_decontaminate _),
    "q_bm25_topk" -> (Queries.q_bm25_topk _),
    "q_bm25_indexed" -> (Queries.q_bm25_indexed _),
    "q_hybrid_rrf" -> (Queries.q_hybrid_rrf _),
    // text analysis
    "q_lang_id" -> (Queries.q_lang_id _),
    "q_quality_score" -> (Queries.q_quality_score _),
    "q_gopher_rules" -> (Queries.q_gopher_rules _),
    "q_classifier_filter" -> (Queries.q_classifier_filter _),
    "q_corpus_shuffle" -> (Queries.q_corpus_shuffle _),
    "q_datacard" -> (Queries.q_datacard _),
    "q_mm_phash" -> (Queries.q_mm_phash _),
    "q_training_mix" -> (Queries.q_training_mix _),
    "q_domain_quota" -> (Queries.q_domain_quota _),
    "q_quality_buckets" -> (Queries.q_quality_buckets _),
    "q_token_count" -> (Queries.q_token_count _),
    "q_bpe_tokens" -> (Queries.q_bpe_tokens _),
    "q_bpe_crafted" -> (Queries.q_bpe_crafted _),
    "q_fingerprint" -> (Queries.q_fingerprint _),
    "q_repetition" -> (Queries.q_repetition _),
    "q_corpus_filter" -> (Queries.q_corpus_filter _),
    "q_redact" -> (Queries.q_redact _),
    "q_html_extract" -> (Queries.q_html_extract _),
    "q_normalize_nfc" -> (Queries.q_normalize_nfc _),
    "q_unigram_logprob" -> (Queries.q_unigram_logprob _),
    "q_bigram_logprob" -> (Queries.q_bigram_logprob _),
    "q_pmi_pairs" -> (Queries.q_pmi_pairs _),
    "q_kmv_distinct" -> (Queries.q_kmv_distinct _),
    "q_hll_distinct" -> (Queries.q_hll_distinct _),
    "q_cms_topk" -> (Queries.q_cms_topk _),
    "q_bloom_filter" -> (Queries.q_bloom_filter _),
    "q_tfidf_keywords" -> (Queries.q_tfidf_keywords _),
    "q_sample_det" -> (Queries.q_sample_det _),
    "q_sample_stratified" -> (Queries.q_sample_stratified _),
    "q_temperature_mix" -> (Queries.q_temperature_mix _),
    "q_token_shards" -> (Queries.q_token_shards _),
    "q_seq_pack" -> (Queries.q_seq_pack _),
    "q_top_ngrams" -> (Queries.q_top_ngrams _),
    // events
    "q_events_hourly" -> (Queries.q_events_hourly _),
    "q_funnel" -> (Queries.q_funnel _),
    "q_funnel_pairs" -> (Queries.q_funnel_pairs _),
    "q_events_sliding" -> (Queries.q_events_sliding _),
    "q_sessions" -> (Queries.q_sessions _),
    // multimodal
    "q_mm_features" -> (Queries.q_mm_features _),
    "q_mm_decode" -> (Queries.q_mm_decode _),
    "q_mm_audio" -> (Queries.q_mm_audio _),
    "q_mm_video" -> (Queries.q_mm_video _),
    "q_mm_frames" -> (Queries.q_mm_frames _),
    // remaining SURVEY §2 coverage
    "q_chunk_locate" -> (Queries.q_chunk_locate _),
    "q_chunk_occurrences" -> (Queries.q_chunk_occurrences _),
    "q_chunk_recursive_crafted" -> (Queries.q_chunk_recursive_crafted _),
    "q_chunk_semantic_crafted" -> (Queries.q_chunk_semantic_crafted _),
    "q_text_overlap_pairs" -> (Queries.q_text_overlap_pairs _),
    "q_ocr_nested" -> (Queries.q_ocr_nested _),
    "q_positional_zip" -> (Queries.q_positional_zip _),
    "q_context_assembly" -> (Queries.q_context_assembly _),
    "q_ocr_flatten" -> (Queries.q_ocr_flatten _),
    "q_chunk_json" -> (Queries.q_chunk_json _),
    "q_union_dedup" -> (Queries.q_union_dedup _),
    "q_excluded_columns" -> (Queries.q_excluded_columns _),
    "q_cardinality_gate" -> (Queries.q_cardinality_gate _),
    "q_success_counts" -> (Queries.q_success_counts _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.sql
}
