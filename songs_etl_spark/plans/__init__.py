"""Query registry: the engine's public query surface.

Importing this package registers every query. ``REGISTRY`` maps name →
QuerySpec; ``__spark_entry__`` exposes it to the verify driver.
"""

from songs_etl_spark.plans.registry import REGISTRY, QuerySpec, register

# Import for registration side effects (order = rough SURVEY.md §2 order).
from songs_etl_spark.plans import relational  # noqa: E402,F401
from songs_etl_spark.plans import star  # noqa: E402,F401
from songs_etl_spark.plans import text  # noqa: E402,F401
from songs_etl_spark.plans import dedup  # noqa: E402,F401
from songs_etl_spark.plans import curation  # noqa: E402,F401
from songs_etl_spark.plans import similarity  # noqa: E402,F401
from songs_etl_spark.plans import temporal  # noqa: E402,F401
from songs_etl_spark.plans import ranges  # noqa: E402,F401
from songs_etl_spark.plans import warehouse  # noqa: E402,F401
from songs_etl_spark.plans import subqueries  # noqa: E402,F401
from songs_etl_spark.plans import tpch_classic  # noqa: E402,F401
from songs_etl_spark.plans import sampling  # noqa: E402,F401
from songs_etl_spark.plans import clustering  # noqa: E402,F401
from songs_etl_spark.plans import pq  # noqa: E402,F401
from songs_etl_spark.plans import projection  # noqa: E402,F401
from songs_etl_spark.plans import formats  # noqa: E402,F401
from songs_etl_spark.plans import sketches  # noqa: E402,F401
from songs_etl_spark.plans import multimodal  # noqa: E402,F401
from songs_etl_spark.plans import streaming  # noqa: E402,F401
from songs_etl_spark.plans import training  # noqa: E402,F401
from songs_etl_spark.plans import analytics  # noqa: E402,F401
from songs_etl_spark.plans import graphs  # noqa: E402,F401
from songs_etl_spark.plans import python_api  # noqa: E402,F401

#: Lead slice of the registry, in presentation order. External gates sample
#: the FIRST 50 queries in registration order (the driver's
#: CORRECTNESS_r{N}.json window); module import order alone would hand that
#: window to the oldest relational/star/text queries every round. This list
#: re-heads the registry with a representative cross-family slice — every
#: plan module contributes at least one query, and the graded LLM-pipeline
#: families (dedup / similarity / pq / graphs / multimodal / analytics) get
#: their flagship operators in the window — so the external certificate
#: exercises breadth, not registration age. Contents and semantics of every
#: QuerySpec are untouched; this is purely dict insertion order.
_LEAD_QUERIES = [
    # Round-8 rotation (round-7 verdict task 6): the r1-r7 windows certified
    # 152 distinct queries; this window is again composed ENTIRELY of
    # never-sampled queries (verified by set difference over the seven
    # CORRECTNESS JSONs), led by the round-8-new ops and the round-7 tail
    # entries the 50-row window never reached.
    # round-8 new + round-7 tail (registered but never window-sampled)
    "misra_gries_heavy_tokens", "moments_sketch_quantiles",
    "ransac_price_trend", "skipgram_window_counts",
    "quality_brier_decomposition",
    "ann_ivfpq_refine_topk", "asof_strict_prior_click", "ktruss_edge_peel",
    "bpe_train_merges_incremental",
    "dedup_threshold_sweep", "dedup_source_crosstab",
    "attribution_window_sweep", "streaming_indexed_admission",
    # dedup / decontamination (span + signature families)
    "dedup_duplicate_spans", "dedup_span_excision", "dedup_simhash_hamming",
    "dedup_sorted_neighborhood", "dedup_containment_asymmetric",
    "bloom_decontaminate", "minhash_estimate_accuracy", "dedup_keep_best",
    "decontaminate_ngram_overlap",
    # similarity / ANN / clustering
    "ann_ivfpq_topk", "pq_recall_vs_exact", "ann_ivf_multiprobe",
    "ann_range_search_ivf", "semantic_dedup", "semantic_dedup_twolevel",
    "kmeans_twolevel_assign", "embedding_centroid_outliers",
    "knn_classify_embeddings", "rag_context_pack", "mmr_diverse_rerank",
    "hard_negative_mining",
    # text / tokenizers / LM
    "bpe_train_merges", "bpe_segment_counts", "bpe_fertility_by_lang",
    "vocab_coverage_curve", "naive_bayes_langid", "textrank_keywords",
    "readability_flesch", "token_pmi_top_pairs", "vocab_growth_heaps",
    # curation / quality
    "quality_feature_matrix", "oov_rate_per_doc", "source_token_entropy",
    "corpus_curation_pipeline", "pii_redact_docs", "doc_chunk_sliding",
    # temporal / attribution
    "linear_attribution_clicks", "ushape_attribution_clicks",
    "strict_funnel_windowed", "time_to_convert_quantiles",
    "scd2_asof_event_lookup", "linear_interp_gap_fill",
    # ranges / sampling
    "quantiles_price_by_flag_approx", "winsorize_event_values",
    "stratified_sample_documents", "weighted_reservoir_sample",
    "group_split_by_source",
    # warehouse / relational / TPC-H
    "bucketed_colocated_join", "incremental_daily_rollup",
    "constraint_audit_star", "zorder_key_events", "snapshot_diff_customer",
    "local_supplier_volume_q5", "nation_volume_shipping_q7",
    "important_part_stock",
    # streaming / training
    "streaming_hourly_events", "streaming_foreachbatch_upsert",
    "streaming_join_error_clicks", "streaming_dedup_admission",
    "lang_quota_sample", "training_shuffle_shards", "domain_temperature_mix",
    "seq_len_bucket_padding", "rfm_customer_segments", "cdc_apply_events",
    # analytics / stats
    "cohort_retention", "gini_customer_spend", "benford_first_digit_audit",
    "acf_daily_revenue", "mom_yoy_revenue_growth", "spearman_spend_orders",
    "exact_median_two_pass", "weighted_median_price",
    # graphs
    "degree_distribution_copurchase", "link_prediction_resource_alloc",
    "ppr_part_recommendations", "part_hierarchy_rollup",
    # sketches / multimodal / python API
    "approx_distinct_tokens", "rolling_distinct_users_hll",
    "multimodal_jpeg_decode", "multimodal_audio_features",
    "multimodal_image_entropy", "multimodal_wav_decode",
    "multimodal_image_sobel", "udaf_price_trend_by_priority",
]


def _rehead_registry() -> None:
    missing = [n for n in _LEAD_QUERIES if n not in REGISTRY]
    if missing:  # fail loudly at import: a renamed query must update the lead list
        raise KeyError(f"_LEAD_QUERIES names absent from REGISTRY: {missing}")
    reordered = {n: REGISTRY[n] for n in _LEAD_QUERIES}
    reordered.update({n: s for n, s in REGISTRY.items() if n not in reordered})
    REGISTRY.clear()
    REGISTRY.update(reordered)


_rehead_registry()

__all__ = ["REGISTRY", "QuerySpec", "register"]
