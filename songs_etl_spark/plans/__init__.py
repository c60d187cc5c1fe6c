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
    # Round-7 rotation (verdict task 5): the r1-r6 windows certified ~102
    # distinct queries; this window is composed ENTIRELY of never-sampled
    # queries — the 24 round-6 ops head it, and the families the driver had
    # sampled ≤1 row from (sketches, formats, subqueries, projection,
    # ranges) each contribute several.
    # round-6/7 flagship ops
    "tfidf_cosine_neardup_pairs", "doc_winnowing_fingerprints",
    "winnowing_overlap_pairs", "rag_rrf_fusion", "matryoshka_truncation_recall",
    "ann_ivfpq_residual_topk", "spherical_kmeans_assign", "kcenter_coreset_select",
    "closeness_centrality_sampled", "langid_confidence_margin",
    "langid_reliability_bins", "greedy_bigram_decode", "k_anonymity_audit",
    "curriculum_phase_schedule", "target_encoding_loo", "logreg_quality_gd",
    "logreg_quality_score_bins", "mannkendall_revenue_trend",
    "seasonal_decompose_weekly", "ks_test_value_drift",
    "asof_tolerance_attribution", "asof_forward_next_click",
    "asof_nearest_click", "streaming_daily_topk_events",
    "multimodal_image_histogram",
    # graphs (never-sampled members of the family)
    "hits_hubs_authorities", "triangle_clustering_coefficient",
    "label_propagation_communities",
    # text / LM
    "kneser_ney_bigram_logprob", "bm25_doc_scores", "zipf_law_fit",
    # sketches (≤1 r06 row)
    "heavy_hitters_countmin", "kmv_theta_custkey_overlap",
    "ams_f2_selfjoin_size", "hll_jaccard_yearly_customers",
    # formats
    "orc_roundtrip_monthly_revenue", "xml_roundtrip_monthly_revenue",
    # subqueries + TPC-H classics
    "min_cost_supplier_q2", "shipping_priority_q3", "product_type_profit_q9",
    "returned_item_reporting_q10", "suppliers_who_kept_waiting",
    "rich_inactive_customers",
    # projection
    "jl_random_projection_recall", "sq8_scalar_quant_recall",
    "fisher_score_dims",
    # ranges / sampling
    "sliding_window_event_rate", "ohlc_daily_value", "psi_value_drift",
    # dedup / similarity / curation
    "dedup_cluster_size_histogram", "dedup_threshold_sweep",
    "dedup_source_crosstab", "attribution_window_sweep", "dedup_keep_best",
    "decontaminate_ngram_overlap", "mmr_diverse_rerank",
    "hard_negative_mining",
    # streaming / training / warehouse / multimodal
    "streaming_indexed_admission", "streaming_dedup_admission",
    "pii_redact_docs", "doc_chunk_sliding",
    "rfm_customer_segments", "cdc_apply_events", "multimodal_wav_decode",
    "multimodal_image_sobel",
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
