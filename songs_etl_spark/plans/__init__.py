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
#: CORRECTNESS_r{N}.json window); this list re-heads the registry so that
#: window carries maximum NEW evidence each round. Contents and semantics of
#: every QuerySpec are untouched; this is purely dict insertion order.
#:
#: Round-11 rotation (round-10 verdict task 6): the six round-11-new
#: queries first (driver evidence for new ops), then the ENTIRE remaining
#: never-driver-sampled backlog (61 names, verified by set difference over
#: CORRECTNESS_r01..r10 against the registry). 6 + 61 = 67 > 50, so this
#: round's window covers the six new ops + the first 44 of the backlog,
#: leaving 17 (the tail below from 'funnel_wilson_intervals' on) for the
#: round-12 window to finish.
_LEAD_QUERIES = [
    "ann_graph_beam_search_nnd",
    "graph_ann_nnd_recall_vs_cell",
    "louvain_levels",
    "dedup_substring_excision_apply",
    "ngram_lm_perplexity_filter",
    "dp_clipped_sum_release",
    "pattern_view_purchase_no_click",
    "mad_outlier_events",
    "acf_daily_revenue",
    "streaming_left_join_error_clicks",
    "graph_edge_churn_monthly",
    "multimodal_frame_sample",
    "ab_funnel_conversion_lift",
    "chisq_brand_size",
    "mom_yoy_revenue_growth",
    "multimodal_bmp_decode",
    "woe_iv_price_deciles",
    "spearman_spend_orders",
    "multimodal_image_resize",
    "period_end_balance_monthly",
    "exact_median_two_pass",
    "multimodal_audio_silence",
    "weighted_median_price",
    "regression_price_by_qty",
    "events_markov_transitions",
    "anomaly_zscore_events",
    "copurchase_frequent_pairs",
    "ab_test_welch_t",
    "order_percentile_ranks",
    "event_debounce",
    "ewma_user_value",
    "histogram_order_totals",
    "top_event_paths",
    "missing_hour_buckets",
    "top_brands_with_other",
    "aqp_sampled_counts",
    "order_value_daily_proration",
    "top_token_per_source",
    "daily_revenue_click_corr",
    "cumulative_unique_users",
    "nation_share_of_region",
    "new_vs_returning_daily",
    "peak_concurrent_users_daily",
    "daily_session_stats",
    "revenue_changepoint_cusum",
    "hhi_brand_concentration",
    "ndcg_bm25_vs_quality",
    "lorenz_spend_deciles",
    "pareto_frontier_orders",
    "association_rules_copurchase",
    "funnel_wilson_intervals",
    "cohort_ltv_curves",
    "roc_auc_urgency_by_segment",
    "price_elasticity_by_brand",
    "dow_seasonality_revenue",
    "activity_streaks_islands",
    "abc_part_classification",
    "monthly_churn_rate",
    "kendall_tau_spend_vs_orders",
    "infogain_feature_splits",
    "segment_migration_matrix",
    "correlation_matrix_lineitem",
    "skewness_kurtosis_by_flag",
    "capped_running_balance",
    "holt_backtest_mape",
    "unigram_lm_em_prune",
    "poisson_bootstrap_order_mean",
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
