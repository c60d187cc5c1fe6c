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
#: Round-12 rotation (round-11 verdict task 8 + this round's evidence
#: needs): the 17 never-driver-sampled queries first (the tail the
#: round-11 window could not fit — sampling them completes 369/369
#: queries with driver evidence), then item_item_cosine_cf (ADVICE r11:
#: its last oracle pin predates the round-11 union-to-explode rewrite),
#: then every query whose PLAN this optimization round changed (graph-ANN
#: searches, NN-descent builds, Louvain, Theil-Sen/Mann-Kendall,
#: tokenizer trainers), then a cross-family sample of spread()-keyed
#: paths (dedup, text, multimodal, PQ, sketches, clustering) so the
#: round's one sweeping mechanical change gets driver-hash evidence
#: beyond the local oracle run. 17 + 1 + 32 = 50 exactly.
_LEAD_QUERIES = [
    # — 17 never-sampled (completes the backlog) —
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
    # — ADVICE r11: re-pin after the r11 rewrite —
    "item_item_cosine_cf",
    # — every query whose plan round 12 changed —
    "ann_graph_beam_search",
    "ann_graph_beam_search_nnd",
    "graph_ann_recall_vs_exact",
    "graph_ann_nnd_recall_vs_cell",
    "knn_graph_nndescent",
    "nndescent_recall_vs_exact",
    "louvain_one_level",
    "louvain_levels",
    "theilsen_revenue_trend",
    "mannkendall_revenue_trend",
    "bpe_train_merges",
    "bpe_train_merges_batched",
    "bpe_train_merges_incremental",
    "wordpiece_train_merges",
    "bpe_segment_counts",
    # — spread()-keyed cross-family sample —
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_exact_substrings",
    "doc_quality_stats",
    "gopher_quality_filter",
    "bm25_doc_scores",
    "token_explode_topk",
    "tfidf_top_terms",
    "multimodal_wav_decode",
    "multimodal_image_entropy",
    "semantic_dedup",
    "kmeans_embeddings",
    "ann_pq_adc_topk",
    "ann_ivfpq_topk",
    "unigram_lm_em_round",
    "rolling_distinct_users_hll",
    "ngram_lm_perplexity_filter",
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
