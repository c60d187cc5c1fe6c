"""Structural plan-shape guards: the headline queries' physical properties
(bounded shuffle counts, broadcast star joins, no cartesian products) are
asserted here so a perf-regressing plan change fails CI, not just a bench
run someone has to eyeball. Counts use plan_id-deduped Exchange nodes
(cached subtrees reprint per use)."""

from __future__ import annotations

import re

import pytest

from songs_etl_spark.plans import REGISTRY

SF = "/root/testdata/sf0.001"

#: name -> (max data shuffles, min broadcasts)
BOUNDS = {
    "pricing_summary": (2, 0),
    "star_revenue_by_nation": (2, 1),
    "top_orders_by_revenue": (2, 1),
    "user_sessionization": (2, 0),
    "fact_build_star": (6, 1),  # 4-dim star: per-dim dedup exchanges (PLANS.md)
    # the as-of family's contract IS its shuffle count: one union exchange
    # (plus the final collect), NEVER a range-join pair explosion — nearest
    # computes both carries on the same exchange (two in-partition sorts)
    "asof_click_attribution": (2, 0),
    "asof_forward_next_click": (2, 0),
    "asof_nearest_click": (2, 0),
    "asof_strict_prior_click": (2, 0),
    "attribution_window_sweep": (4, 0),
    "logreg_quality_score_bins": (4, 0),  # map-only score + tiny agg (+GD rounds)
}


def _plan(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _count(plan: str, pattern: str) -> int:
    # dedup annotated nodes by plan_id; UNANNOTATED matches (subquery /
    # differently formatted sections) still count one each — a mixed plan
    # must not hide shuffles just because some lines carry ids
    lines = re.findall(pattern + r"[^\n]*", plan)
    ids = set()
    n_bare = 0
    for ln in lines:
        m = re.search(r"\[plan_id=(\d+)\]", ln)
        if m:
            ids.add(m.group(1))
        else:
            n_bare += 1
    return len(ids) + n_bare


@pytest.mark.parametrize("name", sorted(BOUNDS))
def test_headline_plan_within_shuffle_budget(spark, name):
    max_shuffles, min_broadcasts = BOUNDS[name]
    plan = _plan(spark, name)
    shuffles = _count(plan, r"\bExchange (?:hash|range|RoundRobin|SinglePartition)")
    broadcasts = _count(plan, r"BroadcastExchange")
    assert shuffles <= max_shuffles, f"{name}: {shuffles} shuffles > budget {max_shuffles}"
    assert broadcasts >= min_broadcasts, f"{name}: expected >= {min_broadcasts} broadcasts"
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "embedding_neardup_lsh",
        "rh_neardup_hisim",
        "multimodal_image_phash_neardup",
        "link_prediction_resource_alloc",
        "kcore_decomposition_peel",
        "line_dedup_boilerplate",
        "knn_graph_ivf",
    ],
)
def test_neardup_plans_never_nested_loop(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nested_loop_quarantine_logic():
    """tools/plan_audit.nested_loop_violations: untagged nested-loop plans
    fail; baseline- or bcast-const-tagged ones pass."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "plan_audit",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "plan_audit.py"),
    )
    pa = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pa)

    rows = [
        {"name": "ok_clean", "nested_loop": 0, "cartesian": 0, "tags": ()},
        {"name": "ok_baseline", "nested_loop": 2, "cartesian": 0, "tags": ("baseline",)},
        {"name": "ok_bcast", "nested_loop": 1, "cartesian": 0, "tags": ("bcast-const",)},
        {"name": "bad_untagged", "nested_loop": 2, "cartesian": 0, "tags": ()},
        {"name": "bad_cartesian", "nested_loop": 0, "cartesian": 1, "tags": ("bench",)},
    ]
    bad = pa.nested_loop_violations(rows)
    assert [v.split(":")[0] for v in bad] == ["bad_untagged", "bad_cartesian"]


def test_registry_quarantine_tags_are_known():
    """Only documented tag vocabulary in the registry — a typo like
    'bcastconst' would silently disable the nested-loop guard."""
    known = {"baseline", "bcast-const"}
    for name, spec in REGISTRY.items():
        assert set(spec.tags) <= known, f"{name}: unknown tags {spec.tags}"
