"""Accuracy contracts for the sketch aggregates: the registered queries now
self-assert the published error bounds (within_bound column, oracle-checked);
these tests pin the bound logic against independently computed exact values
and cover the estimate-only production builders."""

from __future__ import annotations

from pyspark.sql import functions as F

from songs_etl_spark.functions.text import tokens
from songs_etl_spark.plans.sketches import (
    approx_distinct_tokens,
    approx_distinct_tokens_estimate,
    approx_quantiles_estimate,
    approx_quantiles_event_value,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hll_bound_query_all_within(spark):
    rows = approx_distinct_tokens(spark, SF_DIR).collect()
    assert rows and all(r.within_bound for r in rows)
    # exact_vocab column really is the exact count.
    exact = {
        r.lang: r.vocab
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("lang", F.explode(tokens("text")).alias("token"))
        .groupBy("lang")
        .agg(F.countDistinct("token").alias("vocab"))
        .collect()
    }
    assert {r.lang: r.exact_vocab for r in rows} == exact


def test_hll_estimate_within_rsd(spark):
    approx = {
        r.lang: r.approx_vocab
        for r in approx_distinct_tokens_estimate(spark, SF_DIR).collect()
    }
    exact = {
        r.lang: r.vocab
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("lang", F.explode(tokens("text")).alias("token"))
        .groupBy("lang")
        .agg(F.countDistinct("token").alias("vocab"))
        .collect()
    }
    assert set(approx) == set(exact)
    for lang, est in approx.items():
        # rsd=0.02 → allow 4 standard deviations.
        assert abs(est - exact[lang]) <= max(2.0, 0.08 * exact[lang]), (lang, est, exact[lang])


def test_gk_bound_query_all_within(spark):
    rows = approx_quantiles_event_value(spark, SF_DIR).collect()
    # Every (event_type, percentile) cell asserted in bound, 3 per type.
    assert rows and all(r.within_bound for r in rows)
    by_type: dict[str, set[str]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, set()).add(r.p)
    assert all(ps == {"p50", "p90", "p99"} for ps in by_type.values())


def test_gk_estimate_within_rank_error(spark):
    got = {r.event_type: r.quantiles for r in approx_quantiles_estimate(spark, SF_DIR).collect()}
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    for etype, (p50, p90, p99) in got.items():
        vals = sorted(
            r.value for r in events.filter(F.col("event_type") == etype).select("value").collect()
        )
        n = len(vals)
        for frac, est in ((0.5, p50), (0.9, p90), (0.99, p99)):
            # GK guarantees rank error ≤ ε·n (ε=1e-4) — allow a couple ranks slack.
            target = int(frac * (n - 1))
            lo, hi = max(0, target - max(2, n // 1000)), min(n - 1, target + max(2, n // 1000))
            assert vals[lo] <= est <= vals[hi], (etype, frac, est, vals[lo], vals[hi])
