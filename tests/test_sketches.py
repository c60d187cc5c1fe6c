"""Accuracy contracts for the sketch aggregates (they have no SQL oracle):
HLL++ distinct counts within the configured rsd of exact; GK quantiles within
rank error of exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from songs_etl_spark.functions.text import tokens
from songs_etl_spark.plans.sketches import (
    approx_distinct_tokens,
    approx_quantiles_event_value,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hll_within_rsd(spark):
    approx = {r.lang: r.approx_vocab for r in approx_distinct_tokens(spark, SF_DIR).collect()}
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


def test_gk_quantiles_within_rank_error(spark):
    got = {r.event_type: r.quantiles for r in approx_quantiles_event_value(spark, SF_DIR).collect()}
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
