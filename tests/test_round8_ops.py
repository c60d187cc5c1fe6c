"""Round-8 operator contracts beyond the oracle gate: Misra-Gries merge
invariance under forced multi-batch execution, the moments-sketch closed form
pinned against independent Python integer arithmetic, RANSAC support counts
re-verified per candidate, and skip-gram window counts against a brute-force
token walk."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from songs_etl_spark.functions.text import tokens
from songs_etl_spark.plans.analytics import ransac_price_trend
from songs_etl_spark.plans.sketches import (
    _MG_K,
    _MOM_Z,
    _cf_coeffs,
    misra_gries_heavy_tokens,
    misra_gries_summaries,
    moments_sketch_quantiles,
)
from songs_etl_spark.plans.text import (
    _SG_MIN_COOC,
    _SG_WEIGHT_LCM,
    _SG_WINDOW,
    skipgram_window_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _token_counts(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .count()
        .collect()
    )
    return {r.token: r["count"] for r in rows}


@pytest.mark.parametrize("batch_rows", [37, 5000])
def test_mg_merge_bound_any_batching(spark, batch_rows):
    """The MG guarantee must hold regardless of how the stream is batched:
    force tiny Arrow batches (hundreds of summaries merged) and the default,
    and assert the deterministic envelope exact − n/(k+1) ≤ est ≤ exact for
    every summary entry, plus superset coverage of every true heavy hitter."""
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(batch_rows))
    try:
        tok = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select(F.explode(tokens("text")).alias("token"))
            .repartition(8)
        )
        merged = {
            r.token: r.mg_estimate
            for r in misra_gries_summaries(tok).collect()
        }
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)
    exact = _token_counts(spark, SF_DIR)
    n = sum(exact.values())
    kp1 = _MG_K + 1
    # Envelope on every surviving counter (exact integer arithmetic).
    for token, est in merged.items():
        assert est <= exact[token]
        assert est * kp1 >= exact[token] * kp1 - n
    # Superset: every true heavy hitter is present in the merged summary.
    for token, c in exact.items():
        if c * kp1 > n:
            assert token in merged, f"heavy hitter {token!r} missing"


def test_mg_registered_query_exact(spark):
    got = {
        r.token: (r.exact_count, r.within_bound)
        for r in misra_gries_heavy_tokens(spark, SF_DIR).collect()
    }
    exact = _token_counts(spark, SF_DIR)
    n = sum(exact.values())
    want = {t: c for t, c in exact.items() if c * (_MG_K + 1) > n}
    assert {t: c for t, (c, _) in got.items()} == want
    assert all(wb for _, wb in got.values())


def test_moments_closed_form_bit_exact(spark):
    """Independent twin of the oracle: exact integer power sums in Python,
    the identical double expression chain, floored micro-units — must match
    the query bit-for-bit."""
    pdf = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "value")
        .toPandas()
    )
    expect = {}
    for et, grp in pdf.groupby("event_type"):
        xs = [round(float(v) * 10000) for v in grp["value"]]  # exact ≤4-dec
        n = len(xs)
        s1, s2, s3, s4 = (sum(x**p for x in xs) for p in (1, 2, 3, 4))
        nd = float(n)
        m1, r2, r3, r4 = (float(s) / nd for s in (s1, s2, s3, s4))
        m2 = r2 - m1 * m1
        m3 = r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1
        m4 = r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2 - 3.0 * m1 * m1 * m1 * m1
        std = m2**0.5
        g1 = m3 / (m2 * m2**0.5)
        g2 = m4 / (m2 * m2) - 3.0
        row = {
            "n_events": n,
            "mean_micros": int(m1 * 100.0 // 1),
            "std_micros": int(std * 100.0 // 1),
            "skew_nano": int(g1 * 1000000000.0 // 1),
            "kurt_nano": int(g2 * 1000000000.0 // 1),
        }
        for tag, z in _MOM_Z.items():
            a, c1, c2, c3 = _cf_coeffs(z)
            w = a + c1 * g1 + c2 * g2 + c3 * g1 * g1
            row[f"{tag}_micros"] = int((m1 + std * w) * 100.0 // 1)
        expect[et] = row
    got = {r.event_type: r.asDict() for r in moments_sketch_quantiles(spark, SF_DIR).collect()}
    assert set(got) == set(expect)
    for et, row in expect.items():
        for col, val in row.items():
            assert got[et][col] == val, (et, col, got[et][col], val)


def test_ransac_supports_recounted(spark):
    """Re-verify each candidate's inlier support by re-deriving the sample
    deterministically and recounting with an independent filter; exactly one
    is_best row; NULL slope iff the candidate is vertical."""
    out = {r.cand_id: r for r in ransac_price_trend(spark, SF_DIR).collect()}
    assert len(out) == 8
    assert sum(1 for r in out.values() if r.is_best) == 1
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        (F.col("l_extendedprice").cast("decimal(18,4)") * 10000)
        .cast("bigint")
        .alias("p"),
        F.col("l_quantity").cast("bigint").alias("q"),
        F.md5(
            F.concat_ws(
                "#",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("hx"),
    )
    sample = [(r.p, r.q) for r in li.orderBy("hx", "p", "q").limit(16).collect()]
    rows = [(r.p, r.q) for r in li.collect()]
    tau = 2000 * 10000
    for cid in range(8):
        (p1, q1), (p2, q2) = sample[2 * cid], sample[2 * cid + 1]
        dp, dq = p2 - p1, q2 - q1
        if dq == 0:
            assert out[cid].slope_micros is None and out[cid].n_inliers == 0
            continue
        n_in = sum(
            1 for p, q in rows if abs(p * dq - p1 * dq - dp * (q - q1)) <= tau * abs(dq)
        )
        assert out[cid].n_inliers == n_in
        assert out[cid].slope_micros == math.floor(1000000.0 * dp / dq)


def test_skipgram_bruteforce(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(tokens("text").alias("tok"))
        .collect()
    )
    cnt: Counter = Counter()
    w60: Counter = Counter()
    for r in docs:
        tok = r.tok
        for i, a in enumerate(tok):
            for d in range(1, _SG_WINDOW + 1):
                if i + d >= len(tok):
                    break
                pair = (a, tok[i + d])
                cnt[pair] += 1
                w60[pair] += _SG_WEIGHT_LCM // d
    want = {
        pair: (c, w60[pair]) for pair, c in cnt.items() if c >= _SG_MIN_COOC
    }
    got = {
        (r.token_a, r.token_b): (r.n_cooc, r.w60)
        for r in skipgram_window_counts(spark, SF_DIR).collect()
    }
    assert got == want


def test_brier_decomposition_bruteforce(spark):
    """Recompute the Brier score and the quantized Murphy terms in Python
    from the collected per-document nano scores; the decomposition's
    defining inequalities must hold (reliability ≥ 0, resolution ≥ 0,
    resolution ≤ uncertainty + quantization slack)."""
    from songs_etl_spark.plans.analytics import (
        _logreg_feat,
        _logreg_fit,
        _logreg_p,
        quality_brier_decomposition,
    )
    from pyspark.sql import functions as F2

    out = quality_brier_decomposition(spark, SF_DIR).collect()
    assert len(out) == 1
    row = out[0]
    feat = _logreg_feat(spark, SF_DIR)
    w = _logreg_fit(feat)[-1]
    rows = feat.select(
        "y", F2.round(_logreg_p(w) * F2.lit(1e9)).cast("bigint").alias("p_nano")
    ).collect()
    n = len(rows)
    assert row.n_docs == n
    sb = sum((r.p_nano - r.y * 10**9) ** 2 for r in rows)
    assert abs(row.brier - sb / 1e18 / n) < 1e-12
    assert row.reliability >= 0.0 and row.resolution >= 0.0
    assert 0.0 <= row.uncertainty <= 0.25
    # floor-quantization slack: 1 nano-unit per bin mean, squared and scaled
    assert row.resolution <= row.uncertainty + 1e-9
