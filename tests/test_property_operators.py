"""Property-based invariants (hypothesis) for the custom join/merge/graph
operators: each is compared against an independent specification (a naive
Python computation or the plain Spark operator it restates) on randomized
inputs — the operator-algebra complement to the oracle gate's fixed data."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from songs_etl_spark.operators.graph import (
    connected_components,
    connected_components_twostar,
)
from songs_etl_spark.operators.merge import merge_upsert
from songs_etl_spark.operators.skew import salted_join
from songs_etl_spark.operators.temporal import asof_join

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

key = st.integers(min_value=0, max_value=3)
ts = st.integers(min_value=0, max_value=20)


@given(
    lefts=st.lists(st.tuples(key, ts), min_size=1, max_size=12),
    rights=st.lists(st.tuples(key, ts), min_size=0, max_size=12),
)
@settings(**SETTINGS)
def test_asof_join_matches_naive_spec(spark, lefts, rights):
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], "k bigint, ts bigint, lid bigint"
    )
    right = spark.createDataFrame(
        [(k, t, 100 + i) for i, (k, t) in enumerate(rights)],
        "k bigint, ts bigint, rid bigint",
    )
    got = {
        (r.lid, r.asof_rid)
        for r in asof_join(
            left, right, partition_cols=["k"], ts_col="ts", payload_cols=["rid"]
        ).collect()
    }
    want = set()
    for i, (k, t) in enumerate(lefts):
        # Latest right row with same key and ts <= t; max rid breaks ts ties
        # (mirrors the operator's deterministic last-wins-within-ordering).
        candidates = [
            (rt, 100 + j) for j, (rk, rt) in enumerate(rights) if rk == k and rt <= t
        ]
        want.add((i, max(candidates)[1] if candidates else None))
    assert got == want


@given(
    lefts=st.lists(st.tuples(key, st.integers(0, 9)), min_size=1, max_size=15),
    rights=st.lists(st.tuples(key, st.integers(0, 9)), min_size=0, max_size=6),
)
@settings(**SETTINGS)
def test_salted_join_equals_plain_join(spark, lefts, rights):
    left = spark.createDataFrame(lefts, "k bigint, lv bigint")
    right = spark.createDataFrame(rights, "k bigint, rv bigint")
    plain = sorted(
        (r.k, r.lv, r.rv) for r in left.join(right, ["k"], "inner").collect()
    )
    salted = sorted(
        (r.k, r.lv, r.rv)
        for r in salted_join(left, right, ["k"], n_salts=4, how="inner").collect()
    )
    assert salted == plain


@given(
    base=st.lists(st.tuples(key, st.integers(0, 9)), min_size=1, max_size=8),
    upd=st.lists(st.tuples(key, st.integers(10, 19)), min_size=0, max_size=8),
)
@settings(**SETTINGS)
def test_merge_upsert_idempotent_and_total(spark, base, upd):
    # One row per key on each side (merge contract: updates keyed uniquely).
    tgt = spark.createDataFrame(
        list({k: (k, v) for k, v in base}.values()), "k bigint, v bigint"
    )
    ups = spark.createDataFrame(
        list({k: (k, v) for k, v in upd}.values()), "k bigint, v bigint"
    )
    if ups.count() == 0:
        return
    once = {(r.k, r.v) for r in merge_upsert(tgt, ups, ["k"]).collect()}
    twice = {
        (r.k, r.v)
        for r in merge_upsert(
            spark.createDataFrame(sorted(once), "k bigint, v bigint"), ups, ["k"]
        ).collect()
    }
    assert twice == once  # idempotent under replay
    upd_map = {k: v for k, v in ups.collect()}
    for k, v in once:
        assert v == upd_map.get(k, dict(tgt.collect()).get(k))
    assert {k for k, _ in once} == {r.k for r in tgt.collect()} | set(upd_map)


@given(edges=st.lists(st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=1, max_size=15))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
def test_twostar_equals_propagation(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    prop = {(r.id, r.component_id) for r in connected_components(df).collect()}
    two = {(r.id, r.component_id) for r in connected_components_twostar(df).collect()}
    assert two == prop
