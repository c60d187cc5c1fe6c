"""Round-9 second-wave operator contracts beyond the oracle gate:
Count-Sketch median estimator vs a brute-force Python sketch, conformal
order-statistic + coverage invariants, Allen classification vs a pair loop,
graph-beam-search sanity, and modularity vs a hand computation."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from songs_etl_spark.plans.analytics import conformal_price_interval
from songs_etl_spark.plans.graphs import (
    label_propagation_communities,
    modularity_lpa_communities,
)
from songs_etl_spark.plans.ranges import interval_allen_relations
from songs_etl_spark.plans.similarity import (
    _GB_K,
    ann_graph_beam_search,
    graph_ann_recall_vs_exact,
)
from songs_etl_spark.plans.sketches import _CS_D, _CS_W, count_sketch

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Count-Sketch: the distributed sketch equals a brute-force Python sketch
# ---------------------------------------------------------------------------


def _py_cs_cell(token: str, seed: int) -> tuple[int, int]:
    h = hashlib.md5(f"cs{seed}:{token}".encode()).hexdigest()
    return int(h[:8], 16) % _CS_W, 1 if int(h[8], 16) % 2 == 0 else -1


def test_count_sketch_matches_python_reference(spark):
    toks = ["alpha", "beta", "gamma", "alpha", "alpha", "beta", "delta"] * 9
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    got = {
        (r["seed"], r["bucket"]): r["cell_sum"]
        for r in count_sketch(df).collect()
    }
    want: dict[tuple[int, int], int] = {}
    for t in toks:
        for s in range(_CS_D):
            b, g = _py_cs_cell(t, s)
            want[(s, b)] = want.get((s, b), 0) + g
    want = {k: v for k, v in want.items() if v != 0 or k in got}
    assert got == {k: v for k, v in want.items()}
    # and the median point-query recovers exact counts when no collisions
    exact = Counter(toks)
    for t, c in exact.items():
        ests = []
        for s in range(_CS_D):
            b, g = _py_cs_cell(t, s)
            ests.append(g * got.get((s, b), 0))
        est = sorted(ests)[_CS_D // 2]
        # tiny vocabulary: collisions possible but the median tolerates
        # a minority of corrupted rows — with 4 tokens in 512 buckets all
        # five rows are collision-free, so the estimate is exact
        assert est == c


# ---------------------------------------------------------------------------
# Conformal: rank formula, qhat membership, guarantee-side coverage
# ---------------------------------------------------------------------------


def test_conformal_invariants(spark):
    row = conformal_price_interval(spark, SF_DIR).collect()[0]
    assert row["n_train"] > 0 and row["n_cal"] > 0 and row["n_test"] > 0
    assert row["k_rank"] == (9 * (row["n_cal"] + 1) + 9) // 10
    assert row["qhat"] >= 0.0
    # finite-sample guarantee is >= 0.9 in EXPECTATION over splits; a single
    # fixed split concentrates tightly for n_test in the hundreds — use a
    # slack check that still catches an off-by-one rank or a broken score
    assert row["coverage"] >= 0.85
    assert row["coverage"] <= 1.0


# ---------------------------------------------------------------------------
# Allen relations: classification counts match a brute-force pair loop
# ---------------------------------------------------------------------------


def _allen(s0, s1, c0, c1):
    if s1 == c0 and s0 < c0:
        return "meets"
    if s0 == c1 and s1 > c1:
        return "met_by"
    if s0 == c0 and s1 == c1:
        return "equals"
    if s0 == c0 and s1 < c1:
        return "starts"
    if s0 == c0 and s1 > c1:
        return "started_by"
    if s1 == c1 and s0 > c0:
        return "finishes"
    if s1 == c1 and s0 < c0:
        return "finished_by"
    if s0 > c0 and s1 < c1:
        return "during"
    if s0 < c0 and s1 > c1:
        return "contains"
    if s0 < c0:
        return "overlaps"
    return "overlapped_by"


def test_allen_matches_bruteforce(spark):
    from songs_etl_spark.plans.ranges import _campaign_relation, _session_intervals

    got = {
        (r["channel"], r["relation"]): r["n_pairs"]
        for r in interval_allen_relations(spark, SF_DIR).collect()
    }
    sessions = [(r["s0"], r["s1"]) for r in _session_intervals(spark, SF_DIR).collect()]
    campaigns = [
        (r["channel"], r["c0"], r["c1"]) for r in _campaign_relation(spark).collect()
    ]
    want: dict[tuple[str, str], int] = {}
    for ch, c0, c1 in campaigns:
        for s0, s1 in sessions:
            if s0 <= c1 and s1 >= c0:
                k = (ch, _allen(s0, s1, c0, c1))
                want[k] = want.get(k, 0) + 1
    assert got == want


# ---------------------------------------------------------------------------
# Graph beam search: structural sanity + recall-row consistency
# ---------------------------------------------------------------------------


def test_beam_search_output_shape(spark):
    rows = ann_graph_beam_search(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(10))  # all 10 queries answered
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, _GB_K + 1))
        cos = [r["cos_sim"] for r in rs]
        assert cos == sorted(cos, reverse=True)  # ranked by similarity
        assert all(r["neighbor_id"] >= 10 for r in rs)  # never a query vector


def test_graph_recall_row_consistent(spark):
    r = graph_ann_recall_vs_exact(spark, SF_DIR).collect()[0]
    assert r["n_exact"] == r["n_queries"] * _GB_K
    assert r["n_graph"] == r["n_queries"] * _GB_K
    assert 0 <= r["n_matched"] <= r["n_exact"]
    assert r["recall_at_3"] == pytest.approx(r["n_matched"] / r["n_exact"])


# ---------------------------------------------------------------------------
# Modularity: Q recomputed by hand from the labels + edge list
# ---------------------------------------------------------------------------


def test_modularity_matches_hand_computation(spark):
    row = modularity_lpa_communities(spark, SF_DIR).collect()[0]
    labels = {
        r["part_key"]: r["community"]
        for r in label_propagation_communities(spark, SF_DIR).collect()
    }
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    und = [
        (r["u"], r["v"])
        for r in a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .collect()
    ]
    m = len(und)
    deg: dict[int, int] = {}
    e_in: dict[int, int] = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
        if labels[u] == labels[v]:
            e_in[labels[u]] = e_in.get(labels[u], 0) + 1
    d_c: dict[int, int] = {}
    for node, lab in labels.items():
        d_c[lab] = d_c.get(lab, 0) + deg[node]
    num = sum(4 * m * e_in.get(c, 0) - dc * dc for c, dc in d_c.items())
    assert row["n_edges"] == m
    assert row["n_nodes"] == len(labels)
    assert row["n_communities"] == len(d_c)
    assert row["q_modularity"] == pytest.approx(num / (4 * m * m), abs=0, rel=0)


# ---------------------------------------------------------------------------
# Isotonic calibration: monotone, and equal to a sequential PAVA reference
# ---------------------------------------------------------------------------


def _py_pava(pairs: list[tuple[int, int]]) -> list[float]:
    """Classic sequential pool-adjacent-violators over (n, sum_y) bins in
    score-ascending order — the independent reference for the minimax
    formulation. Violator test is exact (cross-multiplied integers)."""
    members = [[k] for k in range(len(pairs))]
    blocks = [[n, sy] for n, sy in pairs]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][1] * blocks[i + 1][0] > blocks[i + 1][1] * blocks[i][0]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            members[i].extend(members[i + 1])
            del blocks[i + 1]
            del members[i + 1]
            if i > 0:
                i -= 1
        else:
            i += 1
    rates = [0.0] * len(pairs)
    for (n, sy), mem in zip(blocks, members):
        for k in mem:
            rates[k] = sy / n
    return rates


def test_isotonic_matches_sequential_pava(spark):
    from songs_etl_spark.plans.analytics import isotonic_calibration

    rows = sorted(
        isotonic_calibration(spark, SF_DIR).collect(),
        key=lambda r: -r["bin"],  # score-ascending order
    )
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso)  # monotone non-decreasing in score
    pairs = [(r["n"], round(r["raw_rate"] * r["n"])) for r in rows]
    want = _py_pava([(n, int(sy)) for n, sy in pairs])
    assert iso == pytest.approx(want, rel=0, abs=1e-12)
