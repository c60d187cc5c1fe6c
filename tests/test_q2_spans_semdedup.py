"""Hand-computed oracles for the round-3 additions: the TPC-H Q2 analog
(min-cost supplier), corpus-level duplicate-span stats (Lee et al. 2022
exact-substring dedup), and SemDeDup (within-cluster semantic near-dup)."""

from __future__ import annotations

import datetime
import math

import pytest

from songs_etl_spark.plans import REGISTRY

# ---------------------------------------------------------------------------
# min_cost_supplier_q2
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def q2_dir(spark, tmp_path_factory):
    """Tiny star-schema warehouse where the min-cost winner is hand-derivable:
    part 10 is the only (size=15, PROMO) part; supplier 2 undercuts supplier 1
    in EUROPE; supplier 3 is cheaper still but sits in ASIA (excluded)."""
    d = tmp_path_factory.mktemp("q2")

    def w(name, rows, schema):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
            str(d / f"{name}.parquet")
        )

    w("region", [(0, "EUROPE"), (1, "ASIA")], "r_regionkey int, r_name string")
    w(
        "nation",
        [(0, "N_EU", 0), (1, "N_AS", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    w(
        "supplier",
        [(1, "S1", 0, 100.0), (2, "S2", 0, 200.0), (3, "S3", 1, 300.0)],
        "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    )
    w(
        "part",
        [
            (10, "promo part", "B#1", "PROMO", 15, 1.0),
            (11, "wrong size", "B#1", "PROMO", 20, 1.0),
        ],
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    ship = datetime.datetime(1997, 1, 1)
    li_rows = [
        # (orderkey, partkey, suppkey, line, qty, extprice, disc, tax, rf, ls, ship)
        (1, 10, 1, 1, 2.0, 20.0, 0.0, 0.0, "N", "O", ship),  # unit 10.0
        (2, 10, 1, 1, 4.0, 32.0, 0.0, 0.0, "N", "O", ship),  # unit  8.0 → S1 min
        (3, 10, 2, 1, 5.0, 30.0, 0.0, 0.0, "N", "O", ship),  # unit  6.0 → S2 min (winner)
        (4, 10, 3, 1, 1.0, 2.0, 0.0, 0.0, "N", "O", ship),  # unit  2.0 but ASIA
        (5, 11, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship),  # wrong part
    ]
    w(
        "lineitem",
        li_rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
        " l_returnflag string, l_linestatus string, l_shipdate timestamp_ntz",
    )
    return str(d)


def test_q2_picks_regional_min_cost_supplier(spark, q2_dir):
    rows = REGISTRY["min_cost_supplier_q2"].fn(spark, q2_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.s_name, r.p_partkey, r.supply_cost, r.s_acctbal) == ("S2", 10, 6.0, 200.0)


# ---------------------------------------------------------------------------
# dedup_duplicate_spans
# ---------------------------------------------------------------------------

A = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"  # 12 tokens
# B shares exactly one 8-token window with A (A's tokens 2..9).
B = "gamma delta epsilon zeta eta theta iota kappa nu xi"  # 10 tokens
C = "one two three four five six seven eight nine ten"  # unique, 10 tokens
D = "short text here now"  # < 8 tokens → no spans


@pytest.fixture(scope="module")
def span_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("spans")
    rows = [(0, A, len(A)), (1, B, len(B)), (2, C, len(C)), (3, D, len(D))]
    spark.createDataFrame(rows, "doc_id bigint, text string, n_chars bigint").coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_duplicate_spans_hand_counts(spark, span_dir):
    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_ratio)
        for r in REGISTRY["dedup_duplicate_spans"].fn(spark, span_dir).collect()
    }
    assert got[0] == (5, 1, 0.2)  # 12 tokens → 5 spans; one matches B's first window
    assert got[1][:2] == (3, 1) and math.isclose(got[1][2], 1 / 3, rel_tol=1e-12)
    assert got[2] == (3, 0, 0.0)
    assert got[3] == (0, 0, None)


# ---------------------------------------------------------------------------
# semantic_dedup
# ---------------------------------------------------------------------------


def test_semantic_dedup_drops_planted_within_cluster_dup(spark, tmp_path_factory):
    """Vectors 0 and 10 are identical (cosine 1): k-means puts them in one
    cluster, so SemDeDup keeps the lower id and drops the higher; everything
    else is mutually below the 0.4 threshold and survives."""
    d = tmp_path_factory.mktemp("semded")
    rows = [
        (0, 0, [1.0, 0.0, 0.0, 0.0]),
        (10, 0, [1.0, 0.0, 0.0, 0.0]),  # exact dup of 0
        (12, 1, [0.0, 1.0, 0.0, 0.0]),
        (13, 1, [-1.0, 0.0, 0.0, 0.0]),
        (14, 2, [0.0, 0.0, 1.0, 0.0]),
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, label bigint, embedding array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    out = {r.vec_id: r.keep for r in REGISTRY["semantic_dedup"].fn(spark, str(d)).collect()}
    assert out == {0: True, 10: False, 12: True, 13: True, 14: True}
