"""Two-level (IVF) k-means assignment + SemDeDup-over-it invariants.

The flat Lloyd assignment (operators/clustering.kmeans_assign) is
oracle-verified against unrolled SQL; the two-level variant is the scale
path for k ∝ N and is pinned here by contract tests instead: every vector
assigned exactly once, bit-determinism across runs, and the SemDeDup
domination rule holding exactly (a vector is dropped iff a lower-id
same-cluster neighbor sits at cosine ≥ threshold — recomputed brute-force
on the test corpus).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from songs_etl_spark.operators.clustering import kmeans_assign_twolevel
from songs_etl_spark.plans._util import t
from songs_etl_spark.plans.similarity import (
    SEMDEDUP_THRESHOLD,
    semdedup_keep_from_assignment,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return t(spark, SF, "embeddings").persist()


@pytest.fixture(scope="module")
def assign(spark, emb):
    return (
        kmeans_assign_twolevel(emb, k=16, n_iter=2)
        .select("vec_id", "cluster", "dist")
        .persist()
    )


def test_every_vector_assigned_exactly_once(emb, assign):
    n = emb.count()
    assert assign.count() == n
    assert assign.select("vec_id").distinct().count() == n
    assert assign.filter(F.col("cluster").isNull() | F.col("dist").isNull()).count() == 0


def test_assignment_deterministic_across_runs(emb, assign):
    again = kmeans_assign_twolevel(emb, k=16, n_iter=2).select(
        "vec_id", "cluster", "dist"
    )
    assert assign.exceptAll(again).count() == 0
    assert again.exceptAll(assign).count() == 0


def test_cluster_count_in_two_level_range(assign):
    # k=16 requested -> k_c=4 coarse cells x up to k_f=4 subs (+1 fallback
    # slot per cell). Cells can lose subs but the partition must be
    # non-trivial and bounded.
    n_clusters = assign.select("cluster").distinct().count()
    assert 2 <= n_clusters <= 4 * 5


def test_semdedup_domination_rule_exact(spark, emb, assign):
    out = semdedup_keep_from_assignment(emb, assign.select("vec_id", "cluster"))
    got = {r["vec_id"]: r["keep"] for r in out.collect()}

    vecs = {
        r["vec_id"]: (r["cluster"], [float(x) for x in r["embedding"]])
        for r in assign.join(emb, "vec_id").select("vec_id", "cluster", "embedding").collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    ids = sorted(vecs)
    expected_drop = set()
    for i, vid in enumerate(ids):
        ci, vi = vecs[vid]
        for wid in ids[:i]:
            cj, vj = vecs[wid]
            if ci == cj and round(cos(vi, vj), 6) >= SEMDEDUP_THRESHOLD:
                expected_drop.add(vid)
                break

    assert set(got) == set(vecs)
    mism = [v for v in got if got[v] != (v not in expected_drop)]
    assert not mism, f"keep/drop mismatch on {len(mism)} ids: {mism[:5]}"


def test_pair_block_decomposition_invariant(spark, emb, assign, monkeypatch):
    """The skew-proof block-pair split of the domination stage must be
    invisible in the output: forcing tiny blocks (so every cluster crosses
    the intra/cross-block seam) yields exactly the default result."""
    from songs_etl_spark.plans import similarity as sim

    base = sorted(
        map(tuple, sim.semdedup_keep_from_assignment(emb, assign.select("vec_id", "cluster")).collect())
    )
    monkeypatch.setattr(sim, "_PAIR_BLOCK", 4)
    small = sorted(
        map(tuple, sim.semdedup_keep_from_assignment(emb, assign.select("vec_id", "cluster")).collect())
    )
    assert small == base
