"""Round-11 operator contracts beyond the oracle gate: dense-rank NN-descent
seeding on gapped id spaces (round-10 verdict #5) and the composed beam
search over the NN-descent index (verdict #1)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from songs_etl_spark.plans.similarity import (
    _ND_K,
    _ND_SEED_A,
    _ND_SEED_B,
    _RANK_BUCKET,
    dense_rank_ids,
    nndescent_seed_edges,
)

SF_DIR = "/root/testdata/sf0.001"

#: A deliberately nasty id space: gaps, a mega-id at 10^9, and ids spread
#: across several 2^20 range buckets (including empty buckets in between) so
#: the bucketed rank computation's offset algebra is actually exercised.
GAPPED_IDS = [
    5,
    17,
    900,
    _RANK_BUCKET - 1,
    _RANK_BUCKET + 3,
    3 * _RANK_BUCKET + 7,
    3 * _RANK_BUCKET + 8,
    50_000_000,
    1_000_000_000,
    1_000_000_001,
]


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<double>"
    )


def _gapped_emb(spark):
    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    rows = [
        (vid, i % 3, unit(0.37 * i)) for i, vid in enumerate(sorted(GAPPED_IDS))
    ]
    return _emb_df(spark, rows)


def test_dense_rank_is_bijective_and_order_preserving(spark):
    """dense_rank_ids on a multi-bucket gapped id space: ranks are exactly
    0..N-1 (bijective) and sorted by id (order preserving), i.e. the
    bucket-offset + in-bucket-rank algebra equals the global row_number it
    replaces."""
    ids = spark.createDataFrame([(i,) for i in GAPPED_IDS], "vec_id bigint")
    got = {r.vec_id: r.r for r in dense_rank_ids(ids).collect()}
    want = {vid: i for i, vid in enumerate(sorted(GAPPED_IDS))}
    assert got == want


def test_seed_edges_full_coverage_on_gapped_ids(spark):
    """The verdict-#5 invariant: on a GAPPED id space every LCG seed target
    exists, so the seed-edge relation equals the closed-form rank-space
    prediction exactly — no silent drops (the round-10 id-space LCG lost
    every seed that landed in an id gap)."""
    emb = _gapped_emb(spark)
    n = len(GAPPED_IDS)
    by_rank = dict(enumerate(sorted(GAPPED_IDS)))
    rank_of = {v: r for r, v in by_rank.items()}
    expected = set()
    for vid in GAPPED_IDS:
        r = rank_of[vid]
        for j in range(1, _ND_K + 1):
            tr = (r * _ND_SEED_A + j * _ND_SEED_B) % n
            if by_rank[tr] != vid:
                expected.add((vid, by_rank[tr]))
    got = {(r.q, r.nb) for r in nndescent_seed_edges(emb).collect()}
    assert got == expected
    # every node participates as a source (full coverage, no drops)
    assert {q for q, _ in got} == set(GAPPED_IDS)


def test_seed_edges_value_identical_on_contiguous_ids(spark):
    """On contiguous 0..N-1 ids rank == id, so the dense-rank formulation
    must reproduce the round-10 id-space LCG edge set value-for-value
    (the recall contract's 'unchanged or better' guarantee)."""
    n = 12

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    emb = _emb_df(spark, [(i, i % 2, unit(0.5 * i)) for i in range(n)])
    got = {(r.q, r.nb) for r in nndescent_seed_edges(emb).collect()}
    expected = {
        (q, (q * _ND_SEED_A + j * _ND_SEED_B) % n)
        for q in range(n)
        for j in range(1, _ND_K + 1)
        if (q * _ND_SEED_A + j * _ND_SEED_B) % n != q
    }
    assert got == expected


def test_nndescent_connects_mega_id_on_gapped_space(spark):
    """End-to-end on the stress-corpus shape the verdict named: a node
    planted at id 10^9 in its own cell still gets cross-cell NN-descent
    edges (under id-space LCG seeding all its seeds landed in gaps and the
    per-cell init left a singleton cell stranded)."""
    from songs_etl_spark.plans.similarity import nndescent_edges

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    rows = [(i * 31 + 2, 0, unit(0.01 * i)) for i in range(8)]
    rows.append((1_000_000_000, 1, unit(0.002)))  # singleton cell, near theta=0
    emb = _emb_df(spark, rows)
    edges = {
        (r.query_id, r.neighbor_id)
        for r in nndescent_edges(emb, rounds=3).collect()
    }
    out_of_plant = {nb for (q, nb) in edges if q == 1_000_000_000}
    into_plant = {q for (q, nb) in edges if nb == 1_000_000_000}
    assert out_of_plant, "mega-id node has no out-edges"
    assert out_of_plant | into_plant, "mega-id node disconnected"


def test_composed_beam_search_recall_not_below_cell_index(spark):
    """The registered composed contract on real testdata: searching over the
    NN-descent index must not degrade recall vs the per-cell index (the
    NN-descent edge list per-node re-ranks a superset of the per-cell
    edges; the beam walk inherits that)."""
    from songs_etl_spark.plans.registry import REGISTRY

    row = REGISTRY["graph_ann_nnd_recall_vs_cell"].fn(spark, SF_DIR).collect()[0]
    assert row.recall_nnd_index >= row.recall_cell_index
    assert row.n_queries > 0
    assert 0.0 <= row.recall_cell_index <= 1.0
    assert 0.0 <= row.recall_nnd_index <= 1.0


def test_composed_beam_search_shape(spark):
    """ann_graph_beam_search_nnd emits ranked per-query top-k with dense
    ranks 1..k and no query node ever returned as its own neighbor."""
    from songs_etl_spark.plans.registry import REGISTRY

    df = REGISTRY["ann_graph_beam_search_nnd"].fn(spark, SF_DIR)
    rows = df.collect()
    assert rows
    per = {}
    for r in rows:
        assert r.neighbor_id >= 10  # candidates only, never a query node
        per.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)
        assert len(ranks) <= 3
