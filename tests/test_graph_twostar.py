"""Large-star/small-star connected components: agreement with plain
propagation on cluster-shaped graphs, and convergence on the long-chain
shapes propagation can't finish in bounded rounds."""

from __future__ import annotations

import pytest

from songs_etl_spark.operators.graph import (
    connected_components,
    connected_components_twostar,
)


def _labels(df):
    return {(r.id, r.component_id) for r in df.collect()}


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_matches_propagation_on_clusters(spark):
    # Two triangles plus a bridge pair: dense, small diameter.
    pairs = _edges(
        spark,
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
    )
    assert _labels(connected_components_twostar(pairs)) == _labels(
        connected_components(pairs)
    )


def test_long_chain_converges_in_log_rounds(spark):
    # A 200-vertex path has diameter 199: propagation with default budget
    # (20 rounds) must refuse; two-star finishes well inside its default.
    chain = _edges(spark, [(i, i + 1) for i in range(199)])
    got = _labels(connected_components_twostar(chain))
    assert got == {(i, 0) for i in range(200)}
    with pytest.raises(RuntimeError):
        connected_components(chain, max_iterations=20)


def test_self_loop_only_vertex_kept(spark):
    # A vertex appearing only as (x, x) must still get component_id = x —
    # the symmetrize step drops self-loop edges, but the vertex relation is
    # built from the raw pairs, so both variants agree on the contract.
    pairs = _edges(spark, [(1, 2), (7, 7)])
    expected = {(1, 1), (2, 1), (7, 7)}
    assert _labels(connected_components_twostar(pairs)) == expected
    assert _labels(connected_components(pairs)) == expected


def test_star_and_singleton_pair(spark):
    # A hub-and-spoke component and an isolated pair; min id labels both.
    pairs = _edges(spark, [(5, 100), (5, 101), (5, 102), (3, 5), (200, 201)])
    got = _labels(connected_components_twostar(pairs))
    assert got == {
        (3, 3),
        (5, 3),
        (100, 3),
        (101, 3),
        (102, 3),
        (200, 200),
        (201, 200),
    }
