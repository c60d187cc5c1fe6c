"""Round-10 operator contracts beyond the oracle gate: suffix-granularity
exact substring dedup pinned against planted repeats (maximal extent, exact
positions, sub-threshold silence, within-doc repeats)."""

from __future__ import annotations

from pyspark.sql import functions as F

from songs_etl_spark.plans.dedup import SA_MIN_LEN, exact_substring_runs

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        [(i, t) for i, t in sorted(texts.items())], "doc_id bigint, text string"
    )


def _toks(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_repeat_exact_extent_and_positions(spark):
    """A 20-token substring shared by two docs at different offsets comes
    back as ONE run with match_len exactly 20 and the exact 0-based token
    positions — not fragmented into 12-token windows."""
    shared = _toks("dup", 20)
    docs = _docs(
        spark,
        {
            1: _toks("a", 3) + " " + shared + " " + _toks("b", 5),
            2: _toks("c", 7) + " " + shared + " " + _toks("d", 2),
            3: _toks("e", 40),  # no repeats anywhere
        },
    )
    rows = exact_substring_runs(docs, SA_MIN_LEN).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.pos_a, r.doc_b, r.pos_b) == (1, 3, 2, 7)
    assert r.match_len == 20


def test_sub_threshold_repeat_is_silent(spark):
    """A shared run of min_len - 1 tokens must not be reported."""
    shared = _toks("dup", SA_MIN_LEN - 1)
    docs = _docs(
        spark,
        {
            1: _toks("a", 4) + " " + shared,
            2: shared + " " + _toks("b", 4),
        },
    )
    assert exact_substring_runs(docs, SA_MIN_LEN).count() == 0


def test_exact_threshold_repeat_is_found(spark):
    shared = _toks("dup", SA_MIN_LEN)
    docs = _docs(spark, {1: shared + " " + _toks("a", 3), 2: _toks("b", 2) + " " + shared})
    rows = exact_substring_runs(docs, SA_MIN_LEN).collect()
    assert len(rows) == 1
    assert rows[0].match_len == SA_MIN_LEN


def test_within_doc_repeat_reported(spark):
    """Self-repetition (the same doc containing the substring twice) is a
    real curation signal and must surface with doc_a == doc_b."""
    shared = _toks("dup", 15)
    docs = _docs(spark, {7: shared + " " + _toks("x", 4) + " " + shared})
    rows = exact_substring_runs(docs, SA_MIN_LEN).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.doc_a == 7 and r.doc_b == 7
    assert (r.pos_a, r.pos_b) == (0, 19)
    assert r.match_len == 15


def test_three_way_repeat_chain_covers_all_docs(spark):
    """k occurrences pair as a (k-1)-link chain in (doc_id, pos) order —
    linear in occurrences, and every occurrence appears in some pair."""
    shared = _toks("dup", 13)
    docs = _docs(
        spark,
        {
            1: shared,
            2: _toks("p", 1) + " " + shared,
            3: _toks("q", 2) + " " + shared,
        },
    )
    rows = exact_substring_runs(docs, SA_MIN_LEN).collect()
    assert len(rows) == 2
    chain = sorted((r.doc_a, r.doc_b) for r in rows)
    assert chain == [(1, 2), (2, 3)]
    assert all(r.match_len == 13 for r in rows)


# ---------------------------------------------------------------------------
# NN-descent kNN-graph construction
# ---------------------------------------------------------------------------


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<double>"
    )


def test_nndescent_finds_cross_cell_neighbor(spark):
    """Two near-identical vectors placed in DIFFERENT cells: the per-cell
    build cannot connect them by construction; NN-descent must."""
    import math

    from songs_etl_spark.plans.similarity import (
        knn_topk_within_cells,
        nndescent_edges,
    )

    def unit(theta):
        return [math.cos(theta), math.sin(theta)] + [0.0] * 6

    rows = []
    # cell 0: vectors 0..9 fanned around theta=0; cell 1: 10..19 around pi/2
    for i in range(10):
        rows.append((i, 0, unit(0.02 * i)))
    for i in range(10):
        rows.append((10 + i, 1, unit(math.pi / 2 + 0.02 * i)))
    # the plant: 20 sits in cell 1 but points at theta=0 — its true
    # neighbors are all in cell 0
    rows.append((20, 1, unit(0.001)))
    emb = _emb_df(spark, rows)

    cell_edges = {
        (r.query_id, r.neighbor_id)
        for r in knn_topk_within_cells(
            emb.select("vec_id", F.col("label").alias("cell"), "embedding")
        ).collect()
    }
    # per-cell: 20's neighbors are all from cell 1 (ids 10..19) — blind
    assert all(10 <= nb <= 19 for (q, nb) in cell_edges if q == 20)

    nd_edges = {
        (r.query_id, r.neighbor_id)
        for r in nndescent_edges(emb, rounds=3).collect()
    }
    nd_for_plant = {nb for (q, nb) in nd_edges if q == 20}
    assert nd_for_plant & set(range(10)), nd_for_plant  # crossed the wall


def test_nndescent_recall_never_below_cell_build(spark):
    """The registered contract query on real testdata: monotone superset
    ranking makes recall_nndescent >= recall_cell structurally; assert the
    measured numbers agree."""
    from songs_etl_spark.plans.registry import REGISTRY

    row = REGISTRY["nndescent_recall_vs_exact"].fn(spark, SF_DIR).collect()[0]
    assert row.recall_nndescent >= row.recall_cell
    assert row.n_probes > 0
    assert 0.0 <= row.recall_cell <= 1.0 and 0.0 <= row.recall_nndescent <= 1.0


def test_nndescent_degree_bounded(spark):
    """Every node keeps at most K out-edges, ranked 1..K without gaps."""
    from songs_etl_spark.plans.registry import REGISTRY
    from songs_etl_spark.plans.similarity import _ND_K

    df = REGISTRY["knn_graph_nndescent"].fn(spark, SF_DIR)
    per = df.groupBy("query_id").agg(
        F.count("*").alias("d"), F.max("rank").alias("mx"), F.min("rank").alias("mn")
    )
    bad = per.filter(
        (F.col("d") > _ND_K) | (F.col("mx") != F.col("d")) | (F.col("mn") != 1)
    )
    assert bad.count() == 0


# ---------------------------------------------------------------------------
# Louvain one level
# ---------------------------------------------------------------------------


def test_louvain_q_never_decreases_and_moves_happen(spark):
    """The registered contract on real testdata: the group-prefix sweep is
    monotone BY CONSTRUCTION (disjoint groups, positive lower bounds);
    assert the measured row agrees and that the sweep actually moved nodes
    at a scale where proposals exist."""
    from songs_etl_spark.plans.registry import REGISTRY

    row = REGISTRY["louvain_one_level"].fn(spark, "/root/testdata/sf0.01").collect()[0]
    assert row.improved
    assert row.q_after >= row.q_before
    assert row.n_moved > 0 and row.n_moved <= row.n_proposed
    # the sweep must be a real optimization, not a no-op: measured ~+47%
    assert row.q_after > row.q_before


# ---------------------------------------------------------------------------
# k-means|| scalable seeding
# ---------------------------------------------------------------------------


def test_kmpp_seeding_deterministic_and_distinct(spark):
    from songs_etl_spark.plans.registry import REGISTRY

    a = REGISTRY["kmeans_scalable_seeding"].fn(spark, SF_DIR).collect()
    b = REGISTRY["kmeans_scalable_seeding"].fn(spark, SF_DIR).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    ids = [r.vec_id for r in a]
    assert len(ids) == len(set(ids)) == 8
    assert [r.seed_order for r in a] == list(range(1, 9))
    assert all(r.weight >= 1 for r in a)  # every candidate votes for itself


def test_kmpp_seeds_feed_lloyd_and_cut_distortion(spark):
    """Wire the k-means|| seeds into the existing Lloyd machinery
    (train_centroids(seed_ids=...)) and compare final distortion against
    the first-k-by-id policy: the spread seeds should never be worse on
    the clustered embeddings corpus."""
    from songs_etl_spark.operators.clustering import kmeans_assign
    from songs_etl_spark.plans.registry import REGISTRY
    from songs_etl_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    seeds = [
        r.vec_id
        for r in REGISTRY["kmeans_scalable_seeding"].fn(spark, SF_DIR).collect()
    ]
    a_kmpp = kmeans_assign(emb, k=8, n_iter=3, seed_ids=seeds)
    a_first = kmeans_assign(emb, k=8, n_iter=3)
    phi_kmpp = a_kmpp.agg(F.sum("dist")).collect()[0][0]
    phi_first = a_first.agg(F.sum("dist")).collect()[0][0]
    assert a_kmpp.count() == emb.count()
    assert phi_kmpp <= phi_first, (phi_kmpp, phi_first)
    # determinism of the seeded pipeline
    again = kmeans_assign(emb, k=8, n_iter=3, seed_ids=seeds)
    assert sorted(map(tuple, a_kmpp.collect())) == sorted(map(tuple, again.collect()))


# ---------------------------------------------------------------------------
# DP-noised release
# ---------------------------------------------------------------------------


def test_dp_release_noise_is_laplace_shaped_and_bounded(spark):
    """The released counts differ from the truth by seeded Laplace noise:
    nonzero for almost every brand, centered (mixed signs), and bounded by
    the inverse-CDF tail at the 48-bit uniform's extremes (b*ln(2^47))."""
    import math

    from songs_etl_spark.plans.registry import REGISTRY
    from songs_etl_spark.sources.catalog import load_table

    released = {
        r.brand: (r.noisy_count, r.epsilon)
        for r in REGISTRY["dp_noisy_brand_counts"].fn(spark, SF_DIR).collect()
    }
    truth = {
        r.brand: r.n
        for r in load_table(spark, SF_DIR, "part")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(released) == set(truth)
    diffs = [released[b][0] - truth[b] for b in truth]
    assert all(eps == 1.0 for _, eps in released.values())
    assert any(d > 0 for d in diffs) and any(d < 0 for d in diffs)
    bound = math.log(2.0**48) + 1
    assert all(abs(d) <= bound for d in diffs)
    # reproducible: the seeded release is the same on every run
    again = {
        r.brand: r.noisy_count
        for r in REGISTRY["dp_noisy_brand_counts"].fn(spark, SF_DIR).collect()
    }
    assert again == {b: v for b, (v, _) in released.items()}


def test_excision_cuts_later_copy_only(spark):
    """All-but-one policy: the (doc_id, pos)-earlier occurrence survives,
    the successor is cut; merged intervals count tokens exactly."""
    from songs_etl_spark.plans.dedup import exact_substring_runs

    shared = _toks("dup", 20)
    docs = _docs(
        spark,
        {
            1: _toks("a", 3) + " " + shared,          # earlier in (doc, pos)
            2: _toks("c", 2) + " " + shared + " " + _toks("d", 4),
        },
    )
    # derive the same rollup the registered query applies
    from songs_etl_spark.plans.registry import REGISTRY  # noqa: F401
    runs = exact_substring_runs(docs).collect()
    assert len(runs) == 1 and runs[0].doc_b == 2
    # registered query shape on real testdata: totals reconcile
    df = REGISTRY["dedup_substring_excision"].fn(spark, SF_DIR)
    bad = df.filter(
        (F.col("tokens_cut") < 0)
        | (F.col("tokens_cut") > F.col("tokens_total"))
        | ((F.col("n_cut_spans") == 0) & (F.col("tokens_cut") != 0))
    )
    assert bad.count() == 0
