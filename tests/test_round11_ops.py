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


# ---------------------------------------------------------------------------
# Multi-level Louvain
# ---------------------------------------------------------------------------


def test_louvain_levels_monotone_with_movers(spark):
    """At sf0.01 (real community structure): coarsening happens (n_super <
    n_nodes), level-1 movers exist, and Q is monotone LPA -> level1 ->
    level2 — the structural guarantee, measured."""
    from songs_etl_spark.plans.registry import REGISTRY

    row = REGISTRY["louvain_levels"].fn(spark, "/root/testdata/sf0.01").collect()[0]
    assert row.monotone
    assert row.q_lpa <= row.q_level1 <= row.q_level2
    assert row.n_moved_level1 > 0
    assert 0 < row.n_super < row.n_nodes


# ---------------------------------------------------------------------------
# Excision apply
# ---------------------------------------------------------------------------


def _apply_kept(spark, docs_df):
    """Run the apply pipeline on an arbitrary docs relation (mirrors the
    registered query body, parameterized for fixtures)."""
    from pyspark.sql.window import Window as W

    from songs_etl_spark.functions.text import tokens
    from songs_etl_spark.plans.dedup import SA_MIN_LEN, exact_substring_runs

    runs = exact_substring_runs(docs_df, SA_MIN_LEN)
    cuts = runs.select(
        F.col("doc_b").alias("doc_id"),
        F.col("pos_b").alias("s"),
        (F.col("pos_b") + F.col("match_len")).alias("e"),
    )
    wo = W.partitionBy("doc_id").orderBy("s", "e").rowsBetween(W.unboundedPreceding, -1)
    wi = W.partitionBy("doc_id").orderBy("s", "e").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    isl = cuts.withColumn("prev_max", F.max("e").over(wo)).withColumn(
        "isle",
        F.sum(
            F.when(F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max")), 1)
            .otherwise(0)
        ).over(wi),
    )
    merged = isl.groupBy("doc_id", "isle").agg(F.min("s").alias("s"), F.max("e").alias("e"))
    wl = W.partitionBy("doc_id").orderBy("s", "e")
    before = merged.select(
        "doc_id",
        F.coalesce(F.lag("e").over(wl), F.lit(0)).alias("ks"),
        F.col("s").alias("ke"),
    )
    mx = merged.groupBy("doc_id").agg(F.max("e").alias("mx_e"))
    tokd = docs_df.select("doc_id", tokens("text").alias("tok"))
    tails = tokd.join(mx, "doc_id", "left").select(
        "doc_id", F.coalesce("mx_e", F.lit(0)).alias("ks"), F.size("tok").alias("ke")
    )
    kept = before.unionByName(tails).filter(F.col("ks") < F.col("ke"))
    return kept.join(tokd, "doc_id").select(
        "doc_id",
        "ks",
        "ke",
        F.concat_ws(
            " ", F.slice("tok", F.col("ks") + 1, F.col("ke") - F.col("ks"))
        ).alias("kept_text"),
    )


def test_excision_apply_cuts_later_copy_and_keeps_rest(spark):
    """A 20-token span shared by two docs: doc 2 (later occurrence) loses
    exactly the span; doc 1 is untouched; surrounding text survives."""
    from songs_etl_spark.plans.dedup import SA_MIN_LEN  # noqa: F401

    def toks(prefix, n):
        return " ".join(f"{prefix}{i}" for i in range(n))

    shared = toks("dup", 20)
    d1 = toks("a", 3) + " " + shared + " " + toks("b", 5)
    d2 = toks("c", 7) + " " + shared + " " + toks("d", 2)
    docs = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id bigint, text string"
    )
    rows = {(r.doc_id, r.ks, r.ke): r.kept_text for r in _apply_kept(spark, docs).collect()}
    # doc 1 intact: one run covering everything
    assert rows[(1, 0, 28)] == d1
    # doc 2: head [0,7) and tail [27,29) kept, span [7,27) cut
    assert rows[(2, 0, 7)] == toks("c", 7)
    assert rows[(2, 27, 29)] == toks("d", 2)
    assert len([k for k in rows if k[0] == 2]) == 2


def test_excision_apply_rerun_detection_is_clean(spark):
    """The Lee-et-al property: re-running detection on the cleaned corpus
    (each kept run as its own segment) finds NO shared run >= L — the
    all-but-one policy leaves one occurrence globally."""
    from songs_etl_spark.plans.dedup import SA_MIN_LEN, exact_substring_runs

    def toks(prefix, n):
        return " ".join(f"{prefix}{i}" for i in range(n))

    shared = toks("dup", 25)
    other = toks("rep", SA_MIN_LEN)
    docs = spark.createDataFrame(
        [
            (1, toks("a", 4) + " " + shared + " " + toks("b", 3)),
            (2, shared + " " + toks("c", 6)),
            (3, toks("d", 2) + " " + shared + " " + other),
            (4, other + " " + toks("e", 9)),
            (5, toks("f", 30)),
        ],
        "doc_id bigint, text string",
    )
    kept = _apply_kept(spark, docs)
    segs = kept.select(
        (F.col("doc_id") * 10000 + F.col("ks")).alias("doc_id"),
        F.col("kept_text").alias("text"),
    )
    assert exact_substring_runs(segs, SA_MIN_LEN).count() == 0


# ---------------------------------------------------------------------------
# Stupid-backoff LM perplexity filter
# ---------------------------------------------------------------------------


def test_lm_filter_bands_and_hits(spark):
    """On real testdata: training-source docs score 'head' with near-total
    trigram coverage; every doc gets a band; hit counters are consistent."""
    from songs_etl_spark.plans.registry import REGISTRY
    from songs_etl_spark.plans.text import _SB_TRAIN_SOURCE

    df = REGISTRY["ngram_lm_perplexity_filter"].fn(spark, SF_DIR)
    rows = df.collect()
    assert rows
    bands = {r.ppl_band for r in rows}
    assert bands <= {"head", "middle", "tail", "reject", "empty"}
    assert len(bands) >= 2  # the filter discriminates
    for r in rows:
        assert r.n_trigram_hits + r.n_bigram_hits <= r.n_tokens
        if r.n_tokens > 0:
            assert r.mean_logprob_nats < 0
    # the training slice itself must score fluent
    from songs_etl_spark.plans._util import t as _t

    src_docs = {
        r.doc_id
        for r in _t(spark, SF_DIR, "documents")
        .filter(F.col("source") == _SB_TRAIN_SOURCE)
        .select("doc_id")
        .collect()
    }
    by_id = {r.doc_id: r for r in rows}
    head_ratio = sum(1 for d in src_docs if by_id[d].ppl_band == "head") / len(src_docs)
    assert head_ratio > 0.8


# ---------------------------------------------------------------------------
# DP clipped-sum release
# ---------------------------------------------------------------------------


def test_dp_clipped_sum_release_ledger_and_clip(spark):
    """The release carries the sequential-composition ledger (eps_total =
    eps_count + eps_sum), the clip binds on real records, noise stays
    within the Laplace tail bound for the md5 48-bit uniform, and the mean
    is the exact ratio of the two released quantities."""
    import duckdb
    import math

    from songs_etl_spark.plans.registry import REGISTRY
    from songs_etl_spark.plans.warehouse import _DP_CLIP_CENTS, _DP_EPS_SUM

    rows = REGISTRY["dp_clipped_sum_release"].fn(spark, SF_DIR).collect()
    assert rows
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM '{SF_DIR}/part.parquet'"
    )
    truth = {
        b: (n, s)
        for b, n, s in con.execute(
            f"""SELECT p_brand, COUNT(*),
                       SUM(LEAST(CAST(ROUND(p_retailprice*100) AS BIGINT),
                                 {_DP_CLIP_CENTS}))
                FROM part GROUP BY 1"""
        ).fetchall()
    }
    # |noise| <= b * ln(2^48 / 2): u in [2^-48, 1], so 1-2|u-1/2| >= 2^-47ish
    max_noise = _DP_CLIP_CENTS / _DP_EPS_SUM * math.log(2.0**48)
    assert sum(r.n_clipped for r in rows) > 0
    for r in rows:
        assert r.eps_total == r.eps_count + r.eps_sum == 2.0
        n, s = truth[r.brand]
        assert abs(r.noisy_sum_cents - s) <= max_noise
        assert abs(r.noisy_mean_cents - r.noisy_sum_cents / r.noisy_count) < 1e-9


def test_nndescent_init_cells_label_equivalence(spark):
    """Feeding init_cells = the label assignment must reproduce the default
    label-cell build edge-for-edge — the two-level feeder swaps WHERE the
    init cells come from, never what the rounds do."""
    from songs_etl_spark.plans.similarity import nndescent_edges

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    emb = _emb_df(spark, [(i, i % 3, unit(0.4 * i)) for i in range(18)])
    base = {(r.query_id, r.neighbor_id, r.rank) for r in nndescent_edges(emb).collect()}
    cells = emb.select("vec_id", F.col("label").alias("cell"))
    fed = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in nndescent_edges(emb, init_cells=cells).collect()
    }
    assert fed == base
