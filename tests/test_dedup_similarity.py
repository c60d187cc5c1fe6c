"""Hand-computed-oracle tests for the near-dup / similarity operators
(SURVEY.md §7 hard part 5: LSH-family correctness is not SQL-expressible, so
these pin behavior with tiny crafted corpora)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from songs_etl_spark.plans import REGISTRY

BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tonight"  # 1 token differs
FAR = "completely different words about unrelated topics such as cooking pasta"


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    """A documents.parquet matching the testdata schema, with one exact-dup
    pair, one near-dup pair, and one unrelated doc."""
    d = tmp_path_factory.mktemp("corpus")
    rows = [
        (0, BASE, len(BASE)),
        (1, BASE, len(BASE)),  # exact duplicate of 0
        (2, NEAR, len(NEAR)),  # near duplicate of 0/1
        (3, FAR, len(FAR)),
    ]
    spark.createDataFrame(rows, "doc_id bigint, text string, n_chars bigint").coalesce(
        1
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def jaccard_3shingle(a: str, b: str) -> float:
    def sh(s):
        t = s.split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_dedup_exact_groups(spark, corpus_dir):
    got = {
        r.canonical_doc_id: r.n_copies
        for r in REGISTRY["dedup_exact"].fn(spark, corpus_dir).collect()
    }
    # Docs 0 and 1 collapse to canonical 0; 2 and 3 stand alone.
    assert got == {0: 2, 2: 1, 3: 1}


def test_ngram_jaccard_finds_exact_and_near_pairs(spark, corpus_dir):
    rows = REGISTRY["dedup_ngram_jaccard"].fn(spark, corpus_dir).collect()
    pairs = {(r.da, r.db): r.jac for r in rows}
    expected = jaccard_3shingle(BASE, NEAR)
    assert pairs[(0, 1)] == 1.0
    assert math.isclose(pairs[(0, 2)], expected, rel_tol=1e-12)
    assert math.isclose(pairs[(1, 2)], expected, rel_tol=1e-12)
    # The unrelated doc pairs with nothing at θ=0.8.
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_recalls_exact_dups(spark, corpus_dir):
    """Identical docs have identical MinHash signatures → guaranteed to share
    every band → always candidates; verification keeps them at any θ."""
    rows = REGISTRY["dedup_minhash_lsh"].fn(spark, corpus_dir).collect()
    pairs = {(r.da, r.db) for r in rows}
    assert (0, 1) in pairs
    assert not any(3 in p for p in pairs)


def test_simhash_identical_docs_equal_fingerprints(spark, corpus_dir):
    fp = {r.doc_id: r.simhash64 for r in REGISTRY["dedup_simhash"].fn(spark, corpus_dir).collect()}
    assert fp[0] == fp[1]
    assert len(fp[0]) == 64 and set(fp[0]) <= {"0", "1"}
    # Near-dup docs land at small Hamming distance; unrelated docs far.
    ham_near = sum(a != b for a, b in zip(fp[0], fp[2]))
    ham_far = sum(a != b for a, b in zip(fp[0], fp[3]))
    assert ham_near < ham_far


@pytest.fixture(scope="module")
def vectors_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("vectors")
    rows = [
        # vec_id < 10 are queries (operator contract).
        (0, 0, [1.0, 0.0, 0.0, 0.0]),
        (10, 0, [1.0, 0.0, 0.0, 0.0]),  # identical → cos 1.0
        (11, 0, [0.9, 0.1, 0.0, 0.0]),  # close
        (12, 1, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
        (13, 1, [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, label bigint, embedding array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


def test_ann_bruteforce_exact_ranking(spark, vectors_dir):
    rows = REGISTRY["ann_bruteforce_topk"].fn(spark, vectors_dir).collect()
    ranked = [r.neighbor_id for r in sorted(rows, key=lambda r: r.rank) if r.query_id == 0]
    assert ranked == [10, 11, 12, 13]
    by_n = {r.neighbor_id: r.cos_sim for r in rows}
    assert by_n[10] == 1.0 and by_n[12] == 0.0 and by_n[13] == -1.0
    assert math.isclose(by_n[11], 0.9 / math.sqrt(0.81 + 0.01), rel_tol=1e-6)


def test_embedding_neardup_threshold(spark, vectors_dir):
    pairs = {
        (r.da, r.db): r.cos_sim
        for r in REGISTRY["embedding_neardup_pairs"].fn(spark, vectors_dir).collect()
    }
    assert (0, 10) in pairs and (0, 11) in pairs and (10, 11) in pairs
    # Orthogonal/opposite pairs are below the 0.4 threshold.
    assert all(12 not in p and 13 not in p for p in pairs)


def test_embedding_neardup_lsh_matches_allpairs(spark, vectors_dir):
    """The LSH path must emit exactly the all-pairs baseline's rows — recall
    1.0, no false positives (the exact verify removes any band collision)."""
    exact = {
        (r.da, r.db, r.cos_sim)
        for r in REGISTRY["embedding_neardup_pairs"].fn(spark, vectors_dir).collect()
    }
    lsh = {
        (r.da, r.db, r.cos_sim)
        for r in REGISTRY["embedding_neardup_lsh"].fn(spark, vectors_dir).collect()
    }
    assert lsh == exact and exact


def test_embedding_neardup_lsh_no_pair_scan(spark, vectors_dir):
    """Scale guard: the plan must be all equi-joins (band key, then vec_id) —
    a BroadcastNestedLoopJoin/CartesianProduct means the all-pairs scan the
    operator exists to avoid."""
    df = REGISTRY["embedding_neardup_lsh"].fn(spark, vectors_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_rh_neardup_megagroup_collapses_before_banding(spark):
    """Duplicate-heavy skew armor: B bit-identical vectors must collapse to
    ONE representative before the (band, bval) self-join — the banding sees
    n_distinct rows, not n_distinct + B — and the output must still contain
    every within-group pair at cos 1.0 plus the cross pairs to any
    near-duplicate of the group's direction."""
    import random

    from songs_etl_spark.plans.similarity import (
        HISIM_BANDS,
        collapse_exact_duplicates,
        rh_neardup_pairs,
    )

    rng = random.Random(11)
    base = [rng.uniform(-1.0, 1.0) for _ in range(64)]
    rows = [(vid, [rng.uniform(-1.0, 1.0) for _ in range(64)]) for vid in range(20)]
    B = 200
    rows += [(1000 + i, base) for i in range(B)]  # the mega-group
    rows.append((5000, [x * 2.0 for x in base]))  # scaled near-dup, own group
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    members, reps = collapse_exact_duplicates(emb)
    n_reps = reps.count()
    assert n_reps == 22  # 20 random + 1 mega-group + 1 scaled
    assert members.count() == len(rows)
    assert members.filter(F.col("rep") == 1000).count() == B

    got = {(r.da, r.db): r.cos_sim for r in rh_neardup_pairs(emb).collect()}
    # every within-group pair, every member x the scaled twin — nothing else
    expect = {(1000 + i, 1000 + j) for i in range(B) for j in range(i + 1, B)}
    expect |= {(1000 + i, 5000) for i in range(B)}
    assert set(got) == expect
    assert all(abs(v - 1.0) < 1e-5 for v in got.values())


def test_rh_neardup_hisim_finds_planted_duplicate(spark):
    """The production high-sim regime (rh_neardup_pairs defaults: threshold
    0.9, 12-bit x 16 bands) must recall a planted exact-direction duplicate
    and emit nothing for unrelated random-direction vectors."""
    import math
    import random

    from songs_etl_spark.plans.similarity import rh_neardup_pairs

    rng = random.Random(7)
    rows = []
    for vid in range(40):
        v = [rng.uniform(-1.0, 1.0) for _ in range(64)]
        rows.append((vid, v))
    # vec 100 = vec 0 scaled (cosine exactly 1.0 up to float rounding).
    rows.append((100, [x * 1.5 for x in rows[0][1]]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {(r.da, r.db): r.cos_sim for r in rh_neardup_pairs(emb).collect()}
    assert (0, 100) in got
    assert math.isclose(got[(0, 100)], 1.0, abs_tol=1e-5)
    # 64-dim random vectors: pairwise cosines concentrate near 0 — none
    # should cross the 0.9 threshold.
    assert all(da == 0 and db == 100 for (da, db) in got)


def test_knn_arrow_kernel_matches_naive_jvm_formulation(spark):
    """The Arrow cell kernel of knn_topk_within_cells must reproduce the
    naive equi-join + interpreted-fold formulation EXACTLY (same fold
    order ⇒ same raw cosines ⇒ same rounded ranks), including tie and
    small-cell (n ≤ k) edges. 40 deterministic 8-dim vectors in 3 cells,
    one cell holding bit-identical copies (cos 1.0 ties) and one
    2-member cell (fewer candidates than k)."""
    from songs_etl_spark.functions.vectors import cosine_from_norms, l2_norm
    from songs_etl_spark.plans.similarity import knn_topk_within_cells
    from pyspark.sql.window import Window

    rows = []
    for i in range(40):
        if i < 6:  # bit-identical duplicates, one cell
            vec, cell = [1.0, 2.0, -1.0, 0.5, 0.25, -2.0, 3.0, 0.125], 0
        elif i < 38:
            vec = [float(((i * 7 + j * 13) % 11) - 5) / 4 for j in range(8)]
            cell = 1
        else:  # 2-member cell: only 1 candidate for k=3
            vec, cell = [float(j + 1) * (1.5 if i == 38 else -0.75) for j in range(8)], 2
        rows.append((i, cell, vec))
    df = spark.createDataFrame(rows, "vec_id long, cell int, embedding array<double>")

    got = knn_topk_within_cells(df, k=3)

    a = df.select(
        F.col("vec_id").alias("query_id"),
        "cell",
        F.col("embedding").alias("q_emb"),
        l2_norm("embedding").alias("q_norm"),
    )
    b = df.select(
        F.col("vec_id").alias("neighbor_id"),
        "cell",
        F.col("embedding").alias("c_emb"),
        l2_norm("embedding").alias("c_norm"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    want = (
        a.join(b, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_from_norms("q_emb", "c_emb", F.col("q_norm"), F.col("c_norm")), 6
            ).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
    got_rows = sorted(map(tuple, got.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows
    # every full cell yields exactly k rows per query; the 2-member cell 1
    assert sum(1 for r in got_rows if r[0] in (38, 39)) == 2
