"""Distributed Lloyd's k-means over an embedding column — the clustering
primitive behind IVF index builds (plans/similarity.py ann_ivf_probe is a
coarse quantizer of this shape) and corpus organization (topic bucketing,
stratified eval splits).

Spark-first design — per iteration:

1. **Assign**: one Arrow map pass (``assign_arrow``): the k×d centroid
   matrix (model state, the same k rows a broadcast join would ship) rides
   the task closure; each batch computes the fold-order distance matrix in
   numpy and takes the (dist, cluster)-lexicographic argmin. No shuffle,
   no join, and ~100× the throughput of the interpreted-evaluator
   ``zip_with``/``aggregate`` fold it replaces — with bit-identical
   results (``_fold_d2`` reproduces the fold's IEEE op sequence exactly).
2. **Update**: ``posexplode`` assigned vectors to (cluster, dim, value)
   triples and take per-(cluster, dim) means in one shuffle keyed by
   (cluster, dim) — k×d result rows, collected to the driver as the next
   round's model (the standard Lloyd-on-Spark shape: model on the driver,
   data distributed; the k×d round-trip is bit-preserving IEEE doubles).

Driver-side state is model-sized (k×d), never data-sized; the per-vector
stages are map-side and scale with the vector count.

Reproducibility design (what makes a distributed iterative float algorithm a
pure function of its input): components are quantized to integer MICRO-UNITS
(``floor(x · 10⁶)``) up front. Integers of this size are exactly
representable in doubles, so every partial sum in the centroid means is
exact and therefore independent of partition order — the one place float
addition order could leak in. Distances fold in array order (deterministic
IEEE sequence), seeds are the k smallest vector ids, and the iteration count
is fixed, so results are bit-identical across runs, partitionings, and
engines. (A fixed 1e-6 input quantization is far below any embedding's
meaningful precision.)
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_micro(vec_col: str) -> F.Column:
    """float array → exact integer-valued double array in micro-units."""
    return F.transform(vec_col, lambda x: F.floor(x.cast("double") * 1e6).cast("double"))


def _fold_d2(pts, cents):
    """(n, k) squared-L2 matrix accumulated dimension-by-dimension: each
    element's op sequence is ``acc + (p_j − c_j)²`` left-to-right — the
    exact IEEE chain of the SQL ``list_reduce`` fold and Spark's
    ``F.aggregate``, so distances computed here are bit-identical to the
    unrolled oracles. (A BLAS matmul or ``.sum(axis)`` pairwise reduction
    would diverge by ulps and could flip near-tie argmins.)"""
    import numpy as np

    d2 = np.zeros((pts.shape[0], cents.shape[0]))
    tmp = np.empty_like(d2)
    for j in range(pts.shape[1]):
        # preallocated out= buffers: same IEEE ops per element, no per-dim
        # allocation churn (the matrix is touched d times)
        np.subtract(pts[:, j, None], cents[None, :, j], out=tmp)
        np.multiply(tmp, tmp, out=tmp)
        np.add(d2, tmp, out=d2)
    return d2


def assign_arrow(
    vecs: DataFrame,
    cent_pairs: list[tuple[int, list[float]]],
    id_col: str,
    keep_emb: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment as ONE Arrow map pass: the k×d centroid
    matrix ships in the task closure (model state, bounded by k — the same
    budget a broadcast join of the centroid relation would need); each
    batch computes the fold-order distance matrix in numpy and takes the
    (dist, cluster)-lexicographic argmin. Replaces the crossJoin +
    interpreted-HOF fold (zip_with/aggregate run on Spark's interpreted
    evaluator — measured ~100× slower per row than the Arrow batch) with
    bit-identical results: ``_fold_d2`` reproduces the fold's IEEE op
    sequence, and numpy's first-minimum argmin over ascending cluster ids
    IS the struct-min tie-break. Map-side only: no shuffle, no join.

    ``keep_emb=True`` passes the input vector through to the output so a
    consumer that needs (cluster, emb) — the Lloyd update — reads it off
    this same pass instead of joining the assignment back to ``vecs`` by
    id (two exchanges per training round, provably 1:1)."""
    import numpy as np
    import pandas as pd

    ids = [int(c) for c, _ in cent_pairs]
    cmat = np.array([v for _, v in cent_pairs], dtype=np.float64)
    id_arr = np.array(ids, dtype=np.int64)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            if not len(batch):
                continue
            pts = np.array([np.asarray(e, dtype=np.float64) for e in batch["emb"]])
            d2 = _fold_d2(pts, cmat)
            lab = d2.argmin(axis=1)
            out = {
                id_col: batch[id_col].astype("int64"),
                "cluster": id_arr[lab].astype("int32"),
                "dist": d2[np.arange(len(lab)), lab],
            }
            if keep_emb:
                out["emb"] = batch["emb"]
            yield pd.DataFrame(out)

    schema = f"{id_col} long, cluster int, dist double"
    if keep_emb:
        schema += ", emb array<double>"
    return vecs.select(id_col, "emb").mapInPandas(run, schema)


def kmeans_assign(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    seed_ids: list[int] | None = None,
) -> DataFrame:
    """Run ``n_iter`` Lloyd update rounds from deterministic seeds (the k
    vectors with the smallest ids) and return (id_col, cluster, dist): each
    vector's final cluster and squared-L2 distance (micro-units²) to its
    centroid. Clusters that lose all members simply drop out (k shrinks) —
    same behavior on any engine.

    Per round: one Arrow map pass for assignment (``assign_arrow`` — the
    k-row centroid model rides the closure; the N-row relation never
    shuffles for assignment) plus one (cluster, dim)-keyed aggregation for
    the update, whose k×d result is COLLECTED to the driver — the standard
    Lloyd-on-Spark shape: model state (k×d doubles, tiny and k-bounded)
    lives on the driver between rounds, data stays distributed. The
    driver round-trip is bit-preserving (IEEE doubles), so results remain
    identical to the fully-relational formulation the DuckDB oracle
    unrolls."""
    from songs_etl_spark.plans._util import track_persist

    vecs = track_persist(vectors.select(id_col, quantize_micro(vec_col).alias("emb")))
    cent_pairs = train_centroids(
        vecs, k=k, n_iter=n_iter, id_col=id_col, seed_ids=seed_ids
    )
    return assign_arrow(vecs, cent_pairs, id_col)


def train_centroids(
    vecs: DataFrame,
    k: int,
    n_iter: int,
    id_col: str = "vec_id",
    seed_ids: list[int] | None = None,
) -> list[tuple[int, list[float]]]:
    """The Lloyd trainer of :func:`kmeans_assign`, factored out so other
    quantizers (e.g. per-subspace PQ codebooks, plans/pq.py) can learn a
    codebook over any pre-quantized (id, emb) relation and keep the model.
    Same reproducibility contract: seeds = k smallest ids, Arrow fold-order
    assignment, exact integer-sum means collected driver-side (k×d model
    rows per round — never data-sized). Returns the final [(cluster_id,
    centroid), ...]; clusters that lose all members drop out (ids keep
    their seed numbering, no renumbering — matching the unrolled SQL
    oracles)."""
    if seed_ids is None:
        seeds = vecs.orderBy(id_col).limit(k).select("emb").collect()
        cent_pairs = [(i + 1, list(r["emb"])) for i, r in enumerate(seeds)]
    else:
        # Caller-supplied seeds (e.g. plans/clustering.kmeans_scalable_seeding
        # — the k-means‖ pass): seed ORDER defines cluster numbering, so
        # preserve the list order, not id order.
        picked = {
            r[id_col]: list(r["emb"])
            for r in vecs.filter(F.col(id_col).isin(list(seed_ids))).collect()
        }
        missing = [s for s in seed_ids if s not in picked]
        if missing:
            raise ValueError(f"train_centroids: seed ids absent from input: {missing}")
        cent_pairs = [(i + 1, picked[s]) for i, s in enumerate(seed_ids)]
    for _ in range(n_iter):
        # keep_emb threads the vector through the assignment pass; the old
        # assigned ⋈ vecs re-join (1:1 on id) cost two exchanges per round.
        assigned = assign_arrow(vecs, cent_pairs, id_col, keep_emb=True)
        components = (
            assigned
            .select("cluster", F.posexplode("emb").alias("dim", "v"))
            .groupBy("cluster", "dim")
            # exact: integer-valued doubles sum without rounding, so the
            # mean is partition-order-independent
            .agg((F.sum("v") / F.count("*")).alias("m"))
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for row in components.collect():
            by_cluster.setdefault(row["cluster"], {})[row["dim"]] = row["m"]
        cent_pairs = [
            (c, [dims[d] for d in sorted(dims)]) for c, dims in sorted(by_cluster.items())
        ]
    return cent_pairs


def _lloyd_numpy(pts, k: int, n_iter: int):
    """Single-cell Lloyd on a (n, d) float64 array of micro-quantized
    integers, seeds = first k rows (caller sorts by id). Pure numpy on a
    fixed-order array — bit-deterministic. Returns (k', d) centroids
    (empty clusters dropped, survivors keep their seed order, renumbered
    compactly each iteration).

    Distances accumulate dimension-by-dimension (the j-loop), NOT via the
    expanded-form matmul: ``acc + (p_j − c_j)²`` left-to-right is the exact
    IEEE op sequence of the SQL ``list_reduce`` fold and Spark's
    ``F.aggregate`` — so the two-level assignment is value-oracle-checkable
    (plans/clustering._duckdb_twolevel_sql), not just self-consistent. A
    BLAS matmul's summation order would diverge by ulps once centroids stop
    being integers (iteration ≥ 2) and could flip near-tie argmins."""
    import numpy as np

    cents = pts[:k].copy()
    for _ in range(n_iter):
        lab = _fold_d2(pts, cents).argmin(axis=1)  # first-min == struct-min (d, sub)
        new = []
        for c in range(cents.shape[0]):
            members = pts[lab == c]
            if len(members):
                # exact: integer-valued doubles sum without rounding
                new.append(members.sum(axis=0) / len(members))
        cents = np.stack(new) if new else cents[:1]
    return cents


def kmeans_assign_twolevel(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 64,
    n_iter: int = 3,
    sample_mult: int = 8,
) -> DataFrame:
    """IVF-style two-level k-means assignment: the scale path for k ∝ N.

    Flat Lloyd's assignment step costs N·k distance evaluations per round;
    with SemDeDup's k = N/target_cluster_size that term is N²/size — the
    known asymptotic wall of flat k-means (BASELINE.md scale-stress notes).
    The standard fix is the IVF structure (coarse-then-fine quantization,
    as in IVF ANN indexes — same shape as plans/similarity.ann_ivf_probe):

    1. **Sample** ~``sample_mult·k`` training points by deterministic hash
       coin on the id (md5 low-32-bits mod denom — reproducible, no RNG,
       the cross-engine discipline of plans/sampling.py).
    2. **Coarse train**: flat Lloyd (``kmeans_assign``) with k_c = ceil(√k)
       centroids ON THE SAMPLE ONLY — cost |S|·√k, independent of N's
       quadratic term.
    3. **Fine train**: group the sample by coarse cell; per cell, a numpy
       Lloyd (Arrow ``applyInPandas``, rows sorted by id, seeds = lowest
       ids) produces ~k/k_c sub-centroids — per-cell cost |cell|·k_f with
       |cell| ≈ |S|/k_c, so the whole stage is ~|S|·k_f.
    4. **Assign**: ONE Arrow map pass over the N-row relation with the
       trained model (k_c coarse + k fine centroids — the same relations a
       broadcast join would ship) in the task closure: fold-order coarse
       argmin picks the cell (N·√k evals), then each vector meets only its
       own cell's ~√k sub-centroids for the fine argmin (N·√k evals). The
       N-row relation is never shuffled and never joined; cells with no
       fine centroids (possible when the final coarse re-assign moves
       full-data vectors into a cell no sample point landed in) fall back
       to the coarse centroid as their single sub-centroid (sub = k_f).

    Total assignment work is N·2√k instead of N·k — for k ∝ N that turns
    the quadratic term into N^1.5, and tools/scale_stress.py measures the
    resulting curve (semantic_dedup_twolevel row in BASELINE.md).

    Output contract matches ``kmeans_assign``: (id_col, cluster, dist) with
    ``dist`` the squared L2 (micro-units²) to the chosen fine centroid.
    Cluster ids are ``cell · k_f_max + sub`` — stable, disjoint across
    cells. Deterministic end-to-end: hash-coin sample, seed-by-lowest-id at
    both levels, fixed iteration counts, exact integer micro-unit sums.
    """
    import math

    import numpy as np
    import pandas as pd

    k_c = max(2, math.isqrt(k - 1) + 1)
    k_f = max(1, (k + k_c - 1) // k_c)

    from songs_etl_spark.plans._util import track_persist

    vecs = track_persist(vectors.select(id_col, quantize_micro(vec_col).alias("emb")))
    n = vecs.count()
    target = min(n, max(sample_mult * k, 4 * k_c))
    denom = max(1, n // max(1, target))
    # Deterministic hash coin on the id: low 32 bits of md5 mod denom — the
    # cross-engine sampling discipline of plans/sampling.py (Spark conv(
    # substr(md5,25,8)) ≡ DuckDB CAST('0x'||substr(md5,25,8) AS BIGINT)),
    # so the two-level assignment is value-oracle-checkable end to end.
    coin = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 25, 8), 16, 10).cast("bigint")
        % F.lit(denom)
        == 0
    )
    sample = vecs.filter(coin)

    # Coarse training sees the RAW vectors: kmeans_assign quantizes
    # internally, and feeding it the already-quantized relation would
    # re-scale components to ~1e12, collapsing the exact-integer-sum
    # headroom its determinism contract relies on.
    sample_raw = vectors.filter(coin).select(
        F.col(id_col), F.col(vec_col).alias("e")
    )
    coarse = (
        kmeans_assign(sample_raw, id_col=id_col, vec_col="e", k=k_c, n_iter=n_iter)
        .select(id_col, F.col("cluster").alias("cell"))
        .join(sample, id_col)
    )
    # Persisted: coarse feeds BOTH coarse_cents and the Arrow fine-training
    # branch — unpersisted, the whole sample+coarse-Lloyd DAG re-executes
    # per branch (the multi-branch recompute class semdedup also hit).
    coarse = track_persist(coarse)
    # Re-derive the trained coarse centroids as per-cell means of the sample
    # members (identical to the last Lloyd update the training run produced).
    coarse_cents = (
        coarse.select("cell", F.posexplode("emb").alias("dim", "v"))
        .groupBy("cell", "dim")
        .agg((F.sum("v") / F.count("*")).alias("m"))
        .select("cell", F.struct("dim", "m").alias("dm"))
        .groupBy("cell")
        .agg(F.transform(F.array_sort(F.collect_list("dm")), lambda x: x["m"]).alias("centroid"))
    )
    coarse_cents = track_persist(coarse_cents)

    fine_schema = "cell int, sub int, centroid array<double>"

    def train_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        cell = int(pdf["cell"].iloc[0])
        pdf = pdf.sort_values("__id")
        pts = np.array([np.asarray(e, dtype=np.float64) for e in pdf["emb"]])
        cents = _lloyd_numpy(pts, min(k_f, len(pts)), n_iter)
        return pd.DataFrame(
            {"cell": cell, "sub": range(len(cents)), "centroid": [list(c) for c in cents]}
        )

    # Persisted: fine_cents appears on both sides of the fallback union
    # below — unpersisted, the per-cell Arrow Lloyd would execute twice.
    fine_cents = track_persist(
        coarse.select(F.col("cell"), F.col(id_col).alias("__id"), "emb")
        .groupBy("cell")
        .applyInPandas(train_cell, schema=fine_schema)
    )
    # Fallback rows ONLY for cells with no fine centroids (anti-join).
    # Every assignable cell comes from coarse_cents, and every trained
    # coarse cell has ≥1 sample member, so this is normally empty — it is
    # a guard, and it must not compete with the fine centroids in covered
    # cells (an unconditional union would let the cell mean beat them and
    # silently deviate from the IVF fine assignment).
    fine_all = fine_cents.unionByName(
        coarse_cents.join(
            fine_cents.select("cell").distinct(), "cell", "left_anti"
        ).select("cell", F.lit(k_f).alias("sub"), "centroid")
    )

    # Both assignment stages in ONE Arrow map pass over the N-row relation:
    # the trained model (k_c coarse centroids + k fine sub-centroids, the
    # exact relations the broadcast joins would ship) rides the closure;
    # per batch, a fold-order coarse argmin picks the cell, then each
    # cell-group takes its fold-order (d, sub) argmin over that cell's
    # sub-centroids only. No join, no shuffle, bit-identical to the
    # relational formulation the DuckDB oracle unrolls (_fold_d2 docstring).
    coarse_rows = sorted(
        ((int(r["cell"]), list(r["centroid"])) for r in coarse_cents.collect())
    )
    cell_ids = np.array([c for c, _ in coarse_rows], dtype=np.int64)
    cmat = np.array([v for _, v in coarse_rows], dtype=np.float64)
    fine_by_cell: dict[int, tuple] = {}
    for r in sorted(
        ((int(r["cell"]), int(r["sub"]), list(r["centroid"])) for r in fine_all.collect())
    ):
        subs, cents = fine_by_cell.setdefault(r[0], ([], []))
        subs.append(r[1])
        cents.append(r[2])
    fine_np = {
        cell: (np.array(subs, dtype=np.int64), np.array(cents, dtype=np.float64))
        for cell, (subs, cents) in fine_by_cell.items()
    }

    def assign_batches(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for batch in batches:
            if not len(batch):
                continue
            pts = np.array([np.asarray(e, dtype=np.float64) for e in batch["emb"]])
            ids = batch[id_col].astype("int64").to_numpy()
            cells = cell_ids[_fold_d2(pts, cmat).argmin(axis=1)]
            out_cluster = np.empty(len(ids), dtype=np.int64)
            out_dist = np.empty(len(ids), dtype=np.float64)
            for cell in np.unique(cells):
                mask = cells == cell
                subs, fmat = fine_np[int(cell)]
                d2 = _fold_d2(pts[mask], fmat)
                pick = d2.argmin(axis=1)  # first-min == struct-min (d, sub)
                out_cluster[mask] = int(cell) * (k_f + 1) + subs[pick]
                out_dist[mask] = d2[np.arange(len(pick)), pick]
            yield pd.DataFrame(
                {id_col: ids, "cluster": out_cluster.astype("int32"), "dist": out_dist}
            )

    return vecs.select(id_col, "emb").mapInPandas(
        assign_batches, f"{id_col} long, cluster int, dist double"
    )
