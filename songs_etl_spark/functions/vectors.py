"""Vector math over ``array<float>`` embedding columns — pure JVM expressions.

``zip_with`` + ``aggregate`` keep the dot product inside codegen; no Arrow
round-trip, no Python. Inputs are cast to array<double> first so the
accumulation order (left-to-right over the array) and precision are identical
to a sequential double-precision loop — which is also what DuckDB's list
functions do, keeping oracle comparisons bit-stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ accumulated left-to-right in double precision."""
    products = F.zip_with(_as_double_array(a), _as_double_array(b), lambda x, y: x * y)
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL if either vector has zero norm."""
    denominator = l2_norm(a) * l2_norm(b)
    return F.when(denominator > 0, dot(a, b) / denominator)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 0x5EED) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH (Charikar 2002).

    A fixed-seed stdlib PRNG (not numpy, not time-seeded) so the planes — and
    therefore every signature, candidate set, and final answer — are
    bit-identical across runs, sessions, and cluster sizes. Uniform[-1,1]
    components are a valid symmetric sampling distribution for sign-LSH."""
    import random

    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def rh_band_signature(
    vec: Column | str, planes: list[list[float]], rows_per_band: int
) -> Column:
    """array<int> of LSH band values for a vector: sign bit per hyperplane,
    ``rows_per_band`` bits packed into each band value.

    Pure JVM expression tree (the planes are literal arrays): one map-side
    pass, no shuffle, no Python. len(planes) must divide by rows_per_band."""
    n_bands, rem = divmod(len(planes), rows_per_band)
    if rem:
        raise ValueError("len(planes) must be a multiple of rows_per_band")
    v = _as_double_array(vec)
    planes_lit = F.array(
        *[F.array(*[F.lit(w) for w in plane]) for plane in planes]
    )
    # Slice each plane to the vector's length so shorter vectors project onto
    # the plane's prefix instead of null-padding the zip (keeps the signature
    # well-defined for any dim <= len(plane)).
    bits = F.transform(
        planes_lit,
        lambda plane: F.when(
            F.aggregate(
                F.zip_with(v, F.slice(plane, 1, F.size(v)), lambda x, w: x * w),
                F.lit(0.0),
                lambda acc, p: acc + p,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda j: F.aggregate(
            F.sequence(F.lit(0), F.lit(rows_per_band - 1)),
            F.lit(0),
            lambda acc, k: acc * 2 + F.element_at(bits, j * rows_per_band + k + 1),
        ),
    )


def cosine_from_norms(a: Column | str, b: Column | str, norm_a: Column, norm_b: Column) -> Column:
    """Cosine with the norms supplied from pre-computed columns.

    For an all-pairs scoring stage, computing each side's norm *before* the
    join does O(n) fold evaluations instead of O(pairs)·2 — a 3× cut in the
    interpreted higher-order work per pair, with bit-identical results (the
    norm value is the same fold either way, and the final expression
    ``dot/(norm_a*norm_b)`` is unchanged).
    """
    denominator = norm_a * norm_b
    return F.when(denominator > 0, dot(a, b) / denominator)
