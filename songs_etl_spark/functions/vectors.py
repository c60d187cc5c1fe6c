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
