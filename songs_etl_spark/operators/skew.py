"""Skew-handling join helpers: explicit key salting.

AQE's skew-join splitting (on by default, session.py) handles most skew at
the *physical* level by splitting oversized shuffle partitions. Salting is
the logical-level fallback for the pathological case AQE can't fix: one join
key so hot that a single key's rows exceed an executor (AQE can split a
partition, but every split of a hot key still lands the whole build side of
that key on each split).

``salted_join`` spreads each left key over ``n_salts`` sub-keys
deterministically and replicates the (smaller) right side once per salt —
turning one hot key into ``n_salts`` evenly-sized keys at the cost of
``|right| × n_salts`` replicated rows. Use when the right side is small
relative to the hot key's row count but too large (or growing) to broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side's hot keys spread over
    ``n_salts`` sub-keys and the right side replicated per salt.

    The salt is a deterministic hash of the whole left row (xxhash64 of all
    columns), not rand(): reruns and task retries produce identical
    placement, keeping outputs reproducible. Semantics are exactly those of
    ``left.join(right, on, how)`` for inner/left joins (each left row meets
    each matching right row exactly once, under exactly one salt value).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_left = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT_COL)
    replicated_right = right.select("*", salts).withColumn(
        SALT_COL, F.col(SALT_COL).cast("bigint")
    )
    joined = salted_left.join(replicated_right, [*on, SALT_COL], how)
    return joined.drop(SALT_COL)
