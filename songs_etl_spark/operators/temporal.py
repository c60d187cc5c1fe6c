"""Temporal join operators Spark lacks as built-ins, composed from DataFrame
primitives (no UDFs): the as-of (most-recent-prior) join.

The reference has no temporal joins (SURVEY.md §2.3 — equi-joins only); this
is part of the engine's large-scale pipeline surface, where "attach the most
recent prior X to each Y" (feature lookups, slowly-changing attributes,
click→purchase attribution) is a workhorse.

Scale design: the union+window formulation costs exactly ONE shuffle on the
partition keys plus a per-partition sort — same cost envelope as a sort-merge
join, with no pair explosion for dense right sides (a windowed range join
would emit |left|×|matches in range| rows; this emits |left|). Skew is
bounded by the hottest partition key; salt upstream if one key dominates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    partition_cols: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with the
    same partition keys and ``right.ts <= left.ts`` (inclusive, like DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts``); NULL payload when no prior right row
    exists (left-outer semantics).

    Implementation: tag sides, align schemas, union, then one window pass per
    partition key ordered by (ts, side) — right rows sort before left rows at
    equal timestamps so same-instant matches are visible — carrying the last
    non-null payload forward (``last(..., ignorenulls=True)``); keep left rows.
    """
    p = list(partition_cols)
    right_aligned = right.select(
        *p,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__left_{c}")
            for c in left.columns
            if c not in p and c != ts_col
        ],
    )
    left_aligned = left.select(
        *p,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{prefix}{c}") for c in payload_cols],
        *[F.col(c).alias(f"__left_{c}") for c in left.columns if c not in p and c != ts_col],
    )
    unioned = right_aligned.unionByName(left_aligned)
    w = (
        Window.partitionBy(*p)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *p,
        ts_col,
        "__side",
        *[F.last(f"{prefix}{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}") for c in payload_cols],
        *[F.col(f"__left_{c}") for c in left.columns if c not in p and c != ts_col],
    )
    return carried.filter(F.col("__side") == 1).select(
        *p,
        ts_col,
        *[F.col(f"__left_{c}").alias(c) for c in left.columns if c not in p and c != ts_col],
        *[F.col(f"{prefix}{c}") for c in payload_cols],
    )
