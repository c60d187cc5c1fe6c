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
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    partition_cols: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    prefix: str = "asof_",
    tolerance_ms: int | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with the
    same partition keys and ``right.ts <= left.ts`` (inclusive, like DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts``); NULL payload when no prior right row
    exists (left-outer semantics). With ``tolerance_ms`` set (timestamp
    ``ts_col`` only), a match additionally requires
    ``left.ts − right.ts <= tolerance_ms`` — the bounded-staleness as-of
    (kdb's ``wj``/pandas ``merge_asof(tolerance=…)``): since the latest
    prior row is the CLOSEST prior row, masking it when stale is exactly
    "no match within the window" (an earlier row can never be closer).

    ``direction="forward"`` (pandas ``merge_asof(direction='forward')``)
    attaches the EARLIEST right row with ``right.ts >= left.ts`` instead —
    "the next event after X" (follow-up attribution, next-delivery lookup).
    Same single shuffle: the carry runs over a DESC-ordered expanding frame
    (see below). ``direction="nearest"`` computes BOTH carries over the
    same shuffle partitioning (one Exchange, two in-partition sorts) and
    picks the row with the smaller |gap|, exact ties to the prior row —
    pandas ``merge_asof(direction='nearest')``.

    Intra-timestamp determinism: with multiple right rows at the same
    (partition, ts), the carried row is the one with the GREATEST payload
    struct for backward and the LEAST for forward (field-order struct
    comparison) — deterministic across shuffles and retries, because the
    carries are ``max``/``min`` over a ``(matched_ts, payload…)`` struct
    rather than a sort-position-dependent ``last``/``first`` (which made
    the pick whichever duplicate happened to sort first and could flake
    an exact-value gate on re-partitioning). On a (partition, ts)-unique
    right side the results are identical to the positional carries.

    Implementation: tag sides, align schemas, union, then one window pass per
    partition key ordered by (ts, side) — right rows sort before left rows at
    equal timestamps so same-instant matches are visible — carrying the
    matched right row's payload as ONE STRUCT whose FIRST field is the
    right row's timestamp: ``max(struct)`` over the expanding backward
    frame picks the latest prior row (struct comparison is
    lexicographic, so the leading ``__rts`` dominates and equal-ts
    duplicates resolve by payload order); ``min(struct)`` over a
    DESC-ordered expanding frame picks the earliest following row. Both
    frames are UNBOUNDED PRECEDING → CURRENT ROW, which Spark evaluates
    incrementally — the positional ``first(ignorenulls)`` over an
    UNBOUNDED FOLLOWING frame it replaces is re-aggregated per row
    (quadratic in the partition's densest key). The single-struct carry
    guarantees all payload columns AND the matched-row timestamp come from
    the SAME right row even when individual payload fields are NULL —
    per-column carries would resurrect an older row's value for a field
    the matched row left NULL, diverging from pandas ``merge_asof``/kdb
    ``wj`` and breaking the tolerance mask (the mask would judge an old
    value by the newest row's timestamp). The tolerance adds only the
    per-row freshness mask — same single shuffle.

    ``allow_exact_matches=False`` (pandas ``merge_asof`` parity) makes the
    inequality STRICT in every direction: backward matches require
    ``right.ts < left.ts``, forward ``right.ts > left.ts``, nearest both.
    Implementation is one sort-key change, not a new plan: right rows
    normally sort BEFORE left rows at equal timestamps (side 0 < 1) so
    same-instant matches fall inside the expanding frame; in strict mode
    the right side sorts AFTER (side 2 > 1), putting same-instant right
    rows outside the frame in both window directions — same single
    shuffle, same carries."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    right_side = 0 if allow_exact_matches else 2
    p = list(partition_cols)
    # __rts FIRST: lexicographic struct comparison makes max()/min() order
    # by matched timestamp, payload fields breaking intra-timestamp ties
    # deterministically.
    carry_struct_type = T.StructType(
        [T.StructField("__rts", right.schema[ts_col].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in payload_cols]
    )
    right_aligned = right.select(
        *p,
        F.col(ts_col),
        F.lit(right_side).alias("__side"),
        F.struct(
            F.col(ts_col).alias("__rts"),
            *[F.col(c).alias(c) for c in payload_cols],
        ).alias("__asof"),
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
        F.lit(None).cast(carry_struct_type).alias("__asof"),
        *[F.col(c).alias(f"__left_{c}") for c in left.columns if c not in p and c != ts_col],
    )
    unioned = right_aligned.unionByName(left_aligned)
    w_back = (
        Window.partitionBy(*p)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: DESC ts order so the expanding frame holds every row with
    # ts >= current; right rows (side 0) sort before left rows (side 1) at
    # equal ts, so a same-instant right row is inside the frame. min(struct)
    # over it = earliest following right row — same result as
    # first(ignorenulls) over an UNBOUNDED FOLLOWING frame, but evaluated
    # incrementally instead of re-aggregated per row.
    w_fwd = (
        Window.partitionBy(*p)
        .orderBy(F.col(ts_col).desc(), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carries = []
    if direction in ("backward", "nearest"):
        carries.append(F.max("__asof").over(w_back).alias("__b"))
    if direction in ("forward", "nearest"):
        carries.append(F.min("__asof").over(w_fwd).alias("__f"))
    carried = unioned.select(
        *p,
        ts_col,
        "__side",
        *carries,
        *[F.col(f"__left_{c}") for c in left.columns if c not in p and c != ts_col],
    )

    def _masked(side_col: str, sign: int) -> F.Column:
        """The side's carried struct, NULLed when outside tolerance."""
        if tolerance_ms is None:
            return F.col(side_col)
        gap = sign * (
            F.unix_millis(F.col(ts_col)) - F.unix_millis(F.col(f"{side_col}.__rts"))
        )
        return F.when(gap <= F.lit(tolerance_ms), F.col(side_col))

    if direction == "backward":
        pick = _masked("__b", 1)
    elif direction == "forward":
        pick = _masked("__f", -1)
    else:
        b, f = _masked("__b", 1), _masked("__f", -1)
        back_gap = F.unix_millis(F.col(ts_col)) - F.unix_millis(b["__rts"])
        fwd_gap = F.unix_millis(f["__rts"]) - F.unix_millis(F.col(ts_col))
        # closer side wins; exact tie -> the prior row (pandas merge_asof
        # direction='nearest' resolves ties backward)
        pick = F.when(
            b.isNotNull() & (f.isNull() | (back_gap <= fwd_gap)), b
        ).otherwise(f)
    picked = carried.filter(F.col("__side") == 1).select(
        *p,
        ts_col,
        pick.alias("__asof"),
        *[F.col(f"__left_{c}") for c in left.columns if c not in p and c != ts_col],
    )
    return picked.select(
        *p,
        ts_col,
        *[F.col(f"__left_{c}").alias(c) for c in left.columns if c not in p and c != ts_col],
        *[F.col(f"__asof.{c}").alias(f"{prefix}{c}") for c in payload_cols],
    )
