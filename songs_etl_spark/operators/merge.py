"""Merge / upsert (warehouse MERGE INTO semantics, batch formulation).

The reference's only load mode is full truncate-and-reload
(`cf_transform/main.py:72-75` WRITE_TRUNCATE; SURVEY.md §2 S11/O5). At 100 TB
a daily full rewrite is untenable — the incremental replacement is an upsert:
stage the changed/new rows, merge them into the target by key, rewrite only
what changed. This module gives the engine that operator as a pure DataFrame
transform (the storage-side "rewrite only touched files" half belongs to a
table format like Delta/Iceberg and is out of scope; the produced DataFrame
can be written with dynamic partition overwrite to approximate it).

Semantics match SQL ``MERGE INTO target USING updates ON keys WHEN MATCHED
THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``: an update row wins over
the matched target row **even where its non-key columns are NULL** (it
replaces the row, not coalesces it), and update rows with no match insert.

Scale notes — why two joins instead of one full-outer join: Spark cannot
broadcast a full-outer join (both sides stream), so that shape always
shuffles the entire 100 TB target. Decomposed as

    (target LEFT JOIN updates → pick)  UNION ALL  (updates ANTI JOIN target-keys)

the update pass broadcasts a small updates side and never shuffles the
target, and the insert pass joins against the target pruned to its key
columns only. Duplicate keys in ``updates`` would fan out matched rows —
callers must pre-dedup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FLAG = "__is_update"


def merge_upsert(target: DataFrame, updates: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Upsert ``updates`` into ``target`` by ``keys``; ``updates`` must carry
    every target column. Returns the merged relation (target's schema)."""
    missing = set(target.columns) - set(updates.columns)
    if missing:
        raise ValueError(f"updates is missing target columns: {sorted(missing)}")
    upd = updates.select(*target.columns)
    flagged = upd.withColumn(_FLAG, F.lit(True))
    # Matched-or-kept rows: USING-style left join keeps target key columns;
    # non-key columns resolve by the presence flag so NULL update cells win.
    updated = target.join(flagged, on=list(keys), how="left").select(
        *[
            F.col(c)
            if c in keys
            else F.when(F.coalesce(F.col(_FLAG), F.lit(False)), flagged[c])
            .otherwise(target[c])
            .alias(c)
            for c in target.columns
        ]
    )
    # Insert rows: updates with no matching target key (target pruned to keys).
    inserted = upd.join(target.select(*keys), on=list(keys), how="left_anti")
    return updated.unionByName(inserted.select(*target.columns))


def cdc_apply(
    changes: DataFrame,
    keys: Sequence[str],
    version_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a CDC change feed (Debezium/"changes since T" shape: one row
    per insert/update/delete, totally ordered per key by ``version_cols``)
    to the final table state: the latest change wins per key, and a key whose
    latest change is a delete vanishes. The ``op_col`` is dropped from the
    output — what remains is the table, not the feed.

    Plan shape: one shuffle by key for the per-key argmax. Implemented as
    ``max_by`` over a struct ordering key — a hash aggregation with map-side
    partials — NOT ``ROW_NUMBER() = 1``, which would sort every partition.
    At 100 TB of accumulated feed, compact periodically (apply the feed,
    write the state, restart the feed from the checkpoint) so the aggregation
    reads days, not years.
    """
    ordkey = F.struct(*[F.col(c) for c in version_cols])
    payload = [c for c in changes.columns if c not in keys]
    latest = changes.groupBy(*keys).agg(
        *[F.max_by(c, ordkey).alias(c) for c in payload]
    )
    return latest.filter(F.col(op_col) != delete_op).drop(op_col)
