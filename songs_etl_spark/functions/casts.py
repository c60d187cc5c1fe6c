"""Safe casts (reference op C1 and the release-date precision quirk).

The reference converts ``added_at`` ISO-8601 strings with
``pd.to_datetime(errors='coerce')`` — NULL on unparseable input
(`cf_transform/main.py:171`). Spark 4 runs ANSI mode by default, where a bad
CAST throws; ``try_to_timestamp`` restores NULL-on-error semantics without
disabling ANSI for everything else.

``album.release_date`` arrives at varying precision — YYYY, YYYY-MM, or
YYYY-MM-DD (Spotify behavior, noted at cf_extract/main.py:258-279) — and is
normalized to a DATE at the first day of the period.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def try_iso_timestamp(col: Column | str) -> Column:
    """ISO-8601 string → timestamp, NULL on failure (pandas errors='coerce')."""
    c = F.col(col) if isinstance(col, str) else col
    # Spotify emits trailing 'Z'; try_to_timestamp handles it under the
    # default parser, but strip defensively so "2020-01-02T03:04:05Z" and
    # "2020-01-02 03:04:05" both parse.
    cleaned = F.regexp_replace(F.regexp_replace(c, "Z$", ""), "T", " ")
    return F.try_to_timestamp(cleaned)


def parse_release_date(col: Column | str) -> Column:
    """Varying-precision date string → DATE (YYYY→Jan 1, YYYY-MM→1st), NULL on junk."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.when(c.rlike(r"^\d{4}$"), F.concat(c, F.lit("-01-01"))).when(
        c.rlike(r"^\d{4}-\d{2}$"), F.concat(c, F.lit("-01"))
    ).otherwise(c)
    return F.try_to_timestamp(padded, F.lit("yyyy-MM-dd")).cast("date")
