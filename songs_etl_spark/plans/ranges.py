"""Banded range join: "events within a time window of each other" — expressed
as a bucketed EQUI-join, not a theta join.

Spark plans a raw ``ON a.user = b.user AND b.ts BETWEEN a.ts-w AND a.ts+w``
as an equi-join on user followed by a per-user pair filter — quadratic in the
hottest user's event count. The bucketed formulation maps timestamps to
window-sized buckets and equi-joins on (user, bucket) with the probe side
exploded to its 3 adjacent buckets, then applies the exact band filter:
shuffle is keyed by (user, bucket), per-key work is bounded by events-per-
bucket² and the fixed 3× fan-out, and no pair outside adjacent buckets is
ever materialized. This is the standard interval-bucketing trick the
range-join literature (and e.g. Databricks' range-join hints) formalizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from songs_etl_spark.plans._util import t
from songs_etl_spark.plans.registry import register

#: Band half-width in microseconds (5 minutes).
_W_US = 5 * 60 * 1_000_000


@register(
    "range_join_error_clicks",
    doc="banded range join via interval bucketing (equi-join; no theta-join pair scan)",
    oracle=f"""
        SELECT e.event_id AS error_id,
               e.user_id,
               COUNT(c.event_id) AS n_clicks_5min,
               MIN(ABS(epoch_us(c.ts) - epoch_us(e.ts))) AS min_gap_us
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id
         AND epoch_us(c.ts) BETWEEN epoch_us(e.ts) - {_W_US} AND epoch_us(e.ts) + {_W_US}
        GROUP BY e.event_id, e.user_id
    """,
)
def range_join_error_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every error event: how many clicks the same user made within ±5
    minutes, and the closest gap. Left-outer band semantics (errors with no
    nearby click keep count 0 / NULL gap)."""
    events = t(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", us.alias("e_us")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", us.alias("c_us")
    )
    # Build side: each click lands in its own bucket. Probe side: each error
    # probes its bucket and both neighbors, so any |gap| <= W pair shares a
    # (user, bucket) key.
    clicks_b = clicks.withColumn("bucket", (F.col("c_us") / _W_US).cast("bigint"))
    errors_b = errors.withColumn(
        "bucket",
        F.explode(
            F.array(
                (F.col("e_us") / _W_US).cast("bigint") - 1,
                (F.col("e_us") / _W_US).cast("bigint"),
                (F.col("e_us") / _W_US).cast("bigint") + 1,
            )
        ),
    )
    pairs = errors_b.join(clicks_b, ["user_id", "bucket"]).filter(
        (F.col("c_us") >= F.col("e_us") - _W_US) & (F.col("c_us") <= F.col("e_us") + _W_US)
    )
    matched = pairs.groupBy("error_id", "user_id").agg(
        F.count("click_id").alias("n_clicks_5min"),
        F.min(F.abs(F.col("c_us") - F.col("e_us"))).alias("min_gap_us"),
    )
    # Left-outer completion: errors with no in-band click.
    return (
        errors.select("error_id", "user_id")
        .join(matched, ["error_id", "user_id"], "left")
        .select(
            "error_id",
            "user_id",
            F.coalesce("n_clicks_5min", F.lit(0)).alias("n_clicks_5min"),
            "min_gap_us",
        )
    )


# ---------------------------------------------------------------------------
# Interval × interval overlap join (time-grid bucketing)
# ---------------------------------------------------------------------------

#: Grid cell width in microseconds (6 hours). Chosen at the scale of the
#: SHORTEST campaign so a campaign covers O(1) cells and a session covers
#: len/G + 1 — replication stays a small constant for both relations.
_GRID_US = 6 * 3_600 * 1_000_000

#: 2024-01-01 00:00:00 UTC in epoch microseconds — the testdata events
#: table spans January 2024 (TESTDATA.md); campaign windows are pure
#: integer date math off this anchor so both engines derive bit-identical
#: interval bounds with zero timestamp-semantics risk.
_JAN1_US = 1_704_067_200 * 1_000_000
_H_US = 3_600 * 1_000_000

#: Campaign channels: (name, n_windows, start_offset_us, period_us, length_us).
#: Daily windows, 6-hour windows offset by 3h (NOT aligned to the grid — the
#: overlap predicate must do real work), and week-long windows that span 28
#: grid cells each (exercises multi-cell replication + canonical-cell dedup).
_CHANNELS = (
    ("daily", 31, 0, 24 * _H_US, 24 * _H_US),
    ("quarter", 124, 3 * _H_US, 6 * _H_US, 6 * _H_US),
    ("weekly", 5, 0, 7 * 24 * _H_US, 7 * 24 * _H_US),
)


def _session_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User sessions (30-minute-inactivity rule, the ``user_sessionization``
    semantics) as closed intervals (user_id, s0, s1) in epoch micros — the
    left relation of the interval-join family."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts") <= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTE"),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    return (
        flagged.withColumn("session_id", F.sum("new_session").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("s0"),
            F.max(F.unix_micros("ts")).alias("s1"),
        )
    )


def _campaign_relation(spark: SparkSession) -> DataFrame:
    """The deterministic campaign-window relation (channel, c0, c1) — one
    tiny spark.range per channel, unioned; pure integer date math mirrors
    ``_campaign_sql`` bit-for-bit."""
    chans = None
    for name, n, off, period, length in _CHANNELS:
        ch = spark.range(n).select(
            F.lit(name).alias("channel"),
            (F.lit(_JAN1_US + off) + F.col("id") * F.lit(period)).alias("c0"),
            (F.lit(_JAN1_US + off + length) + F.col("id") * F.lit(period)).alias("c1"),
        )
        chans = ch if chans is None else chans.unionByName(ch)
    return chans


def _campaign_sql() -> str:
    parts = [
        f"""SELECT '{name}' AS channel,
                   {_JAN1_US + off} + i * {period} AS c0,
                   {_JAN1_US + off + length} + i * {period} AS c1
            FROM range(0, {n}) t(i)"""
        for (name, n, off, period, length) in _CHANNELS
    ]
    return " UNION ALL ".join(parts)


@register(
    "interval_overlap_sessions",
    doc="interval x interval overlap join: sessions x campaign windows via time-grid bucketing (equi-join on grid cell, exact overlap predicate, canonical-cell dedup — no range cross product)",
    oracle=f"""
        WITH numbered AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                 <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
                FROM events
            )
        ), sessions AS (
            SELECT user_id, MIN(epoch_us(ts)) AS s0, MAX(epoch_us(ts)) AS s1
            FROM numbered GROUP BY user_id, session_id
        ), campaigns AS (
            {_campaign_sql()}
        )
        SELECT c.channel,
               c.c0 AS campaign_us,
               COUNT(s.s0) AS n_sessions,
               CAST(COUNT(DISTINCT s.user_id) AS BIGINT) AS n_users,
               -- CASE guard: DuckDB's LEAST/GREATEST SKIP NULLs (unlike a
               -- null-propagating subtraction), so an unmatched left-join
               -- row would otherwise contribute a phantom c1-c0 overlap
               CAST(COALESCE(SUM(CASE WHEN s.s0 IS NULL THEN NULL
                                      ELSE LEAST(s.s1, c.c1) - GREATEST(s.s0, c.c0) END), 0) AS BIGINT) AS overlap_us
        FROM campaigns c
        LEFT JOIN sessions s
          ON s.s0 < c.c1 AND s.s1 >= c.c0
        GROUP BY c.channel, c.c0
    """,
)
def interval_overlap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join — the temporal join shape the as-of
    family (points vs points) and ``range_join_error_clicks`` (points vs
    bands) don't cover: two INTERVAL relations joined on overlap.

    Left relation: user sessions (30-minute-inactivity sessionization, the
    ``user_sessionization`` rule) as closed intervals ``[s0, s1]`` in epoch
    micros. Right relation: campaign windows — three deterministic channels
    (daily / 6-hour-offset / weekly) built by pure integer date math, so
    both engines derive identical bounds — as half-open ``[c0, c1)``.
    Overlap predicate: ``s0 < c1 AND s1 >= c0``.

    Scale plan (the reason this is not a theta join): each interval is
    exploded to the 6-hour grid cells it covers (sessions:
    ``floor(s0/G)..floor(s1/G)``; campaigns: ``floor(c0/G)..floor((c1-1)/G)``
    — half-open end), the join is an EQUI-join on cell, and the exact
    overlap predicate filters within cells. A pair sharing k cells would
    match k times; instead of a dedup shuffle, each pair is counted at ONE
    canonical cell — ``floor(greatest(s0, c0) / G)`` — which provably lies
    in both intervals whenever they overlap (the later start point is
    inside both), so every overlapping pair survives exactly once and no
    ``distinct`` is needed. Replication is bounded (len/G + 1 cells per
    interval), per-cell work is sessions-per-cell × campaigns-per-cell, and
    the campaign side is catalog-sized at any data scale, so the grid join
    broadcasts. DuckDB's oracle uses its native inequality join (IEJoin) on
    the raw overlap predicate — the strongest cross-check for an operator
    Spark has no built-in for.

    The reference has no interval joins (SURVEY §2.3 note); this is the
    training-pipeline extension for sessions × campaigns / shifts ×
    incidents workloads.
    """
    sessions = _session_intervals(spark, sf_dir)
    campaigns = _campaign_relation(spark)

    g = F.lit(_GRID_US)
    camp_cells = campaigns.withColumn(
        "cell",
        F.explode(
            F.sequence(
                (F.col("c0") / g).cast("bigint"),
                ((F.col("c1") - 1) / g).cast("bigint"),
            )
        ),
    )
    sess_cells = sessions.withColumn(
        "cell",
        F.explode(
            F.sequence(
                (F.col("s0") / g).cast("bigint"),
                (F.col("s1") / g).cast("bigint"),
            )
        ),
    )

    pairs = sess_cells.join(F.broadcast(camp_cells), "cell").filter(
        (F.col("s0") < F.col("c1"))
        & (F.col("s1") >= F.col("c0"))
        # canonical-cell dedup: count the pair only at the cell holding the
        # later of the two starts (inside both intervals iff they overlap)
        & (F.col("cell") == (F.greatest("s0", "c0") / g).cast("bigint"))
    )
    matched = pairs.groupBy("channel", "c0").agg(
        F.count("*").alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.least("s1", "c1") - F.greatest("s0", "c0")).alias("overlap_us"),
    )
    return (
        campaigns.join(matched, ["channel", "c0"], "left")
        .select(
            "channel",
            F.col("c0").alias("campaign_us"),
            F.coalesce("n_sessions", F.lit(0)).alias("n_sessions"),
            F.coalesce("n_users", F.lit(0)).cast("bigint").alias("n_users"),
            F.coalesce("overlap_us", F.lit(0)).cast("bigint").alias("overlap_us"),
        )
    )


#: Allen classification CASE — purely on endpoint order, identical text on
#: both engines (the branch ORDER is part of the semantics: degenerate
#: single-event sessions hit the earliest matching branch deterministically).
#: Restricted to touch-or-overlap pairs, so 'before'/'after' never appear.
_ALLEN_CASE = """CASE
                   WHEN s1 = c0 AND s0 < c0 THEN 'meets'
                   WHEN s0 = c1 AND s1 > c1 THEN 'met_by'
                   WHEN s0 = c0 AND s1 = c1 THEN 'equals'
                   WHEN s0 = c0 AND s1 < c1 THEN 'starts'
                   WHEN s0 = c0 AND s1 > c1 THEN 'started_by'
                   WHEN s1 = c1 AND s0 > c0 THEN 'finishes'
                   WHEN s1 = c1 AND s0 < c0 THEN 'finished_by'
                   WHEN s0 > c0 AND s1 < c1 THEN 'during'
                   WHEN s0 < c0 AND s1 > c1 THEN 'contains'
                   WHEN s0 < c0 THEN 'overlaps'
                   ELSE 'overlapped_by'
               END"""


@register(
    "interval_allen_relations",
    doc="Allen interval-algebra classification of session x campaign pairs "
    "(meets/overlaps/starts/during/... + inverses) via the same time-grid "
    "equi-join as interval_overlap_sessions, grid widened one cell so "
    "touching (meets/met_by) pairs share a cell too",
    oracle=f"""
        WITH numbered AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                 <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
                FROM events
            )
        ), sessions AS (
            SELECT user_id, MIN(epoch_us(ts)) AS s0, MAX(epoch_us(ts)) AS s1
            FROM numbered GROUP BY user_id, session_id
        ), campaigns AS (
            {_campaign_sql()}
        )
        SELECT c.channel,
               {_ALLEN_CASE} AS relation,
               COUNT(*) AS n_pairs
        FROM campaigns c
        JOIN sessions s
          ON s.s0 <= c.c1 AND s.s1 >= c.c0
        GROUP BY 1, 2
    """,
)
def interval_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify every touching-or-overlapping session × campaign pair into
    its Allen interval relation (Allen 1983: meets / overlaps / starts /
    during / finishes / equals and their inverses) and count pairs per
    (channel, relation) — the interval-join follow-up every temporal
    warehouse asks once plain overlap exists ("how many sessions were
    fully inside the window vs merely clipped its edge?").

    Same scale plan as ``interval_overlap_sessions``: intervals explode to
    covering 6-hour grid cells, EQUI-join on cell, exact predicate, each
    pair counted once at its canonical cell. Two deltas: (1) the predicate
    is touch-or-overlap (``s0 <= c1 AND s1 >= c0``) so boundary 'meets' /
    'met_by' pairs qualify, and the campaign side therefore explodes one
    cell further (to floor(c1/G) inclusive, not the half-open
    floor((c1-1)/G)); (2) the canonical cell is floor(greatest(s0,c0)/G),
    which lies in BOTH expanded ranges whenever greatest(start) <=
    least(end) — exactly the touch-or-overlap condition — so the no-dedup
    argument carries over unchanged. Classification is a pure CASE on
    endpoint comparisons (branch order is deliberate and identical on
    both engines — degenerate single-event sessions resolve
    deterministically); counts are exact integers. The DuckDB oracle runs
    its native inequality join on the raw predicate — the classification
    itself is never derived from the grid."""
    sessions = _session_intervals(spark, sf_dir)
    campaigns = _campaign_relation(spark)
    g = F.lit(_GRID_US)
    camp_cells = campaigns.withColumn(
        "cell",
        F.explode(
            F.sequence(
                (F.col("c0") / g).cast("bigint"),
                (F.col("c1") / g).cast("bigint"),
            )
        ),
    )
    sess_cells = sessions.withColumn(
        "cell",
        F.explode(
            F.sequence(
                (F.col("s0") / g).cast("bigint"),
                (F.col("s1") / g).cast("bigint"),
            )
        ),
    )
    pairs = sess_cells.join(F.broadcast(camp_cells), "cell").filter(
        (F.col("s0") <= F.col("c1"))
        & (F.col("s1") >= F.col("c0"))
        & (F.col("cell") == (F.greatest("s0", "c0") / g).cast("bigint"))
    )
    return (
        pairs.select("channel", F.expr(_ALLEN_CASE).alias("relation"))
        .groupBy("channel", "relation")
        .agg(F.count("*").alias("n_pairs"))
    )
