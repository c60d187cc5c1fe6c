"""The reference's star-schema pipeline (SURVEY.md §3 entry point 3) restated
on the driver's testdata analogs: customer≈dim_user, orders≈playlists,
lineitem≈track-add facts, part≈dim_track, supplier≈dim_artist.

These queries exercise the same operator chain as cf_transform/main.py —
dimension dedup + surrogate keys (A2/C2), the J2-J5 natural→surrogate star
join, full-row dedup (A1), literal platform attach (C4), final projection
(P4) — with the *intended* semantics (dims retain natural keys; SURVEY.md
§2.3). The nested-JSON form of the same pipeline runs over landing documents
in songs_etl_spark.operators.star (pytest-covered; no flat testdata analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from songs_etl_spark.functions.keys import surrogate_key
from songs_etl_spark.plans._util import fmt_ts, t
from songs_etl_spark.plans.registry import register


@register(
    "platform_constant",
    doc="C3 constant relation (VALUES) + C4 literal column",
    oracle="SELECT 'spotify' AS dim_platform_id, 'Spotify' AS name, (SELECT COUNT(*) FROM orders) AS n_orders",
)
def platform_constant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The static dim_platform relation
    (cf_create_plataforms_dimension/main.py:67-74) joined with a real count
    so the query touches the engine, not just literals."""
    n = t(spark, sf_dir, "orders").agg(F.count("*").alias("n_orders"))
    return n.select(
        F.lit("spotify").alias("dim_platform_id"),
        F.lit("Spotify").alias("name"),
        "n_orders",
    )


@register(
    "dim_supplier_surrogate",
    doc="A2 distinct-name dim build + C2 deterministic surrogate key",
    oracle="""
        SELECT substr(sha256(s_name), 1, 10) AS dim_artist_id, s_name AS name
        FROM (SELECT DISTINCT s_name FROM supplier)
    """,
)
def dim_supplier_surrogate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dim_artist build (cf_create_artists_dimension/main.py:85-86):
    SELECT DISTINCT name → surrogate key. sha2-based key replaces the
    reference's nondeterministic CUID (see functions/keys.py)."""
    return (
        t(spark, sf_dir, "supplier")
        .select("s_name")
        .distinct()
        .select(
            surrogate_key("s_name").alias("dim_artist_id"),
            F.col("s_name").alias("name"),
        )
    )


@register(
    "fact_build_star",
    doc="the full transform pipeline: J2-J5 star join + A1 dedup + C1/C4 + P4",
    bench=True,
    oracle="""
        SELECT DISTINCT
               'spotify' AS dim_platform_id,
               substr(sha256(CAST(o.o_orderkey AS VARCHAR)), 1, 10) AS dim_playlist_id,
               substr(sha256(CAST(l.l_suppkey  AS VARCHAR)), 1, 10) AS dim_artist_id,
               substr(sha256(CAST(l.l_partkey  AS VARCHAR)), 1, 10) AS dim_track_id,
               substr(sha256(CAST(o.o_custkey  AS VARCHAR)), 1, 10) AS dim_user_id,
               strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS added_at,
               FALSE AS is_local
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def fact_build_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cf_transform/main.py:98-176 restated: dims carry (surrogate, natural
    key), the fact joins natural→surrogate (J2-J5, broadcast dims), attaches
    the platform literal (C4), dedups full rows (A1), and projects the
    declared fact columns in order (P4).

    Scale: part/supplier dims broadcast; the lineitem⋈orders join is the only
    repartitioning join — at 100 TB both sides would be bucketed by orderkey.
    Surrogate keys are pure expressions of the natural key, so the dim joins
    carry no extra state beyond the dim rows themselves.

    The A1 full-row dedup is pushed BELOW the projection: every output column
    is a function of the natural tuple (l_orderkey, l_partkey, l_suppkey) —
    o_custkey/o_orderdate via the orders join, the rest literals — so
    distinct-on-naturals ≡ distinct-on-final-rows, and the dedup shuffle
    moves three bigints per row instead of five ~10-char strings plus a
    timestamp, before any hashing work. The surrogate sha2s are then computed
    once per *distinct* tuple, and playlist/user keys once per *order* on the
    small side of the join rather than once per lineitem.
    """
    li = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey")
        .dropDuplicates()
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        surrogate_key("o_orderkey").alias("dim_playlist_id"),
        surrogate_key("o_custkey").alias("dim_user_id"),
        fmt_ts("o_orderdate").alias("added_at"),
    )
    # No .distinct() on the dim keys: p_partkey / s_suppkey are the PRIMARY
    # keys of part/supplier (unique by schema at every SF), so a distinct is
    # an Exchange plus two aggregates that provably reduce nothing — and a
    # duplicate would already break the left joins below (fact fan-out).
    dim_track = t(spark, sf_dir, "part").select(
        surrogate_key("p_partkey").alias("dim_track_id"), "p_partkey"
    )
    dim_artist = t(spark, sf_dir, "supplier").select(
        surrogate_key("s_suppkey").alias("dim_artist_id"), "s_suppkey"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dim_track), li.l_partkey == dim_track.p_partkey, "left")
        .join(F.broadcast(dim_artist), li.l_suppkey == dim_artist.s_suppkey, "left")
        .select(
            F.lit("spotify").alias("dim_platform_id"),
            "dim_playlist_id",
            F.col("dim_artist_id"),
            F.col("dim_track_id"),
            "dim_user_id",
            "added_at",
            F.lit(False).alias("is_local"),
        )
    )


@register(
    "explode_roundtrip",
    doc="F4 re-nest (collect_list(struct)) ∘ F1-F3 explode = identity",
    oracle="""
        SELECT l_orderkey, COUNT(*) AS n_lines, CAST(SUM(l_linenumber) AS BIGINT) AS sum_linenumber
        FROM lineitem GROUP BY l_orderkey
    """,
)
def explode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-nest lineitems into per-order array<struct> documents (the
    extractor's nesting, cf_extract/main.py:286-291), then explode back
    (the dim builders' flatten, F1-F3) — proving unnest∘re-nest = id.
    The oracle is the identity-equivalent direct aggregation."""
    li = t(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_linenumber", "l_partkey")).alias("lines")
    )
    exploded = nested.select("l_orderkey", F.explode("lines").alias("line"))
    return exploded.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.sum("line.l_linenumber").alias("sum_linenumber"),
    )
