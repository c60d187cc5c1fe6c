"""As-of join query surface (operators/temporal.py) with DuckDB's native
ASOF JOIN as the oracle — the strongest possible cross-check for an operator
Spark has no built-in for."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from songs_etl_spark.operators.temporal import asof_join
from songs_etl_spark.plans._util import fmt_ts, t
from songs_etl_spark.plans.registry import register


@register(
    "asof_click_attribution",
    doc="as-of join: latest prior click attached to each purchase (union+window, 1 shuffle)",
    oracle="""
        SELECT p.user_id,
               epoch_us(p.ts) AS purchase_us,
               p.event_id AS purchase_id,
               c.event_id AS asof_event_id,
               epoch_us(c.ts) AS asof_us,
               c.value AS asof_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution: each purchase gets the same user's most recent prior (or
    same-instant) click; purchases with no prior click keep NULLs.
    Timestamps are compared/emitted as epoch microseconds (the testdata's
    nanos are truncated to micros identically by both engines —
    sources/catalog.py)."""
    events = t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        partition_cols=["user_id"],
        ts_col="ts",
        payload_cols=["event_id", "value", "click_ts"],
    )
    return joined.select(
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        "purchase_id",
        F.col("asof_event_id"),
        F.unix_micros("asof_click_ts").alias("asof_us"),
        F.col("asof_value"),
    )


@register(
    "sliding_window_event_rate",
    doc="overlapping (sliding) event-time windows: 1 h span / 15 min slide — "
    "each event lands in 4 windows; tumbling twin is streaming_hourly_events",
    oracle="""
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM (
            SELECT time_bucket(INTERVAL 15 MINUTE, ts) - i.i * INTERVAL 15 MINUTE AS ws,
                   event_type, value
            FROM events
            CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) i
        )
        GROUP BY 1, 2
    """,
)
def sliding_window_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation via the built-in ``F.window(span, slide)``
    generator: Spark expands each event to its 4 covering epoch-aligned
    windows map-side (a bounded explode — amplification = span/slide, fixed
    at plan time), then one hash aggregation keyed by (window, event_type).
    At 100 TB this is the canonical rate/trend plan: no self-join, no range
    join — amplification then partial aggregation, all inside codegen. The
    oracle derives the same 4 window starts per event arithmetically
    (time_bucket minus i·slide)."""
    from songs_etl_spark.plans._util import dec2, fmt_ts, money

    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), dec2(F.sum(money("value"))).alias("sum_value"))
        .select(
            fmt_ts(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "linear_attribution_clicks",
    doc="multi-touch attribution: each purchase's value split equally over "
    "the user's clicks in the prior 24 h, integer-cent shares with the "
    "remainder to the earliest touch (exact, no float apportioning)",
    oracle="""
        WITH p AS (
            SELECT event_id AS pe, user_id AS p_user, ts AS pts,
                   CAST(ROUND(CAST(value AS DECIMAL(18,4)) * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT event_id AS ce, user_id AS c_user, ts AS cts
            FROM events WHERE event_type = 'click'
        ),
        touches AS (
            SELECT p.pe, p.cents, c.ce, c.cts,
                   ROW_NUMBER() OVER (PARTITION BY p.pe ORDER BY c.cts, c.ce) AS rk,
                   COUNT(*) OVER (PARTITION BY p.pe) AS n
            FROM p JOIN c ON p.p_user = c.c_user
                         AND c.cts <= p.pts
                         AND c.cts > p.pts - INTERVAL 24 HOUR
        ),
        shares AS (
            SELECT ce,
                   cents // n + CASE WHEN rk = 1 THEN cents - n * (cents // n) ELSE 0 END
                       AS share_cents
            FROM touches
        )
        SELECT ce AS click_event_id,
               COUNT(*) AS n_purchases,
               CAST(SUM(share_cents) AS BIGINT) AS attributed_cents
        FROM shares GROUP BY ce
    """,
)
def linear_attribution_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution (the generalization of the as-of
    join's last-touch rule): every click in the 24 h before a purchase
    shares its value equally. Shares are integer cents — floor division per
    touch, remainder to the earliest click — so the totals are exact
    integers; no float split can drift between engines.

    Plan: equi-join on user_id with the time predicate applied in-join
    (per-user touch lists are small; a time-bucketed band join — see
    plans/ranges.py — is the drop-in when a single user's history outgrows
    a partition), two window functions keyed by purchase, one final
    aggregation keyed by click."""
    ev = t(spark, sf_dir, "events")
    from songs_etl_spark.plans._util import money
    from pyspark.sql.window import Window

    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pe"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        F.round(money("value") * 100).cast("bigint").alias("cents"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("ce"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    touches = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") > F.col("pts") - F.expr("INTERVAL 24 HOURS")),
    ).select("pe", "cents", "ce", "cts")
    w = Window.partitionBy("pe")
    touches = touches.select(
        "pe",
        "cents",
        "ce",
        F.row_number().over(w.orderBy("cts", "ce")).alias("rk"),
        F.count("*").over(w).alias("n"),
    )
    # integer DIV, not floor(double-div): exact at any cents magnitude
    # (both sides positive, so truncation == floor == DuckDB's //)
    base = F.expr("cents DIV n")
    share = base + F.when(
        F.col("rk") == 1, F.col("cents") - F.col("n") * base
    ).otherwise(F.lit(0))
    return (
        touches.select("ce", share.alias("share_cents"))
        .groupBy(F.col("ce").alias("click_event_id"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("share_cents").cast("bigint").alias("attributed_cents"),
        )
    )


@register(
    "time_to_convert_quantiles",
    doc="conversion-latency distribution: each purchase paired with the "
    "user's latest prior view (as-of), exact quantiles of the deltas",
    oracle="""
        WITH pairs AS (
            SELECT epoch_us(p.ts) - epoch_us(v.ts) AS delta_us
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
              ON p.user_id = v.user_id AND p.ts >= v.ts
        )
        SELECT COUNT(*) AS n_conversions,
               quantile_cont(delta_us, 0.25) AS p25_us,
               quantile_cont(delta_us, 0.50) AS p50_us,
               quantile_cont(delta_us, 0.90) AS p90_us,
               CAST(MAX(delta_us) AS BIGINT) AS max_us
        FROM pairs
    """,
)
def time_to_convert_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long users take from last view to purchase: the as-of pairing
    (operators/temporal.py — union + one window pass, no range explosion)
    yields one integer-microsecond delta per converting purchase; exact
    interpolated quantiles summarize the distribution (integer inputs, so
    the interpolation is the same single IEEE chain in both engines). The
    inner ASOF uses the strict pairing (purchases with no prior view drop
    out — DuckDB's inner ASOF semantics, mirrored by filtering the left
    join)."""
    events = t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("ts").alias("view_ts")
    )
    paired = asof_join(
        purchases,
        views,
        partition_cols=["user_id"],
        ts_col="ts",
        payload_cols=["view_ts"],
    ).filter(F.col("asof_view_ts").isNotNull())
    deltas = paired.select(
        (F.unix_micros("ts") - F.unix_micros("asof_view_ts")).alias("delta_us")
    )
    return deltas.agg(
        F.count("*").alias("n_conversions"),
        F.percentile("delta_us", F.lit(0.25)).alias("p25_us"),
        F.percentile("delta_us", F.lit(0.50)).alias("p50_us"),
        F.percentile("delta_us", F.lit(0.90)).alias("p90_us"),
        F.max("delta_us").cast("bigint").alias("max_us"),
    )


@register(
    "linear_interp_gap_fill",
    doc="time-series resample: linear interpolation between bracketing "
    "observations (the two-sided twin of locf_gap_fill)",
    oracle="""
        WITH g AS (
            SELECT event_id, user_id, ts, epoch_us(ts) AS x,
                   CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v
            FROM events
        ),
        f AS (
            SELECT event_id, user_id, ts, x, v,
                   LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
                   LAST_VALUE(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS)
                       OVER wp AS px,
                   FIRST_VALUE(v IGNORE NULLS) OVER wn AS nv,
                   FIRST_VALUE(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS)
                       OVER wn AS nx
            FROM g
            WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   wn AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        )
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
               CASE WHEN v IS NOT NULL THEN v
                    WHEN pv IS NULL OR nv IS NULL THEN NULL
                    WHEN nx = px THEN pv
                    ELSE pv + (nv - pv) * (CAST(x - px AS DOUBLE)
                                           / CAST(nx - px AS DOUBLE))
               END AS value_interp
        FROM f
    """,
)
def linear_interp_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided gap repair: every third reading is nulled, then rebuilt by
    linear interpolation between the bracketing observations per user —
    the resample-and-interpolate idiom of sensor/metric pipelines
    (pandas ``interpolate(method='time')``), restated as two
    ignore-nulls windows over one per-user sort:

    - ``last(value ignorenulls)`` over the strictly-preceding frame and
      ``first(...)`` over the strictly-following frame fetch the
      bracketing (x, v) pairs without a self-join;
    - the interpolant ``pv + (nv − pv) · (x − px)/(nx − px)`` runs on
      epoch-microsecond integers and raw parquet doubles — one fixed
      expression chain, bit-identical on both engines (registry rule 3).

    Leading/trailing gaps (one bracket missing) stay NULL; same-timestamp
    brackets (nx = px) degenerate to the previous value. Spark plans both
    window frames over a SINGLE user-partition sort (one shuffle), the
    same scale shape as locf_gap_fill."""
    ev = t(spark, sf_dir, "events")
    x = F.unix_micros("ts")
    v = F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(F.col("value"))
    base = ev.select(
        "event_id", "user_id", "ts", x.alias("x"), v.alias("v")
    )
    wp = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    xv = F.when(F.col("v").isNotNull(), F.col("x"))
    f = base.select(
        "event_id",
        "user_id",
        "ts",
        "x",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(xv, ignorenulls=True).over(wp).alias("px"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(xv, ignorenulls=True).over(wn).alias("nx"),
    )
    frac = (F.col("x") - F.col("px")).cast("double") / (
        F.col("nx") - F.col("px")
    ).cast("double")
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .when(F.col("nx") == F.col("px"), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return f.select(
        "event_id",
        "user_id",
        fmt_ts("ts").alias("ts"),
        interp.alias("value_interp"),
    )


#: Strict-funnel windows in microseconds: click within 30 min of a PRIOR
#: view, purchase within 24 h of a prior qualified click.
_FUNNEL_VC_US = 30 * 60 * 1_000_000
_FUNNEL_CP_US = 24 * 3600 * 1_000_000


@register(
    "strict_funnel_windowed",
    tags=("bcast-const",),
    doc="time-ordered funnel with per-step conversion windows "
    "(view → click ≤ 30 min → purchase ≤ 24 h), as-of union+window plan "
    "vs EXISTS oracle",
    oracle=f"""
        WITH uv AS (
            SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
        ),
        qc AS (
            SELECT DISTINCT c.user_id, epoch_us(c.ts) AS us
            FROM events c
            WHERE c.event_type = 'click' AND EXISTS (
                SELECT 1 FROM events v
                WHERE v.user_id = c.user_id AND v.event_type = 'view'
                  AND epoch_us(v.ts) < epoch_us(c.ts)
                  AND epoch_us(c.ts) <= epoch_us(v.ts) + {_FUNNEL_VC_US}
            )
        ),
        qp AS (
            SELECT DISTINCT p.user_id
            FROM events p
            WHERE p.event_type = 'purchase' AND EXISTS (
                SELECT 1 FROM qc
                WHERE qc.user_id = p.user_id
                  AND qc.us < epoch_us(p.ts)
                  AND epoch_us(p.ts) <= qc.us + {_FUNNEL_CP_US}
            )
        )
        SELECT (SELECT COUNT(*) FROM uv) AS n_view_users,
               (SELECT COUNT(DISTINCT user_id) FROM qc) AS n_click_users,
               (SELECT COUNT(*) FROM qp) AS n_purchase_users,
               CAST((SELECT COUNT(DISTINCT user_id) FROM qc) AS DOUBLE)
                   / CAST((SELECT COUNT(*) FROM uv) AS DOUBLE) AS vc_rate,
               CAST((SELECT COUNT(*) FROM qp) AS DOUBLE)
                   / CAST((SELECT COUNT(DISTINCT user_id) FROM qc) AS DOUBLE)
                   AS cp_rate
    """,
)
def strict_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel product analytics actually bills by: conversions must be
    TIME-ORDERED and inside per-step windows — a click counts only within
    30 minutes AFTER a view, a purchase only within 24 hours after such a
    click (funnel_view_click_purchase is the presence-based cousin). The
    naive formulation is a per-user inequality join per step (the EXISTS
    oracle); the scale plan is the as-of union+window trick, applied
    twice:

    1. union views+clicks, one per-user sort, carry ``last(view ts)``
       over the strictly-preceding frame (ties break with the candidate
       BEFORE the antecedent, so an equal-timestamp view never qualifies
       — the window restates the strict ``<`` exactly); a click is
       qualified iff that as-of gap ≤ 30 min;
    2. the same shape over qualified-clicks+purchases with the 24 h
       window.

    Two sorts on the same (user, time) key — Spark reuses the partitioning
    — and never a self-join: per-user cost is O(events log events), immune
    to the hot-user quadratic blowup the EXISTS form hides. Final counts
    are exact distincts; rates are single divisions (registry rule 2)."""
    ev = t(spark, sf_dir, "events")
    us = F.unix_micros("ts")

    def asof_qualified(ante: DataFrame, cand: DataFrame, window_us: int) -> DataFrame:
        """Candidates with an antecedent strictly earlier and within
        window_us. ante/cand: (user_id, us)."""
        tagged = ante.select(
            "user_id", "us", F.lit(1).alias("is_ante")
        ).unionByName(cand.select("user_id", "us", F.lit(0).alias("is_ante")))
        # Sort candidates BEFORE antecedents at equal us (is_ante ascending):
        # the running last(ante) then reflects strictly-earlier rows only.
        w = (
            Window.partitionBy("user_id")
            .orderBy("us", "is_ante")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        ante_us = F.last(
            F.when(F.col("is_ante") == 1, F.col("us")), ignorenulls=True
        ).over(w)
        return (
            tagged.withColumn("ante_us", ante_us)
            .filter(
                (F.col("is_ante") == 0)
                & F.col("ante_us").isNotNull()
                & (F.col("us") <= F.col("ante_us") + window_us)
            )
            .select("user_id", "us")
        )

    views = ev.filter(F.col("event_type") == "view").select("user_id", us.alias("us"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", us.alias("us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("us")
    )
    qc = asof_qualified(views, clicks, _FUNNEL_VC_US).distinct()
    qp = asof_qualified(qc, purchases, _FUNNEL_CP_US)
    nv = views.select("user_id").distinct().agg(F.count("*").alias("n_view_users"))
    nc = qc.agg(F.count_distinct("user_id").alias("n_click_users"))
    np_ = qp.agg(F.count_distinct("user_id").alias("n_purchase_users"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_view_users",
            "n_click_users",
            "n_purchase_users",
            (
                F.col("n_click_users").cast("double")
                / F.col("n_view_users").cast("double")
            ).alias("vc_rate"),
            (
                F.col("n_purchase_users").cast("double")
                / F.col("n_click_users").cast("double")
            ).alias("cp_rate"),
        )
    )


@register(
    "ushape_attribution_clicks",
    doc="position-based (U-shaped) multi-touch attribution: 40% to first "
    "touch, 40% to last, 20% split over middles — exact integer-cent "
    "shares with deterministic remainder placement",
    oracle="""
        WITH p AS (
            SELECT event_id AS pe, user_id AS p_user, ts AS pts,
                   CAST(ROUND(CAST(value AS DECIMAL(18,4)) * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT event_id AS ce, user_id AS c_user, ts AS cts
            FROM events WHERE event_type = 'click'
        ),
        touches AS (
            SELECT p.pe, p.cents, c.ce,
                   ROW_NUMBER() OVER (PARTITION BY p.pe ORDER BY c.cts, c.ce) AS rk,
                   COUNT(*) OVER (PARTITION BY p.pe) AS n
            FROM p JOIN c ON p.p_user = c.c_user
                         AND c.cts <= p.pts
                         AND c.cts > p.pts - INTERVAL 24 HOUR
        ),
        shares AS (
            SELECT ce,
                   CASE
                     WHEN n = 1 THEN cents
                     WHEN n = 2 THEN CASE WHEN rk = 1
                                          THEN cents - cents // 2
                                          ELSE cents // 2 END
                     WHEN rk = 1 OR rk = n THEN (cents * 40) // 100
                     ELSE (cents - 2 * ((cents * 40) // 100)) // (n - 2)
                          + CASE WHEN rk = 2
                                 THEN (cents - 2 * ((cents * 40) // 100))
                                      - (n - 2) * ((cents - 2 * ((cents * 40) // 100))
                                                   // (n - 2))
                                 ELSE 0 END
                   END AS share_cents
            FROM touches
        )
        SELECT ce AS click_event_id,
               COUNT(*) AS n_purchases,
               CAST(SUM(share_cents) AS BIGINT) AS attributed_cents
        FROM shares GROUP BY ce
    """,
)
def ushape_attribution_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based attribution — the marketing standard between
    last-touch (asof_click_attribution) and linear
    (linear_attribution_clicks): the first and last touch in the 24 h
    pre-purchase window each earn 40%, the middle touches split the
    remaining 20%. All shares are integer cents with an explicit
    remainder policy (single touch takes all; two touches split 50/50
    with the odd cent to the first; the middle pool's floor-division
    remainder goes to the earliest middle), so per-purchase shares sum
    exactly to the purchase value and both engines agree bit-for-bit.

    Same scale shape as the linear variant: one user-keyed equi-join
    with the time band applied in-join, two windows per purchase key,
    one final click-keyed aggregation."""
    from pyspark.sql.window import Window

    from songs_etl_spark.plans._util import money

    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pe"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        F.round(money("value") * 100).cast("bigint").alias("cents"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("ce"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    w = Window.partitionBy("pe")
    touches = (
        p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") > F.col("pts") - F.expr("INTERVAL 24 HOURS")),
        )
        .select("pe", "cents", "ce", "cts")
        .select(
            "pe",
            "cents",
            "ce",
            F.row_number().over(w.orderBy("cts", "ce")).alias("rk"),
            F.count("*").over(w).alias("n"),
        )
    )
    forty = F.expr("(cents * 40) DIV 100")
    pool = F.col("cents") - 2 * forty
    mid_base = F.expr("(cents - 2 * ((cents * 40) DIV 100)) DIV (n - 2)")
    share = (
        F.when(F.col("n") == 1, F.col("cents"))
        .when(
            F.col("n") == 2,
            F.when(F.col("rk") == 1, F.col("cents") - F.expr("cents DIV 2")).otherwise(
                F.expr("cents DIV 2")
            ),
        )
        .when((F.col("rk") == 1) | (F.col("rk") == F.col("n")), forty)
        .otherwise(
            mid_base
            + F.when(
                F.col("rk") == 2, pool - (F.col("n") - 2) * mid_base
            ).otherwise(F.lit(0))
        )
    )
    return (
        touches.select("ce", share.alias("share_cents"))
        .groupBy(F.col("ce").alias("click_event_id"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("share_cents").cast("bigint").alias("attributed_cents"),
        )
    )


@register(
    "burstiness_interevent",
    doc="temporal burstiness: per-user inter-event-gap statistics and the "
    "Goh-Barabasi burstiness index (sigma-mu)/(sigma+mu) from exact "
    "widened moment sums",
    oracle="""
        WITH gaps AS (
            SELECT user_id,
                   (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)))
                   // 1000000 AS g
            FROM events
            QUALIFY g IS NOT NULL
        ),
        s AS (
            SELECT user_id, COUNT(*) AS n,
                   SUM(CAST(g AS HUGEINT)) AS sx,
                   SUM(CAST(g AS HUGEINT) * CAST(g AS HUGEINT)) AS sxx
            FROM gaps GROUP BY user_id
            HAVING COUNT(*) >= 10
        )
        SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
               CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
                   AS mean_gap_s,
               (SQRT(CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                     - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                       * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) / CAST(n AS DOUBLE)
                - CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
               / (SQRT(CAST(n AS DOUBLE) * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                       - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                         * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) / CAST(n AS DOUBLE)
                  + CAST(CAST(sx AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE))
                   AS burstiness
        FROM s
    """,
)
def burstiness_interevent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is a user's activity Poisson-like or bursty? The Goh–Barabási
    burstiness index B = (σ−μ)/(σ+μ) over inter-event gaps: B→−1 for
    metronomic traffic, ≈0 for Poisson, →+1 for extreme burst trains —
    the standard discriminator for bot traffic and scraping sessions.

    Gaps are whole seconds (floor division of exact epoch-microsecond
    differences — identical on both engines); σ and μ derive from
    per-user (n, Σx, Σx²) in int128/decimal(38) (Σx² passes 2^63 for
    long-horizon users), converted through VARCHAR on the oracle side
    (the _D correct-rounding rule) and evaluated in one fixed double
    chain (population σ via the n·Σx²−(Σx)² form, sqrt IEEE-exact).
    Users need ≥10 gaps. One LAG window + one aggregation, both on the
    user-keyed partitioning — the sessionization shape."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            (
                (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
            ).alias("dus"),
        )
        .filter(F.col("dus").isNotNull())
        .select("user_id", F.expr("dus DIV 1000000").cast("decimal(38,0)").alias("g"))
    )
    s = (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("g").alias("sx"),
            F.sum(F.col("g") * F.col("g")).alias("sxx"),
        )
        .filter(F.col("n") >= 10)
    )
    nd = F.col("n").cast("double")
    sx, sxx = F.col("sx").cast("double"), F.col("sxx").cast("double")
    mu = sx / nd
    sd = F.sqrt(nd * sxx - sx * sx) / nd
    return s.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_gaps"),
        mu.alias("mean_gap_s"),
        ((sd - mu) / (sd + mu)).alias("burstiness"),
    )


@register(
    "ohlc_daily_value",
    doc="time-series downsampling to OHLC bars: per-day open/high/low/"
    "close/volume of the event value stream, deterministic first/last "
    "from one per-day sort",
    oracle="""
        WITH ranked AS (
            SELECT CAST(ts AS DATE) AS d, value, event_id,
                   ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE)
                                      ORDER BY ts, event_id) AS rn_a,
                   ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE)
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events
        )
        SELECT strftime(d, '%Y-%m-%d') AS day,
               COUNT(*) AS n_events,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
               CAST(MAX(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS high,
               CAST(MIN(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS low,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS volume
        FROM ranked
        GROUP BY d
    """,
)
def ohlc_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling — the finance-standard downsample (candlestick
    bars), equally the shape of any metric rollup that must keep FIRST
    and LAST observations, not just extremes. Open and close come from
    ascending/descending row_numbers over ONE per-day sort keyed by
    (ts, event_id) — a total order, so same-timestamp ties break
    identically on both engines; high/low compare exact decimals;
    volume is an exact decimal sum presented as double (registry
    rule 1). The grouped aggregation reuses the window's day-keyed
    partitioning, so the whole bar build is a single shuffle."""
    ev = t(spark, sf_dir, "events")
    from songs_etl_spark.plans._util import dec2, fmt_date, money
    from pyspark.sql.window import Window

    d = F.to_date("ts")
    wa = Window.partitionBy(d).orderBy("ts", "event_id")
    wd = Window.partitionBy(d).orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ranked = ev.select(
        d.alias("d"),
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return ranked.groupBy("d").agg(
        F.count("*").alias("n_events"),
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        dec2(F.max(money("value"))).alias("high"),
        dec2(F.min(money("value"))).alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        dec2(F.sum(money("value"))).alias("volume"),
    ).select(
        fmt_date("d").alias("day"),
        "n_events",
        "open",
        "high",
        "low",
        "close",
        "volume",
    )


#: Time-decay attribution: weights halve every 12 hours of age, expressed as
#: exact integer micro-weights (1e6 >> halvings) so shares stay rational
#: with power-of-two denominators — no float pow anywhere.
_DECAY_HALF_LIFE_US = 12 * 3600 * 1_000_000
_DECAY_W0 = 1_000_000


@register(
    "timedecay_attribution_clicks",
    doc="time-decay multi-touch attribution: click weights halve per 12 h "
    "of age before the purchase, exact integer micro-weights and "
    "largest-remainder cent allocation",
    oracle=f"""
        WITH p AS (
            SELECT event_id AS pe, user_id AS p_user, ts AS pts,
                   CAST(ROUND(CAST(value AS DECIMAL(18,4)) * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT event_id AS ce, user_id AS c_user, ts AS cts
            FROM events WHERE event_type = 'click'
        ),
        touches AS (
            SELECT p.pe, p.cents, c.ce,
                   {_DECAY_W0} >> CAST((epoch_us(p.pts) - epoch_us(c.cts))
                                       // {_DECAY_HALF_LIFE_US} AS INT) AS w,
                   ROW_NUMBER() OVER (PARTITION BY p.pe ORDER BY c.cts, c.ce) AS rk
            FROM p JOIN c ON p.p_user = c.c_user
                         AND c.cts <= p.pts
                         AND c.cts > p.pts - INTERVAL 24 HOUR
        ),
        floored AS (
            SELECT pe, ce, cents, rk,
                   (cents * w) // SUM(w) OVER (PARTITION BY pe) AS f
            FROM touches
        ),
        shares AS (
            SELECT ce,
                   f + CASE WHEN rk = 1
                            THEN cents - SUM(f) OVER (PARTITION BY pe)
                            ELSE 0 END AS share_cents
            FROM floored
        )
        SELECT ce AS click_event_id,
               COUNT(*) AS n_purchases,
               CAST(SUM(share_cents) AS BIGINT) AS attributed_cents
        FROM shares GROUP BY ce
    """,
)
def timedecay_attribution_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay attribution — the fourth member of the attribution
    family (last-touch / linear / U-shape already registered): clicks
    closer to the purchase earn exponentially more, half-life 12 h.
    Weights are EXACT integers — 1e6 right-shifted by the whole number of
    half-lives of age — so per-touch shares are floor divisions of exact
    products, and the floor-loss remainder goes to the earliest touch
    (largest-remainder style), making every purchase's shares sum exactly
    to its cents. No float pow, no drift.

    Plan shape: the family's standard — one user-keyed equi-join with
    the 24 h band in-join, one per-purchase weight-sum aggregation
    joined back, one final click-keyed rollup. The remainder term is a
    second per-purchase aggregate (sum of floored shares), computed in
    the same keyed pass on the Spark side via a window."""
    from pyspark.sql.window import Window

    from songs_etl_spark.plans._util import money

    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pe"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        F.round(money("value") * 100).cast("bigint").alias("cents"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("ce"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    touches = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") > F.col("pts") - F.expr("INTERVAL 24 HOURS")),
    ).select(
        "pe",
        "cents",
        "ce",
        F.expr(
            f"shiftright({_DECAY_W0}, cast((unix_micros(pts) - unix_micros(cts))"
            f" DIV {_DECAY_HALF_LIFE_US} as int))"
        ).alias("w"),
        F.col("cts").alias("cts"),
    )
    wp = Window.partitionBy("pe")
    touches = touches.select(
        "pe",
        "cents",
        "ce",
        "w",
        F.row_number().over(wp.orderBy("cts", "ce")).alias("rk"),
        F.sum("w").over(wp).alias("tw"),
    )
    base = F.expr("(cents * w) DIV tw")
    touches = touches.withColumn("floored", base).withColumn(
        "floor_sum", F.sum("floored").over(wp)
    )
    share = F.col("floored") + F.when(
        F.col("rk") == 1, F.col("cents") - F.col("floor_sum")
    ).otherwise(F.lit(0))
    return (
        touches.select("ce", share.alias("share_cents"))
        .groupBy(F.col("ce").alias("click_event_id"))
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("share_cents").cast("bigint").alias("attributed_cents"),
        )
    )


@register(
    "pattern_view_purchase_no_click",
    doc="MATCH_RECOGNIZE-style sequence pattern: view -> purchase with NO "
    "click in between (per user, event-time order) — the negative-"
    "condition pattern windows express that plain funnels can't",
    oracle="""
        WITH ev AS (
            SELECT user_id, event_id, ts, event_type
            FROM events WHERE event_type IN ('view', 'click', 'purchase')
        ), flagged AS (
            SELECT user_id, event_id, ts, event_type,
                   MAX(CASE WHEN event_type = 'view' THEN ts END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS last_view_ts,
                   MAX(CASE WHEN event_type = 'click' THEN ts END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS last_click_ts
            FROM ev
        )
        SELECT user_id,
               COUNT(*) AS n_purchases,
               COUNT(*) FILTER (
                   WHERE last_view_ts IS NOT NULL
                     AND (last_click_ts IS NULL OR last_click_ts < last_view_ts)
               ) AS direct_purchases
        FROM flagged
        WHERE event_type = 'purchase'
        GROUP BY user_id
    """,
)
def pattern_view_purchase_no_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: of their purchases, how many were 'direct' — preceded by a
    view with no click between (the pattern `VIEW (^CLICK)* PURCHASE` in
    MATCH_RECOGNIZE terms). The negative condition rewrites to two running
    MAX-timestamp windows over the (ts, event_id)-ordered stream: a
    purchase is direct iff last_view exists and last_click (if any) is
    OLDER than last_view — no self-join, no per-row scan-back.

    Exactness: timestamps compare as native values inside one engine each;
    only integer counts cross the engine boundary. The (ts, event_id)
    total order pins window frames under ties.

    Scale shape: one hash shuffle by user, one sort per partition, both
    windows share the frame — the sessionization plan shape; pattern depth
    adds running-MAX columns, not passes."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    last_click = F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w)
    flagged = ev.select(
        "user_id",
        "event_type",
        last_view.alias("last_view_ts"),
        last_click.alias("last_click_ts"),
    ).filter(F.col("event_type") == "purchase")
    direct = F.col("last_view_ts").isNotNull() & (
        F.col("last_click_ts").isNull()
        | (F.col("last_click_ts") < F.col("last_view_ts"))
    )
    return flagged.groupBy("user_id").agg(
        F.count("*").alias("n_purchases"),
        F.count(F.when(direct, 1)).alias("direct_purchases"),
    )


@register(
    "time_weighted_avg_value",
    doc="time-weighted average (TWAP-style) of each user's event value held "
    "as a step function between events — Σ value·duration / Σ duration over "
    "exact integer cents × milliseconds, the metric plain AVG gets wrong "
    "whenever observations are unevenly spaced",
    oracle="""
        WITH seq AS (
            SELECT user_id,
                   CAST(ROUND(CAST(value AS DECIMAL(18,4)) * 100) AS BIGINT) AS cents,
                   epoch_ms(ts) AS t,
                   LEAD(epoch_ms(ts))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t_next
            FROM events WHERE event_type = 'purchase'
        )
        SELECT user_id,
               COUNT(*) AS n_segments,
               CAST(SUM(t_next - t) AS BIGINT) AS span_ms,
               CAST(SUM(CAST(cents AS HUGEINT) * (t_next - t)) AS DOUBLE)
                   / CAST(SUM(t_next - t) AS DOUBLE) / 100 AS twap_value
        FROM seq WHERE t_next IS NOT NULL AND t_next > t
        GROUP BY user_id
    """,
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-function time average: each purchase's value 'holds' until the
    user's next purchase; the average weights each value by its holding
    duration (segments with zero duration — simultaneous events — drop, as
    does the unbounded last segment). Σ cents·ms accumulates in
    DECIMAL(38,0) (Spark) / HUGEINT (oracle): a single cents·duration
    product can reach 2³²·2⁴¹ = 2⁷³, past bigint, so the per-row product
    and the sum are both lifted to 128-bit fixed point; Σ ms stays an exact
    bigint. The quotient is then one double chain (registry rule 2).

    Plan: one user-keyed window (lead) + one hash aggregation — the same
    two-stage shape as sessionization. This is the uneven-sampling-correct
    aggregate behind TWAP pricing, average inventory, and mean concurrent
    load."""
    from songs_etl_spark.plans._util import money

    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cents = F.round(money("value") * 100).cast("bigint")
    tsec = F.unix_millis(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        cents.alias("cents"),
        tsec.alias("t"),
        F.lead(tsec).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull() & (F.col("t_next") > F.col("t")))
    dur = F.col("t_next") - F.col("t")
    return seq.groupBy("user_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(dur).cast("bigint").alias("span_ms"),
        (
            F.sum(F.col("cents").cast("decimal(38,0)") * dur).cast("double")
            / F.sum(dur).cast("double")
            / 100
        ).alias("twap_value"),
    )


@register(
    "ab_funnel_conversion_lift",
    doc="experiment readout: users hash-split into A/B arms, per-arm "
    "view→purchase funnel conversion (purchase strictly after first view) "
    "and the B/A lift — the integer-count companion to ab_test_welch_t's "
    "value test",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 25, 8))
                             AS BIGINT) % 100 < 50 THEN 'A' ELSE 'B' END AS arm,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
                   MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
            FROM events GROUP BY user_id
        ), flags AS (
            SELECT arm,
                   first_view IS NOT NULL AS viewed,
                   first_view IS NOT NULL AND last_purchase IS NOT NULL
                       AND last_purchase > first_view AS converted
            FROM per_user
        )
        SELECT COUNT(*) FILTER (WHERE arm = 'A') AS n_users_a,
               COUNT(*) FILTER (WHERE arm = 'B') AS n_users_b,
               COUNT(*) FILTER (WHERE arm = 'A' AND viewed) AS n_viewers_a,
               COUNT(*) FILTER (WHERE arm = 'B' AND viewed) AS n_viewers_b,
               COUNT(*) FILTER (WHERE arm = 'A' AND converted) AS n_converted_a,
               COUNT(*) FILTER (WHERE arm = 'B' AND converted) AS n_converted_b,
               CAST(COUNT(*) FILTER (WHERE arm = 'A' AND converted) AS DOUBLE)
                   / NULLIF(CAST(COUNT(*) FILTER (WHERE arm = 'A' AND viewed) AS DOUBLE), 0)
                   AS conv_rate_a,
               CAST(COUNT(*) FILTER (WHERE arm = 'B' AND converted) AS DOUBLE)
                   / NULLIF(CAST(COUNT(*) FILTER (WHERE arm = 'B' AND viewed) AS DOUBLE), 0)
                   AS conv_rate_b,
               (CAST(COUNT(*) FILTER (WHERE arm = 'B' AND converted) AS DOUBLE)
                   / NULLIF(CAST(COUNT(*) FILTER (WHERE arm = 'B' AND viewed) AS DOUBLE), 0))
               / NULLIF(CAST(COUNT(*) FILTER (WHERE arm = 'A' AND converted) AS DOUBLE)
                   / NULLIF(CAST(COUNT(*) FILTER (WHERE arm = 'A' AND viewed) AS DOUBLE), 0), 0)
                   AS lift_b_over_a
        FROM flags
    """,
)
def ab_funnel_conversion_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment funnel readout: deterministic 50/50 arm assignment by
    user-id content hash (the hash_split_train_test coin — reproducible,
    never rand()), per-arm view→purchase conversion where conversion
    requires a purchase STRICTLY after the user's first view, and the B/A
    rate lift. One per-user aggregation (min view ts, max purchase ts —
    the funnel reduces to two extrema, no ordering pass), one global
    conditional aggregation; all counts exact integers, rates and lift one
    fixed division chain (registry rule 2). Significance testing of the
    value metric lives in ab_test_welch_t; this is the rate half every
    experiment dashboard pairs with it."""
    from songs_etl_spark.plans.sampling import hash_bucket

    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "last_purchase"
        ),
    )
    arm = F.when(hash_bucket(F.col("user_id")) < 50, "A").otherwise("B")
    flags = per_user.select(
        arm.alias("arm"),
        F.col("first_view").isNotNull().alias("viewed"),
        (
            F.col("first_view").isNotNull()
            & F.col("last_purchase").isNotNull()
            & (F.col("last_purchase") > F.col("first_view"))
        ).alias("converted"),
    )

    def cnt(cond: F.Column) -> F.Column:
        return F.count(F.when(cond, 1))

    a, b = F.col("arm") == "A", F.col("arm") == "B"
    agg = flags.agg(
        cnt(a).alias("n_users_a"),
        cnt(b).alias("n_users_b"),
        cnt(a & F.col("viewed")).alias("n_viewers_a"),
        cnt(b & F.col("viewed")).alias("n_viewers_b"),
        cnt(a & F.col("converted")).alias("n_converted_a"),
        cnt(b & F.col("converted")).alias("n_converted_b"),
    )
    # NULLIF zero-guards: an empty or zero-conversion arm yields NULL rate /
    # lift on BOTH engines (bare double division would give NULL here but
    # inf/NaN in DuckDB's default IEEE mode — an oracle divergence on
    # degenerate corpora).
    rate_a = F.col("n_converted_a").cast("double") / F.nullif(
        F.col("n_viewers_a").cast("double"), F.lit(0.0)
    )
    rate_b = F.col("n_converted_b").cast("double") / F.nullif(
        F.col("n_viewers_b").cast("double"), F.lit(0.0)
    )
    return agg.select(
        "*",
        rate_a.alias("conv_rate_a"),
        rate_b.alias("conv_rate_b"),
        (rate_b / F.nullif(rate_a, F.lit(0.0))).alias("lift_b_over_a"),
    )


#: Bounded-staleness attribution window (1 hour, in ms / us).
_ASOF_TOL_MS = 3_600_000


@register(
    "asof_tolerance_attribution",
    doc="as-of join with TOLERANCE: latest prior click attached to each "
    "purchase only when it happened within the last hour — the "
    "bounded-staleness feature-lookup semantic (kdb wj / pandas "
    "merge_asof tolerance), same single-shuffle union+window plan",
    oracle=f"""
        SELECT p.user_id,
               epoch_us(p.ts) AS purchase_us,
               p.event_id AS purchase_id,
               CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= CAST({_ASOF_TOL_MS} AS BIGINT) * 1000
                    THEN c.event_id END AS asof_event_id,
               CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= CAST({_ASOF_TOL_MS} AS BIGINT) * 1000
                    THEN epoch_us(c.ts) END AS asof_us,
               CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= CAST({_ASOF_TOL_MS} AS BIGINT) * 1000
                    THEN c.value END AS asof_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_tolerance_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``asof_click_attribution`` with a 1-hour staleness bound: a click
    older than the window no longer explains the purchase and the
    attribution stays NULL. Correctness rides one observation — the latest
    prior click is also the CLOSEST prior click, so masking the as-of
    result when it is stale is exactly "no click within the window"; the
    oracle applies the identical mask to DuckDB's native ASOF join. The
    operator seam is asof_join(tolerance_ms=...) — one extra carried
    timestamp column and a per-row mask on the same single-shuffle plan,
    which is why bounded-staleness lookups (feature stores, SCD reads with
    TTL) should never be written as range joins: this emits |left| rows,
    a range join emits |left| x |matches in window|."""
    events = t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        partition_cols=["user_id"],
        ts_col="ts",
        payload_cols=["event_id", "value", "click_ts"],
        tolerance_ms=_ASOF_TOL_MS,
    )
    return joined.select(
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        "purchase_id",
        F.col("asof_event_id"),
        F.unix_micros("asof_click_ts").alias("asof_us"),
        F.col("asof_value"),
    )


#: Forward-attribution window (10 minutes, ms / us): how quickly a user
#: acts after an error.
_ASOF_FWD_TOL_MS = 600_000


@register(
    "asof_forward_next_click",
    doc="FORWARD as-of join (pandas merge_asof direction='forward'): the "
    "EARLIEST following click within 10 min attached to each error event "
    "— same single-shuffle union+window plan with the sort flipped; "
    "oracle is DuckDB's native ASOF on l.ts <= r.ts with the same mask",
    oracle=f"""
        SELECT e.user_id,
               epoch_us(e.ts) AS error_us,
               e.event_id AS error_id,
               CASE WHEN epoch_us(c.ts) - epoch_us(e.ts) <= CAST({_ASOF_FWD_TOL_MS} AS BIGINT) * 1000
                    THEN c.event_id END AS next_event_id,
               CASE WHEN epoch_us(c.ts) - epoch_us(e.ts) <= CAST({_ASOF_FWD_TOL_MS} AS BIGINT) * 1000
                    THEN epoch_us(c.ts) - epoch_us(e.ts) END AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id AND e.ts <= c.ts
    """,
)
def asof_forward_next_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Follow-up attribution — "what did the user do right after the
    error": each error event gets the same user's EARLIEST following (or
    same-instant) click, masked NULL when it is more than 10 minutes out.
    The forward direction is the mirror of the backward as-of: the union
    sort puts left rows before right rows at equal timestamps and the
    carry reads the FOLLOWING frame with first(ignorenulls) — still ONE
    shuffle, |left| output rows (operators/temporal.asof_join
    direction='forward'). The earliest following row is the closest
    following row, so masking it when late is exactly "no match within
    the window" — the same argument as the backward tolerance. Oracle:
    DuckDB's native ASOF JOIN accepts l.ts <= r.ts (forward, inclusive)
    with the identical mask applied."""
    events = t(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("error_id")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        errors,
        clicks,
        partition_cols=["user_id"],
        ts_col="ts",
        payload_cols=["event_id", "click_ts"],
        tolerance_ms=_ASOF_FWD_TOL_MS,
        direction="forward",
    )
    return joined.select(
        "user_id",
        F.unix_micros("ts").alias("error_us"),
        "error_id",
        F.col("asof_event_id").alias("next_event_id"),
        (F.unix_micros("asof_click_ts") - F.unix_micros("ts")).alias("gap_us"),
    )


@register(
    "asof_nearest_click",
    doc="NEAREST as-of join (pandas merge_asof direction='nearest'): the "
    "closest click on either side within 1 h attached to each purchase, "
    "ties to the prior click — both carries share one shuffle; oracle = "
    "DuckDB backward ASOF + forward ASOF with the identical pick rule",
    oracle=f"""
        WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        c AS (SELECT * FROM events WHERE event_type = 'click'),
        b AS (
            SELECT p.event_id AS pid, p.user_id, p.ts,
                   c.event_id AS bid, c.ts AS bts
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        ),
        f AS (
            SELECT p.event_id AS pid, c.event_id AS fid, c.ts AS fts
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts <= c.ts
        ),
        m AS (
            SELECT b.pid, b.user_id, b.ts,
                   CASE WHEN epoch_us(b.ts) - epoch_us(b.bts)
                             <= CAST({_ASOF_TOL_MS} AS BIGINT) * 1000
                        THEN b.bid END AS bid,
                   CASE WHEN epoch_us(b.ts) - epoch_us(b.bts)
                             <= CAST({_ASOF_TOL_MS} AS BIGINT) * 1000
                        THEN epoch_us(b.ts) - epoch_us(b.bts) END AS bgap,
                   CASE WHEN epoch_us(f.fts) - epoch_us(b.ts)
                             <= CAST({_ASOF_TOL_MS} AS BIGINT) * 1000
                        THEN f.fid END AS fid,
                   CASE WHEN epoch_us(f.fts) - epoch_us(b.ts)
                             <= CAST({_ASOF_TOL_MS} AS BIGINT) * 1000
                        THEN epoch_us(f.fts) - epoch_us(b.ts) END AS fgap
            FROM b JOIN f USING (pid)
        )
        SELECT user_id,
               epoch_us(ts) AS purchase_us,
               pid AS purchase_id,
               CASE WHEN bid IS NOT NULL AND (fid IS NULL OR bgap <= fgap)
                    THEN bid ELSE fid END AS nearest_event_id,
               CASE WHEN bid IS NOT NULL AND (fid IS NULL OR bgap <= fgap)
                    THEN -bgap ELSE fgap END AS signed_gap_us
        FROM m
    """,
)
def asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third as-of direction: each purchase gets the CLOSEST click of
    the same user within 1 h on either side (exact ties go to the prior
    click — pandas merge_asof 'nearest' semantics), with the signed gap
    (negative = click preceded the purchase). One shuffle computes both
    the backward and the forward carry over the same union (two
    in-partition sorts, no second Exchange); the pick is a per-row
    expression. The oracle composes DuckDB's native backward and forward
    ASOF joins with the identical mask+pick arithmetic in epoch
    microseconds — all integer."""
    events = t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        partition_cols=["user_id"],
        ts_col="ts",
        payload_cols=["event_id", "click_ts"],
        tolerance_ms=_ASOF_TOL_MS,
        direction="nearest",
    )
    return joined.select(
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        "purchase_id",
        F.col("asof_event_id").alias("nearest_event_id"),
        (F.unix_micros("asof_click_ts") - F.unix_micros("ts")).alias("signed_gap_us"),
    )


@register(
    "asof_strict_prior_click",
    doc="STRICT backward as-of join (pandas merge_asof "
    "allow_exact_matches=False): the latest click STRICTLY before each "
    "purchase — same-instant clicks excluded by a sort-key change on the "
    "same single-shuffle plan; oracle is DuckDB's native ASOF on p.ts > c.ts",
    oracle="""
        SELECT p.user_id,
               epoch_us(p.ts) AS purchase_us,
               p.event_id AS purchase_id,
               c.event_id AS prior_event_id,
               epoch_us(c.ts) AS prior_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts > c.ts
    """,
)
def asof_strict_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fourth pandas ``merge_asof`` axis: ``allow_exact_matches=False``.
    A same-instant click must NOT explain the purchase (the causal-lookup
    discipline — training-data feature joins use strict as-ofs to rule out
    leakage from events recorded at the label's own timestamp). The
    operator seam is ``asof_join(allow_exact_matches=False)``: right rows
    get a sort key AFTER left rows at equal timestamps, so same-instant
    matches fall outside the expanding carry frame — no new shuffle, no
    new plan shape; DuckDB's ASOF accepts the strict inequality natively
    (``p.ts > c.ts``), making the oracle exact."""
    events = t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases,
        clicks,
        partition_cols=["user_id"],
        ts_col="ts",
        payload_cols=["event_id", "click_ts"],
        allow_exact_matches=False,
    )
    return joined.select(
        "user_id",
        F.unix_micros("ts").alias("purchase_us"),
        "purchase_id",
        F.col("asof_event_id").alias("prior_event_id"),
        F.unix_micros("asof_click_ts").alias("prior_us"),
    )


#: Attribution windows swept (seconds): 1 min / 10 min / 1 h / 1 day.
_ATTR_WINDOWS_S = (60, 600, 3600, 86400)


@register(
    "attribution_window_sweep",
    doc="attribution TUNING: purchase conversion counts under four "
    "candidate attribution windows from ONE backward as-of pass — the "
    "table that picks the production window",
    oracle=f"""
        WITH g AS (
            SELECT p.event_id,
                   epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        )
        {" UNION ALL ".join(
            f'''SELECT CAST({w} AS BIGINT) AS window_s,
               CAST(SUM(CASE WHEN gap_us <= CAST({w} AS BIGINT) * 1000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
               COUNT(*) AS n_purchases,
               CAST(SUM(CASE WHEN gap_us <= CAST({w} AS BIGINT) * 1000000
                             THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS rate
            FROM g'''
            for w in _ATTR_WINDOWS_S
        )}
    """,
)
def attribution_window_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How long should the click->purchase attribution window be? The
    latest prior click is the closest prior click, so conversion under ANY
    window is a predicate on the single backward as-of gap — one union+
    window pass scores every purchase once, and the four candidate windows
    are conditional aggregates over the same gap column (vs four reruns).
    Exactness: gaps are integer microseconds; rate is one double chain
    from exact integer sums per window."""
    events = t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    g = asof_join(
        purchases, clicks, ["user_id"], "ts", ["click_ts"]
    ).select(
        (F.unix_micros("ts") - F.unix_micros("asof_click_ts")).alias("gap_us")
    )
    aggs = [F.count("*").alias("n")]
    for i, w in enumerate(_ATTR_WINDOWS_S):
        aggs.append(
            F.sum(
                F.when(
                    F.col("gap_us") <= F.lit(w * 1_000_000).cast("bigint"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(f"a{i}")
        )
    row = g.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({w} AS BIGINT), a{i}, n, CAST(a{i} AS DOUBLE) / n"
        for i, w in enumerate(_ATTR_WINDOWS_S)
    )
    return row.select(
        F.expr(
            f"stack({len(_ATTR_WINDOWS_S)}, {stack_args}) "
            "AS (window_s, n_attributed, n_purchases, rate)"
        )
    )
