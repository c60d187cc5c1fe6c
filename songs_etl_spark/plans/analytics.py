"""Statistical analytics over the warehouse tables: distributed group-wise
OLS regression, Markov transition matrices, incremental materialized-view
maintenance, and z-score anomaly detection.

The reference's analytics ceiling is GROUP BY + daily full refresh
(cf_load/main.py WRITE_TRUNCATE); these queries are the scale-era
restatements: every statistic here decomposes into *exact, mergeable,
map-side-combining sums* (n, Σx, Σy, Σxy, Σx², Σy² as decimal/bigint), so a
single aggregation shuffle computes regression lines, variances, and
anomaly thresholds over arbitrarily large groups — no per-group sort, no
second pass over raw data, no double-precision accumulation order
dependence.

Determinism: raw measures are cast to exact decimal *before* aggregation
(registry policy rule 1); the closed-form algebra then runs on doubles
obtained from those exact sums (correctly-rounded conversions), a fixed
per-row expression chain both engines evaluate identically (rule 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from songs_etl_spark.plans._util import dec2, money, qty, t, ts_lit
from songs_etl_spark.plans.registry import register

#: DuckDB twin of the correctly-rounded decimal→double conversion (see
#: _util.dec2): string round-trip, because DuckDB's direct DECIMAL→DOUBLE
#: divides the int128 payload in double arithmetic and can land 1 ulp off
#: once the scaled integer exceeds 2^53.
_D = "CAST(CAST({} AS VARCHAR) AS DOUBLE)"


@register(
    "regression_price_by_qty",
    doc="group-wise OLS (slope/intercept/r2) from exact mergeable sums — "
    "single-shuffle distributed regression",
    oracle=f"""
        WITH s AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   {_D.format("SUM(CAST(l_quantity AS BIGINT))")} AS sx,
                   {_D.format("SUM(CAST(l_extendedprice AS DECIMAL(18,4)))")} AS sy,
                   {_D.format("SUM(CAST(l_quantity AS BIGINT) * CAST(l_extendedprice AS DECIMAL(19,4)))")} AS sxy,
                   {_D.format("SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))")} AS sxx,
                   {_D.format("SUM(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4)))")} AS syy
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               CAST(n AS BIGINT) AS n,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
               (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept,
               ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                   / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
        FROM s
    """,
)
def regression_price_by_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares fit of extendedprice against quantity per returnflag.

    The moment sums (n, Σx, Σy, Σxy, Σx², Σy²) are exact — bigint for the
    integer-valued quantity, DECIMAL(18,4)-derived for price — so they merge
    associatively across any partitioning (one shuffle, map-side partials).
    The closed-form slope/intercept/r² algebra then runs on doubles converted
    from those exact sums: every operation is a fixed IEEE expression both
    engines evaluate identically, so the output needs no rounding. This is
    the 100 TB regression shape: state per group is six numbers, never the
    points. (Spark's builtin regr_slope/regr_avgx accumulate *doubles* whose
    partial-merge order varies run to run — the decimal-moment formulation
    trades them for reproducibility at identical cost.)
    """
    li = t(spark, sf_dir, "lineitem")
    x = qty("l_quantity")
    y = money("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_raw"),
        F.sum(x).alias("sx_raw"),
        F.sum(y).alias("sy_raw"),
        F.sum(x * y).alias("sxy_raw"),
        F.sum(x * x).alias("sxx_raw"),
        F.sum(y * y).alias("syy_raw"),
    )
    n, sx, sy, sxy, sxx, syy = (
        dec2(F.col(c)) for c in ("n_raw", "sx_raw", "sy_raw", "sxy_raw", "sxx_raw", "syy_raw")
    )
    cov_n = n * sxy - sx * sy  # n² · covariance
    varx_n = n * sxx - sx * sx  # n² · variance(x)
    vary_n = n * syy - sy * sy  # n² · variance(y)
    slope = cov_n / varx_n
    return s.select(
        "l_returnflag",
        F.col("n_raw").alias("n"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        ((cov_n * cov_n) / (varx_n * vary_n)).alias("r2"),
    )


@register(
    "events_markov_transitions",
    doc="first-order Markov transition matrix over per-user event sequences "
    "(lag/lead window, single shuffle)",
    oracle="""
        WITH seq AS (
            SELECT event_type AS from_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_type
            FROM events
        ),
        cnt AS (
            SELECT from_type, to_type, COUNT(*) AS n_trans
            FROM seq WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n_trans,
               CAST(n_trans AS DOUBLE)
                   / CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        FROM cnt
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical transition probabilities between consecutive event types in
    each user's timeline (order ``ts, event_id`` — the deterministic
    tie-break). One shuffle keyed by user_id orders the sequences; the pair
    counts then aggregate map-side. The per-row probability is an exact
    bigint ratio in double — no accumulation-order dependence. At 100 TB the
    state is |event_type|² cells regardless of event count; the user_id
    shuffle is the same partitioning sessionization already pays, so the two
    plans pipeline on a shared exchange.
    """
    ev = t(spark, sf_dir, "events")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("to_type"),
    )
    cnt = (
        seq.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_trans"))
    )
    total = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        "n_trans",
        (dec2(F.col("n_trans")) / dec2(F.sum("n_trans").over(total))).alias("p"),
    )


#: Incremental-maintenance cutoff: rows at/after this instant are the
#: "late-arriving" delta batch applied to the materialized base rollup.
_ROLLUP_CUTOFF = "2024-01-25 00:00:00"


@register(
    "incremental_daily_rollup",
    doc="incremental materialized-view maintenance: delta batch merged into "
    "a base rollup ≡ full recompute (the oracle IS the full recompute)",
    oracle="""
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-maintaining daily rollup: the events table is split at a cutoff
    into the already-materialized base aggregate and a late delta batch; the
    delta is aggregated *alone* and merged into the base by key (full outer
    join, additive combine). The registry oracle is the full recompute over
    all events — passing the value hash proves merge(base, Δ) ≡ recompute.

    This is the replacement for the reference's daily WRITE_TRUNCATE full
    refresh (terraform cron + cf_load): at 100 TB you can't re-aggregate
    history per batch, but count/decimal-sum are self-mergeable, so the
    per-batch cost is O(|Δ| + |touched keys|). The merge join moves only
    *aggregate* rows (one per touched key), never raw events — a full outer
    join can't broadcast its build side, but both inputs here are already
    key-partitioned aggregates orders of magnitude smaller than the fact
    scan. Same algebra the streaming foreachBatch upsert applies
    continuously (streaming/ingest.py).
    """
    ev = t(spark, sf_dir, "events")
    cutoff = ts_lit(_ROLLUP_CUTOFF)

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
        ).agg(F.count("*").alias("n"), F.sum(money("value")).alias("sv"))

    base = rollup(ev.where(F.col("ts") < cutoff))
    delta = rollup(ev.where(F.col("ts") >= cutoff))
    merged = base.alias("b").join(
        delta.alias("d"), on=["day", "event_type"], how="full_outer"
    )
    zero = F.lit(0).cast("decimal(28,4)")
    return merged.select(
        "day",
        "event_type",
        (F.coalesce(F.col("b.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))).alias("n"),
        dec2(
            F.coalesce(F.col("b.sv"), zero) + F.coalesce(F.col("d.sv"), zero)
        ).alias("sum_value"),
    )


@register(
    "anomaly_zscore_events",
    doc="z-score outlier detection per event_type from exact moment sums "
    "(one agg + one broadcast join, no per-group sort)",
    oracle="""
        WITH s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sv,
                   CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS svv
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, e.event_id, e.value,
               (e.value - s.sv / s.n)
                   / sqrt((s.svv - s.sv * s.sv / s.n) / (s.n - 1)) AS z
        FROM events e JOIN s USING (event_type)
        WHERE abs((e.value - s.sv / s.n)
                  / sqrt((s.svv - s.sv * s.sv / s.n) / (s.n - 1))) > 3
    """,
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value lies more than 3σ from their type's mean. Mean and
    sample variance come from exact decimal moment sums (one aggregation,
    map-side combining); the tiny per-type statistics relation is broadcast
    back onto the stream-shaped scan, so the 100 TB pass is scan + broadcast
    hash join with zero additional shuffles. The per-row z expression is a
    fixed double chain over exactly-derived inputs — bit-identical across
    engines, no rounding needed.
    """
    ev = t(spark, sf_dir, "events")
    v = money("value")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n_raw"),
        F.sum(v).alias("sv_raw"),
        F.sum(v * v).alias("svv_raw"),
    )
    n, sv, svv = (dec2(F.col(c)) for c in ("n_raw", "sv_raw", "svv_raw"))
    stats = s.select(
        "event_type",
        (sv / n).alias("mean"),
        F.sqrt((svv - sv * sv / n) / (n - F.lit(1.0))).alias("std"),
    )
    joined = ev.join(F.broadcast(stats), "event_type")
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return joined.where(F.abs(z) > 3).select(
        "event_type", "event_id", "value", z.alias("z")
    )
