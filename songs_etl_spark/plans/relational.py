"""Core relational query surface: scans, joins, aggregation, windows, set ops,
safe casts — the engine's restatement of the reference's operator families
(SURVEY.md §2) on the driver's star-schema testdata, plus the grouped/sort/
window surface any real query on a star schema needs.

Scale notes are inline per query; the common posture: filters/projections are
expressed declaratively (Catalyst pushes them into the Parquet scan), small
dimensions are broadcast explicitly, and everything else is left to AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from songs_etl_spark.functions.keys import surrogate_key
from songs_etl_spark.plans._util import dec2, fmt_date, fmt_ts, money, qty, t, ts_lit
from songs_etl_spark.plans.registry import register

# ---------------------------------------------------------------------------
# Scans / projections / filters
# ---------------------------------------------------------------------------


@register(
    "scan_project_filter",
    doc="S4 table scan, P3/P4 projection, predicate pushdown",
    oracle="""
        SELECT l_orderkey, l_partkey,
               CAST(l_quantity AS BIGINT) AS quantity,
               CAST(l_extendedprice AS DOUBLE) AS price
        FROM lineitem
        WHERE l_returnflag = 'R'
    """,
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned, filter-pushed scan: .explain shows PushedFilters on
    l_returnflag and a 5-column ReadSchema — the scan never materializes the
    other 6 lineitem columns (what P3 did by hand, cf_transform/main.py:159)."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            "l_partkey",
            qty("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("price"),
        )
    )


@register(
    "coalesce_default",
    doc="P2 default-on-missing (coalesce), grouped agg",
    oracle="""
        SELECT p_brand,
               CAST(SUM(COALESCE(CASE WHEN p_size % 2 = 0 THEN NULL ELSE p_size END, 9999)) AS BIGINT) AS adj_size,
               COUNT(*) AS n
        FROM part GROUP BY p_brand
    """,
)
def coalesce_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extractor's default-on-missing (album.total_tracks → 9999,
    cf_extract/main.py:269) as coalesce over an induced-NULL column."""
    part = t(spark, sf_dir, "part")
    adj = F.coalesce(F.when(F.col("p_size") % 2 != 0, F.col("p_size")), F.lit(9999))
    return part.groupBy("p_brand").agg(
        F.sum(adj).alias("adj_size"), F.count("*").alias("n")
    )


@register(
    "distinct_segments",
    doc="A2/A3 distinct on a single column",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT name — the dimension-build dedup
    (cf_create_artists_dimension/main.py:85)."""
    return t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    doc="grouped aggregation (sum/avg/count) — TPC-H Q1 shape",
    bench=True,
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               -- VARCHAR round-trip before the double cast: DuckDB's direct
               -- DECIMAL->DOUBLE converts via int128/10^scale in double
               -- arithmetic, which is off by 1 ulp for sums past 2^53 at
               -- scale 8; parsing the exact decimal string is correctly
               -- rounded, matching Spark's BigDecimal.doubleValue.
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
               CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                             * (1 - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4))
                        * (1 + CAST(l_tax AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side partial aggregation + one shuffle on a 6-value grouping key;
    decimal arithmetic keeps the sums exact and order-independent (the whole
    query is a single WholeStageCodegen span up to the exchange)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= ts_lit("1998-09-02"))
    disc_price = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    # Re-cast the intermediate to scale 4 (exact: inputs carry ≤2 decimals,
    # so the product carries ≤4) — otherwise the 3-factor product overflows
    # precision 38 and Spark/DuckDB reduce scale differently.
    charge = disc_price.cast("decimal(18,4)") * (F.lit(1) + money("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec2(F.sum(money("l_quantity"))).alias("sum_qty"),
        dec2(F.sum(money("l_extendedprice"))).alias("sum_base_price"),
        dec2(F.sum(disc_price)).alias("sum_disc_price"),
        dec2(F.sum(charge)).alias("sum_charge"),
        (F.sum(qty("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
        (F.sum(money("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
        F.count("*").alias("count_order"),
    )


@register(
    "revenue_forecast",
    doc="scalar aggregate with range predicates — TPC-H Q6 shape",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four predicates reach the Parquet scan (PushedFilters); the agg is
    a partial+final pair with no grouping key — no data ever shuffles beyond
    one row per partition."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= ts_lit("1996-01-01"))
            & (F.col("l_shipdate") < ts_lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec2(F.sum(money("l_extendedprice") * money("l_discount"))).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@register(
    "count_distinct_by_flag",
    doc="exact COUNT(DISTINCT) (multi-column grouped)",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
)
def count_distinct_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "rollup_lineitem_status",
    doc="ROLLUP grouping sets with subtotals",
    oracle="""
        SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
               COALESCE(l_linestatus, '(all)') AS linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(qty("l_quantity")).alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "pivot_linestatus_qty",
    doc="pivot (wide aggregation)",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_f,
               CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_o
        FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_linestatus_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    pivoted = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(qty("l_quantity")))
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0)).alias("qty_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("qty_o"),
    )


# ---------------------------------------------------------------------------
# Joins (the star-join family J1-J5 + semi/anti the query surface needs)
# ---------------------------------------------------------------------------


@register(
    "star_revenue_by_nation",
    doc="J2-J5 star join (broadcast dims) + grouped agg — TPC-H Q5 shape; flagship",
    bench=True,
    oracle="""
        SELECT n.n_name AS nation,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lineitems
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name IN ('ASIA', 'EUROPE')
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n.n_name
    """,
)
def star_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship star join, written fact-first: lineitem is the STREAM
    side of every join, so the fact table is never built into a hash
    relation. (Written customer-first, the planner broadcast-built the
    600k-row lineitem side — fine by its local estimate, fatal at 100 TB
    where the fact side can never broadcast.) region/nation/supplier are
    broadcast explicitly (true dimensions at any scale); orders/customer
    are left to the planner — broadcast under the threshold locally,
    degrading to key-partitioned joins (bucketed in production) once they
    outgrow it. The date filter prunes at the orders scan before the
    join."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1998-01-01"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    revenue = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dec2(F.sum(revenue)).alias("revenue"), F.count("*").alias("n_lineitems"))
    )


@register(
    "top_orders_by_revenue",
    doc="join + agg + deterministic sort + limit — TPC-H Q3 shape",
    bench=True,
    oracle="""
        SELECT o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               o.o_orderpriority,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
)
def top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k executes as per-partition partial top-k + single-partition final
    (TakeOrderedAndProject) — no global sort materialization. Tie-broken on
    o_orderkey so the limit is deterministic across engines."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < ts_lit("1997-01-01"))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > ts_lit("1997-01-01"))
    revenue = money("l_extendedprice") * (F.lit(1) - money("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec2(F.sum(revenue)).alias("revenue"))
        .select(
            "o_orderkey",
            fmt_date("o_orderdate").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "order_priority_exists",
    doc="left-semi join (EXISTS) — TPC-H Q4 shape",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
        GROUP BY o_orderpriority
    """,
)
def order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join: the probe side never duplicates rows and
    the build side is reduced to distinct keys by Spark automatically."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1996-07-01"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "never_ordered_parts",
    doc="left-anti join (NOT EXISTS)",
    oracle="""
        SELECT p_brand, COUNT(*) AS n_parts
        FROM part p
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
        GROUP BY p_brand
    """,
)
def never_ordered_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        t(spark, sf_dir, "part")
        .join(li, F.col("p_partkey") == F.col("l_partkey"), "left_anti")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
    )


@register(
    "customer_order_histogram",
    doc="left outer join with unmatched→NULL (J2-J5 semantics) — TPC-H Q13 shape",
    oracle="""
        SELECT n_orders, COUNT(*) AS n_customers
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
            FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_custkey
        ) GROUP BY n_orders
    """,
)
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unmatched left-join rows surface as NULL o_orderkey and count as 0 —
    the reference's unmatched-lookup behavior (cf_transform/main.py:127-134)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_customer = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_customer.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


@register(
    "first_lineitem_per_order",
    doc="J1 pick-first-match join via row_number window",
    oracle="""
        WITH ranked AS (
            SELECT l_orderkey, l_partkey, CAST(l_quantity AS BIGINT) AS l_qty,
                   ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
            FROM lineitem
        )
        SELECT o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               r.l_partkey AS first_partkey,
               r.l_qty AS first_qty
        FROM orders o
        LEFT JOIN ranked r ON r.l_orderkey = o.o_orderkey AND r.rn = 1
    """,
)
def first_lineitem_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's hand-rolled first-match-wins lookup
    (cf_transform/main.py:127-134) made deterministic: an explicit
    row_number over a defined order replaces 'first encountered'. The order
    includes the projected columns (partkey, quantity) because the testdata's
    l_linenumber is not unique per order — ties must not decide the output."""
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey", "l_quantity")
    first_li = (
        t(spark, sf_dir, "lineitem")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            F.col("l_partkey").alias("first_partkey"),
            qty("l_quantity").alias("first_qty"),
        )
    )
    o = t(spark, sf_dir, "orders")
    return o.join(first_li, o.o_orderkey == first_li.l_orderkey, "left").select(
        "o_orderkey",
        fmt_date("o_orderdate").alias("orderdate"),
        "first_partkey",
        "first_qty",
    )


@register(
    "custkey_set_ops",
    doc="UNION / INTERSECT / EXCEPT (distinct set semantics)",
    oracle="""
        WITH seg AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'),
             done AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F')
        SELECT 'both' AS tag, c_custkey FROM (SELECT * FROM seg INTERSECT SELECT * FROM done)
        UNION ALL
        SELECT 'seg_only' AS tag, c_custkey FROM (SELECT * FROM seg EXCEPT SELECT * FROM done)
    """,
)
def custkey_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    seg = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "AUTOMOBILE")
        .select("c_custkey")
    )
    done = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    both = seg.intersect(done).select(F.lit("both").alias("tag"), "c_custkey")
    only = seg.exceptAll(done.intersect(seg)).distinct().select(
        F.lit("seg_only").alias("tag"), "c_custkey"
    )
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------


@register(
    "running_order_totals",
    doc="running-sum + row_number window over per-customer order history",
    oracle="""
        SELECT o_custkey,
               o_orderkey,
               ROW_NUMBER() OVER w AS order_seq,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_total
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def running_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decimal running sum over a totally-ordered frame (orderdate, orderkey
    tiebreak) — exact and deterministic. One shuffle on o_custkey; at scale
    the sort rides the same exchange (sort-based window)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("order_seq"),
        dec2(F.sum(money("o_totalprice")).over(w)).alias("running_total"),
    )


@register(
    "trailing_30d_customer_spend",
    doc="time-RANGE sliding window (rangeBetween over event time, not row frames)",
    oracle="""
        SELECT o_custkey,
               o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                          RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS trailing_30d
        FROM orders
    """,
)
def trailing_30d_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: each order sees the sum of the same
    customer's orders in the trailing 30 days — a value-based frame (all
    peers of a timestamp included), unlike the ROWS frames elsewhere. Spark's
    rangeBetween needs a numeric ordering key, so the frame runs over epoch
    seconds with a ±30-day offset — semantically identical to the oracle's
    INTERVAL RANGE. One shuffle on o_custkey, sort rides the exchange."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        fmt_date("o_orderdate").alias("orderdate"),
        dec2(F.sum(money("o_totalprice")).over(w)).alias("trailing_30d"),
    )


@register(
    "top3_orders_per_segment",
    doc="windowed top-N per group (rank + filter)",
    oracle="""
        SELECT c_mktsegment, o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS totalprice, rnk
        FROM (
            SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                      ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ) WHERE rnk <= 3
    """,
)
def top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "c_mktsegment",
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            "rnk",
        )
    )


@register(
    "user_sessionization",
    doc="sessionization: lag + gap threshold + running session ids",
    bench=True,
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM flagged
        )
        SELECT user_id,
               CAST(MAX(session_id) AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM sessions GROUP BY user_id
    """,
)
def user_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap) with two windows over one
    partitioning — Spark plans a single shuffle+sort on user_id reused by
    both. The streaming twin lives in songs_etl_spark.streaming."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts") <= F.lag("ts").over(w) + F.expr("INTERVAL 30 MINUTE"), F.lit(0)
        ).otherwise(F.lit(1)),
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(run))
    return sessions.groupBy("user_id").agg(
        F.max("session_id").cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Casts / JSON / re-nest
# ---------------------------------------------------------------------------


@register(
    "try_timestamp_coerce",
    doc="C1 string→timestamp cast with NULL-on-error (errors='coerce')",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS n_total,
               COUNT(*) - COUNT(parsed) AS n_failed,
               strftime(MIN(parsed), '%Y-%m-%d %H:%M:%S') AS min_parsed,
               strftime(MAX(parsed), '%Y-%m-%d %H:%M:%S') AS max_parsed
        FROM (
            SELECT l_returnflag,
                   TRY_CAST(CASE WHEN l_linenumber % 3 = 0 THEN 'not-a-timestamp'
                                 ELSE strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') END
                            AS TIMESTAMP) AS parsed
            FROM lineitem
        ) GROUP BY l_returnflag
    """,
)
def try_timestamp_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.to_datetime(errors='coerce') (cf_transform/main.py:171) under ANSI
    Spark: try_to_timestamp returns NULL instead of raising."""
    li = t(spark, sf_dir, "lineitem")
    raw = F.when(F.col("l_linenumber") % 3 == 0, F.lit("not-a-timestamp")).otherwise(
        fmt_ts("l_shipdate")
    )
    parsed = F.try_to_timestamp(raw, F.lit("yyyy-MM-dd HH:mm:ss"))
    return (
        li.select("l_returnflag", parsed.alias("parsed"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_total"),
            (F.count("*") - F.count("parsed")).alias("n_failed"),
            fmt_ts(F.min("parsed")).alias("min_parsed"),
            fmt_ts(F.max("parsed")).alias("max_parsed"),
        )
    )


@register(
    "json_extract_events",
    doc="C6 JSON field extraction + grouped agg over extracted key",
    oracle="""
        SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column (schema-on-read): get_json_object stays
    JVM-side; at scale prefer from_json with an explicit schema so Catalyst
    can prune the parse to the referenced fields."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            dec2(F.sum(money("value"))).alias("sum_value"),
        )
    )


@register(
    "daily_event_rollup",
    doc="time-bucketed aggregation (date_trunc tumbling windows, batch form)",
    oracle="""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
)
def daily_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            fmt_date(F.date_trunc("day", F.col("ts"))).alias("day"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), dec2(F.sum(money("value"))).alias("sum_value"))
    )


@register(
    "lineitems_per_order_renest",
    doc="F4/F5 re-nest (collect_list) rendered as deterministic string",
    oracle="""
        SELECT l_orderkey,
               STRING_AGG(l_linenumber::VARCHAR, ',' ORDER BY l_linenumber) AS linenumbers,
               COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    """,
)
def lineitems_per_order_renest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extractor's re-nesting (cf_extract/main.py:286-291) as
    collect_list; sorted + joined to a string so the comparison is
    order-insensitive-proof."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("l_linenumber")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("linenumbers"),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Conditional-aggregation / disjunctive-predicate shapes (TPC-H Q12/Q14/Q16/Q19)
# ---------------------------------------------------------------------------


@register(
    "priority_shipping_counts",
    doc="conditional aggregation inside a join (TPC-H Q12 shape): urgent vs other per linestatus",
    oracle="""
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_low
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_linestatus
    """,
)
def priority_shipping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's signature move: the CASE runs *inside* the aggregate, so one
    joined pass produces both conditional counts — no second scan, no
    self-join. The shipdate filter pushes to the lineitem scan; the join
    shuffles only surviving rows."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_lit("1996-01-01"))
        & (F.col("l_shipdate") < ts_lit("1997-01-01"))
    )
    o = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("n_high"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("n_low"),
        )
    )


@register(
    "promo_revenue_ratio",
    doc="conditional revenue ratio over a broadcast dim join (TPC-H Q14 shape)",
    oracle="""
        SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                        THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                             * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
               AS DOUBLE) AS promo_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
          AND l.l_shipdate <  TIMESTAMP '1996-09-01'
    """,
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share: both the conditional and total revenue come from
    one aggregate over the joined rows. The part side broadcasts (dim-sized);
    decimal accumulation keeps both engines' sums exact, so even a ratio of
    two large sums compares bit-for-bit after the final double division."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_lit("1996-03-01"))
        & (F.col("l_shipdate") < ts_lit("1996-09-01"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = money("l_extendedprice") * (1 - money("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (100.0 * dec2(F.sum(promo)) / dec2(F.sum(rev)))
            .cast("double")
            .alias("promo_pct")
        )
    )


@register(
    "supplier_count_by_part_attrs",
    doc="COUNT(DISTINCT) per attribute group with NOT IN exclusion (TPC-H Q16 shape)",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#15'
          AND p.p_type NOT IN ('PROMO', 'ECONOMY')
          AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 over the lineitem-as-partsupp relation: distinct suppliers per
    surviving (brand, type, size). All three predicates are dim-side and
    evaluated before the broadcast, so the fact scan joins against an
    already-filtered part list; COUNT(DISTINCT) plans as the two-level
    aggregate (partial distinct map-side, merge reduce-side)."""
    p = (
        t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#15")
            & (~F.col("p_type").isin("PROMO", "ECONOMY"))
            & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "disjunctive_bracket_revenue",
    doc="disjunctive multi-bracket join predicate (TPC-H Q19 shape)",
    oracle="""
        SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 1 AND 15)
           OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 11 AND 25
               AND l.l_quantity BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#6' AND p.p_size BETWEEN 26 AND 50
               AND l.l_quantity BETWEEN 25 AND 50)
    """,
)
def disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19's OR-of-ANDs bracket predicate. Catalyst extracts the common
    l_partkey = p_partkey conjunct so this plans as an equi-join (broadcast
    part side) with the disjunction as a post-join filter — NOT a nested-loop
    over the cross product, which is what a naive reading of the OR would
    give. Each bracket's dim-side conjuncts also derive an IN-style part
    prefilter at the scan."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty_c = F.col("l_quantity")
    bracket = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 10)
            & qty_c.between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(11, 25)
            & qty_c.between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#6")
            & F.col("p_size").between(26, 50)
            & qty_c.between(25, 50)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(
            dec2(F.sum(money("l_extendedprice") * (1 - money("l_discount")))).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "order_value_distribution",
    doc="ranking-function family: ntile quartiles + percent_rank/cume_dist extremes",
    oracle="""
        WITH ranked AS (
            SELECT o_orderpriority,
                   o_totalprice,
                   NTILE(4) OVER w AS quartile,
                   PERCENT_RANK() OVER w AS pr,
                   CUME_DIST() OVER w AS cd
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        )
        SELECT o_orderpriority, quartile,
               COUNT(*) AS n,
               CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
               CAST(MAX(o_totalprice) AS DOUBLE) AS hi,
               ROUND(MAX(pr), 6) AS max_pr,
               ROUND(MAX(cd), 6) AS max_cd
        FROM ranked GROUP BY o_orderpriority, quartile
    """,
)
def order_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking-function family in one pass: ntile bucketing,
    percent_rank, cume_dist — all three share a single window (one shuffle +
    sort per priority partition), then collapse to per-quartile stats. The
    o_orderkey tiebreak makes every rank value a pure function of the data."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return ranked.groupBy("o_orderpriority", "quartile").agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
        F.round(F.max("pr"), 6).alias("max_pr"),
        F.round(F.max("cd"), 6).alias("max_cd"),
    )


@register(
    "funnel_view_click_purchase",
    doc="funnel analysis: ordered-sequence state machine as a pure fold expression",
    oracle="""
        WITH ev12 AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS _prefix_rn
                FROM events
            ) WHERE _prefix_rn <= 12
        ), v AS (
            SELECT user_id, ts AS t1, event_id AS i1 FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM ev12 WHERE event_type = 'view'
            ) WHERE rn = 1
        ), c AS (
            SELECT user_id, ts AS t2, event_id AS i2 FROM (
                SELECT e.user_id, e.ts, e.event_id,
                       ROW_NUMBER() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
                FROM ev12 e JOIN v USING (user_id)
                WHERE e.event_type = 'click' AND (e.ts, e.event_id) > (v.t1, v.i1)
            ) WHERE rn = 1
        ), p AS (
            SELECT DISTINCT e.user_id
            FROM ev12 e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND (e.ts, e.event_id) > (c.t2, c.i2)
        )
        SELECT stage, COUNT(*) AS n_users FROM (
            SELECT u.user_id,
                   CASE WHEN p.user_id IS NOT NULL THEN 3
                        WHEN c.user_id IS NOT NULL THEN 2
                        WHEN v.user_id IS NOT NULL THEN 1
                        ELSE 0 END AS stage
            FROM (SELECT DISTINCT user_id FROM ev12) u
            LEFT JOIN v ON u.user_id = v.user_id
            LEFT JOIN c ON u.user_id = c.user_id
            LEFT JOIN p ON u.user_id = p.user_id
        ) GROUP BY stage
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How far each user progressed through view -> click -> purchase (in
    event-time order, ties broken by event_id), then users per stage.

    The sequence logic is a LEFT FOLD over each user's time-sorted event
    array — an expression-level state machine (aggregate over
    collect_list + array_sort), so the whole funnel is ONE shuffle on
    user_id with no self-joins; the oracle restates it as three correlated
    first-event joins, proving the fold's transition semantics. At 100 TB
    per-user event counts are bounded (array in memory per key), and the
    same fold extends to any ordered-pattern query — the Spark-native
    MATCH_RECOGNIZE substitute.

    The funnel runs over each user's first 12 events (an onboarding-window
    semantic) — which also makes the check discriminating: on this data the
    unlimited funnel converges to every user at stage 3, where a broken
    fold could hide."""
    ev = t(spark, sf_dir, "events")
    arr = F.slice(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))), 1, 12
    )
    stage = F.aggregate(
        arr,
        F.lit(0),
        lambda st, e: F.when((st == 0) & (e["event_type"] == "view"), 1)
        .when((st == 1) & (e["event_type"] == "click"), 2)
        .when((st == 2) & (e["event_type"] == "purchase"), 3)
        .otherwise(st),
    )
    return (
        ev.groupBy("user_id")
        .agg(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "latest_event_per_user",
    doc="argmax without a window sort: max_by on a deterministic (ts, id) ordering struct",
    oracle="""
        SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user via max_by keyed on struct(ts, event_id) — a
    single hash aggregation with a map-side partial, NO per-group sort and
    no window materialization of every row. This is the argmax shape to
    prefer at scale over ROW_NUMBER()=1 (which must sort each partition);
    the struct ordering key makes the winner deterministic under ts ties."""
    ev = t(spark, sf_dir, "events")
    ordkey = F.struct("ts", "event_id")
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", ordkey).alias("last_event_id"),
        F.max_by("event_type", ordkey).alias("last_event_type"),
        fmt_ts(F.max("ts")).alias("last_ts"),
    )


@register(
    "json_schema_parse_events",
    doc="C6 scale path: from_json with an explicit schema (single parse, pruned fields)",
    oracle="""
        SELECT (CAST(json_extract_string(props, '$.k') AS INTEGER) // 25) AS k_quartile,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
               CAST(MIN(value) AS DOUBLE) AS min_value
        FROM events
        GROUP BY 1
    """,
)
def json_schema_parse_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production twin of ``json_extract_events``: ``from_json`` with an
    explicit struct schema parses each props document ONCE into typed
    columns (get_json_object re-parses per extraction), and Catalyst prunes
    the parse to the referenced fields (json expression optimization) — the
    right shape when several keys are read at 100 TB."""
    ev = t(spark, sf_dir, "events")
    parsed = ev.select(
        "value", F.from_json("props", "k INT").alias("p")
    )
    return (
        parsed.groupBy(F.floor(F.col("p.k") / 25).alias("k_quartile"))
        .agg(
            F.count("*").alias("n"),
            F.sum("p.k").cast("bigint").alias("sum_k"),
            F.min("value").cast("double").alias("min_value"),
        )
    )


@register(
    "collection_map_functions",
    doc="map/collection function family: map build, transform_keys/values, filter, entry explode",
    oracle="""
        WITH m AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT 'FLAG_' || l_returnflag AS key, qty * 2 AS doubled
        FROM m WHERE qty > 100
    """,
)
def collection_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MapType expression family end to end: build a map from aggregated
    arrays (map_from_arrays), rewrite keys and values (transform_keys /
    transform_values), filter entries (map_filter), then explode back to
    rows for the comparison. Everything is a JVM expression over a 3-entry
    map — the oracle states the equivalent relational computation, proving
    the map algebra preserves it."""
    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(qty("l_quantity")).cast("bigint").alias("qty")
    )
    packed = agg.agg(
        F.map_from_arrays(
            F.collect_list("l_returnflag"), F.collect_list("qty")
        ).alias("m")
    )
    rewritten = packed.select(
        F.map_filter(
            F.transform_values(
                F.transform_keys(F.col("m"), lambda k, v: F.concat(F.lit("FLAG_"), k)),
                lambda k, v: v * 2,
            ),
            lambda k, v: v > 200,
        ).alias("m")
    )
    return rewritten.select(F.explode("m").alias("key", "doubled"))


@register(
    "not_in_null_semantics",
    doc="NOT IN three-valued logic vs NOT EXISTS: NULL in the subquery list",
    oracle="""
        SELECT
            (SELECT COUNT(*) FROM customer
             WHERE c_custkey NOT IN (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
                                                 ELSE o_custkey END
                                     FROM orders)) AS n_not_in_with_null,
            (SELECT COUNT(*) FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
                AS n_not_exists
    """,
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic correctness trap, pinned as a query: ``NOT IN`` against a
    list containing NULL is three-valued — x NOT IN (..., NULL) is never
    TRUE, so the count collapses to 0 — while ``NOT EXISTS`` keeps its
    anti-join meaning. Both engines must agree on both counts. Spark plans
    the NOT IN as a null-aware anti join (a broadcast of the value set with
    a null flag), NOT a per-row subquery — the same decorrelation a
    warehouse needs for this predicate at scale."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    nullable_keys = o.select(
        F.when(F.col("o_orderkey") % 100 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("k")
    )
    c.createOrReplaceTempView("se_nin_customer")
    nullable_keys.createOrReplaceTempView("se_nin_keys")
    o.createOrReplaceTempView("se_nin_orders")
    return spark.sql(
        """
        SELECT
            (SELECT COUNT(*) FROM se_nin_customer
             WHERE c_custkey NOT IN (SELECT k FROM se_nin_keys)) AS n_not_in_with_null,
            (SELECT COUNT(*) FROM se_nin_customer c
             WHERE NOT EXISTS (SELECT 1 FROM se_nin_orders o
                               WHERE o.o_custkey = c.c_custkey)) AS n_not_exists
        """
    )


@register(
    "unpivot_quarterly_revenue",
    doc="pivot then unpivot (stack): wide quarterly columns back to long rows",
    oracle="""
        WITH rev AS (
            SELECT 'Q' || CAST(EXTRACT(quarter FROM o_orderdate) AS VARCHAR) AS quarter,
                   o_orderstatus,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                          AND o_orderdate <  TIMESTAMP '1997-01-01'
            GROUP BY 1, 2
        )
        SELECT o_orderstatus, quarter, revenue FROM rev
    """,
)
def unpivot_quarterly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through the wide layout: pivot 1996 revenue into Q1-Q4
    columns (one expanded aggregate, no per-quarter scans), then unpivot
    back to long form with ``stack`` — the wide→long operator BI extracts
    need. The round-trip must reproduce the plain grouped aggregate
    exactly; absent (status, quarter) cells are dropped on the way back
    (stack emits NULL revenue, filtered) to match the long form."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1997-01-01"))
    )
    wide = (
        o.withColumn("quarter", F.concat(F.lit("Q"), F.quarter("o_orderdate")))
        .groupBy("o_orderstatus")
        .pivot("quarter", ["Q1", "Q2", "Q3", "Q4"])
        .agg(dec2(F.sum(money("o_totalprice"))))
    )
    return (
        wide.selectExpr(
            "o_orderstatus",
            "stack(4, 'Q1', Q1, 'Q2', Q2, 'Q3', Q3, 'Q4', Q4) AS (quarter, revenue)",
        )
        .filter(F.col("revenue").isNotNull())
    )


@register(
    "posexplode_outer_lineitems",
    doc="F1 explode_outer/posexplode_outer: empty and NULL arrays keep their row",
    oracle="""
        WITH nested AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % 7 = 0 THEN NULL
                        ELSE (SELECT list(l.l_linenumber ORDER BY l.l_linenumber)
                              FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) END AS lines
            FROM orders o
        )
        SELECT o_orderkey, o_orderstatus,
               CAST(pos AS BIGINT) AS pos,
               CAST(line AS BIGINT) AS line
        FROM (
            SELECT o_orderkey, o_orderstatus,
                   unnest(lines) AS line,
                   generate_subscripts(lines, 1) - 1 AS pos
            FROM nested WHERE lines IS NOT NULL AND len(lines) > 0
            UNION ALL
            SELECT o_orderkey, o_orderstatus, NULL, NULL
            FROM nested WHERE lines IS NULL OR len(lines) = 0
        )
    """,
)
def posexplode_outer_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The outer-explode contract the landing pipeline depends on (a playlist
    with zero tracks must SURVIVE the unnest — conftest pl5/user5 case):
    re-nest lineitems per order, null out every 7th order's array, and
    posexplode_outer — rows with NULL/empty arrays emit one (NULL, NULL)
    row instead of vanishing. The oracle states the same union-of-cases."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.sort_array(F.collect_list("l_linenumber")).alias("lines"))
    )
    nested = o.join(li, "o_orderkey", "left").select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(F.col("lines")).alias("lines"),
    )
    return nested.select(
        "o_orderkey",
        "o_orderstatus",
        F.posexplode_outer("lines").alias("pos", "line"),
    ).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("line").cast("bigint").alias("line"),
    )


@register(
    "locf_gap_fill",
    doc="gap filling: last-observation-carried-forward via last(ignorenulls) window",
    oracle="""
        SELECT event_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
               LAST_VALUE(CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
        FROM events
    """,
)
def locf_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensor-style gap repair: every third reading is nulled, then forward-
    filled per user with ``last(..., ignorenulls=True)`` over a running
    frame — one shuffle+sort per user partition, the standard LOCF shape.
    Leading gaps (no prior observation) stay NULL, matching the SQL
    IGNORE NULLS window verbatim."""
    ev = t(spark, sf_dir, "events")
    gapped = F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        fmt_ts("ts").alias("ts"),
        F.last(gapped, ignorenulls=True).over(w).alias("value_filled"),
    )


@register(
    "session_window_events",
    doc="native session windows: groupBy(session_window(ts, gap)) — the one-shot "
    "aggregation twin of the lag/gap user_sessionization plan",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - LAG(ts) OVER w <= INTERVAL 30 MINUTE
                        THEN 0 ELSE 1 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS sid
            FROM flagged
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(MAX(ts) + INTERVAL 30 MINUTE,
                        '%Y-%m-%d %H:%M:%S') AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
        FROM sessions GROUP BY user_id, sid
    """,
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session-window operator: ``groupBy(user_id,
    session_window(ts, '30 minutes'))`` merges gap-contiguous events into
    variable-width windows inside one aggregation — no lag/running-sum
    window pair, no per-partition sort beyond the aggregation's own. The
    same expression works unchanged under ``readStream`` + watermark (the
    streaming sessionizer in streaming/stateful.py is the custom-state
    generalization). Window end is ``last event + gap`` by definition —
    the oracle reproduces it as MAX(ts) + 30 min on the same islands."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            dec2(F.sum(money("value"))).alias("session_value"),
        )
        .select(
            "user_id",
            fmt_ts("session_window.start").alias("session_start"),
            fmt_ts("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@register(
    "variant_extract_events",
    doc="semi-structured VARIANT type (Spark 4): parse_json once, typed "
    "variant_get paths — the third tier of the C6 JSON family",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
                   AS sum_k,
               CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER)
                   AS max_k,
               CAST(COUNT(json_extract_string(props, '$.missing')) AS BIGINT)
                   AS n_with_missing
        FROM events GROUP BY event_type
    """,
)
def variant_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT path for semi-structured columns: ``try_parse_json`` turns
    the props document into Spark 4's binary VARIANT encoding ONCE, then
    ``variant_get`` extracts typed paths without re-parsing — the engine's
    answer for schema-fluid JSON at scale, between ``get_json_object``
    (re-parses per path, `json_extract_events`) and ``from_json`` (needs the
    full schema up front, `json_schema_parse_events`). A missing path yields
    NULL (counted explicitly here: n_with_missing must be 0), a malformed
    document yields a NULL variant instead of an error."""
    ev = t(spark, sf_dir, "events")
    v = ev.select("event_type", F.try_parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "int")
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.max(k).cast("int").alias("max_k"),
        F.count(F.try_variant_get("v", "$.missing", "string")).alias("n_with_missing"),
    )
