"""Classic TPC-H multi-join analytics shapes (Q3/Q5/Q7/Q8/Q9/Q10) over the
star schema — the deep-join family the earlier relational modules don't
cover: pruned 3-6 table joins, nation-pair self-joins, conditional market
share, and top-k over grouped revenue.

Schema notes: the testdata is TPC-H-lite (no partsupp, no o_shippriority /
l_commitdate), so Q3 groups on (orderkey, orderdate), Q9 models supply cost
as 10% of p_retailprice, and date windows use the generated 1995-2001 span.
Decimal discipline per plans/registry.py: money sums are exact DECIMAL both
engines, cast to DOUBLE only at presentation.

Join strategy, stated once: nation/region/part/supplier/customer are the
small sides and broadcast; lineitem and orders join on their natural keys —
at 100 TB, lineitem→orders is the only shuffle pair, and every predicate
(segment, dates, returnflag, type) reaches its parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from songs_etl_spark.plans._util import dec2, fmt_date, money, qty, t, ts_lit
from songs_etl_spark.plans.registry import register

_REV = "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"


def _rev() -> F.Column:
    return money("l_extendedprice") * (F.lit(1) - money("l_discount"))


@register(
    "shipping_priority_q3",
    doc="TPC-H Q3 shape: segment-filtered 3-way join, top-10 orders by open revenue",
    oracle=f"""
        SELECT l.l_orderkey,
               CAST(SUM({_REV}) AS DOUBLE) AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY SUM({_REV}) DESC, l.l_orderkey
        LIMIT 10
    """,
)
def shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: the segment predicate prunes customer BEFORE its (broadcast) join,
    both date predicates push into the orders/lineitem scans, and the top-10
    is a TakeOrdered over the grouped result — no global sort materializes.
    Ordering ties broken by orderkey so the LIMIT set is deterministic; the
    ORDER BY is decided on the exact decimal, not the double."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < ts_lit("1998-03-15"))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > ts_lit("1998-03-15"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_rev()).alias("rev_exact"))
        .orderBy(F.col("rev_exact").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            dec2(F.col("rev_exact")).alias("revenue"),
            fmt_date("o_orderdate").alias("orderdate"),
        )
    )


@register(
    "local_supplier_volume_q5",
    doc="TPC-H Q5 shape: 6-table join, revenue where supplier and customer share a nation",
    oracle=f"""
        SELECT n.n_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue
        FROM region r
        JOIN nation n   ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
    """,
)
def local_supplier_volume_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: region→nation→customer collapse into one broadcast relation
    (they're all small), supplier broadcasts too, and the only repartition
    pair is lineitem↔orders. The local-supplier condition
    (s_nationkey = c_nationkey) rides the supplier join — no extra pass."""
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_nationkey", "n_name")
    )
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1997-01-01"))
    )
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == cust.c_nationkey),
        )
        .groupBy("n_name")
        .agg(dec2(F.sum(_rev())).alias("revenue"))
    )


@register(
    "nation_volume_shipping_q7",
    doc="TPC-H Q7 shape: directed nation-pair trade volume by ship year",
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(strftime(l.l_shipdate, '%Y') AS BIGINT) AS l_year,
               CAST(SUM({_REV}) AS DOUBLE) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n1.n_name, n2.n_name, CAST(strftime(l.l_shipdate, '%Y') AS BIGINT)
    """,
)
def nation_volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: the nation self-join pair (n1 supplier-side, n2 customer-side)
    stays broadcast; the disjunctive pair filter is applied AFTER both
    nation joins on the already-small joined relation. lineitem↔orders is
    again the single big join."""
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n.withColumnRenamed("n_name", "supp_nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    c = t(spark, sf_dir, "customer").join(
        F.broadcast(n.withColumnRenamed("n_name", "cust_nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "cust_nation")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts_lit("1996-01-01"))
        & (F.col("l_shipdate") < ts_lit("1998-01-01"))
    )
    o = t(spark, sf_dir, "orders")
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(dec2(F.sum(_rev())).alias("volume"))
    )


@register(
    "market_share_q8",
    doc="TPC-H Q8 shape: a nation's revenue share of a region's market per year",
    oracle=f"""
        WITH flat AS (
            SELECT CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) AS o_year,
                   {_REV} AS vol,
                   n2.n_name AS supp_nation
            FROM part p
            JOIN lineitem l ON l.l_partkey = p.p_partkey
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
            JOIN region r   ON r.r_regionkey = n1.n_regionkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        )
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                   / CAST(SUM(vol) AS DOUBLE) AS mkt_share
        FROM flat GROUP BY o_year
    """,
)
def market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: conditional share = (nation's exact decimal volume) / (total
    exact decimal volume), both sums exact and the single double division
    bit-stable. Part/region/nations/supplier all broadcast; the customer
    side collapses through nation→region pruning before its join."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust = (
        t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1998-01-01"))
    )
    li = t(spark, sf_dir, "lineitem")
    flat = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _rev().alias("vol"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return flat.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(zero)).cast("double")
            / F.sum("vol").cast("double")
        ).alias("mkt_share")
    )


@register(
    "product_type_profit_q9",
    doc="TPC-H Q9 shape (adapted: cost = 10% of p_retailprice — no partsupp in "
    "this schema): profit by supplier nation and year",
    oracle=f"""
        SELECT n.n_name AS nation,
               CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) AS o_year,
               CAST(SUM({_REV}
                        - CAST(p.p_retailprice AS DECIMAL(18,4))
                          * CAST(0.1 AS DECIMAL(8,4))
                          * CAST(l.l_quantity AS BIGINT)) AS DOUBLE) AS profit
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        WHERE p.p_type = 'PROMO'
        GROUP BY n.n_name, CAST(strftime(o.o_orderdate, '%Y') AS BIGINT)
    """,
)
def product_type_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 adapted to the schema (no partsupp → supply cost modeled as 10% of
    retail price; same join tree and aggregation shape as the reference
    query). Profit accumulates in exact decimal; part/supplier/nation
    broadcast; lineitem↔orders is the lone shuffle join."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey", "p_retailprice"
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem")
    cost = money("p_retailprice") * F.lit("0.1").cast("decimal(8,4)") * qty("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(dec2(F.sum(_rev() - cost)).alias("profit"))
    )


@register(
    "returned_item_reporting_q10",
    doc="TPC-H Q10 shape: top-20 customers by returned-item revenue in a quarter",
    oracle=f"""
        SELECT c.c_custkey, c.c_name,
               CAST(SUM({_REV}) AS DOUBLE) AS revenue,
               CAST(c.c_acctbal AS DOUBLE) AS acctbal,
               n.n_name
        FROM customer c
        JOIN orders o   ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND l.l_returnflag = 'R'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY SUM({_REV}) DESC, c.c_custkey
        LIMIT 20
    """,
)
def returned_item_reporting_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: returnflag and the quarter window push into the scans, the
    grouped top-20 is TakeOrdered on the exact decimal (custkey tie-break
    for a deterministic LIMIT set)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit("1996-01-01"))
        & (F.col("o_orderdate") < ts_lit("1996-04-01"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).alias("rev_exact"))
        .orderBy(F.col("rev_exact").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            dec2(F.col("rev_exact")).alias("revenue"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
            "n_name",
        )
    )


@register(
    "min_cost_supplier_q2",
    doc="TPC-H Q2 shape: correlated scalar-MIN subquery decorrelated into a "
    "grouped min + equality join-back, region-restricted suppliers",
    oracle="""
        WITH pf AS (
            SELECT p_partkey, p_name FROM part
            WHERE p_size = 15 AND p_type = 'PROMO'
        ),
        eu AS (
            SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'EUROPE'
        ),
        supply AS (
            SELECT l.l_partkey, l.l_suppkey,
                   MIN(l.l_extendedprice / l.l_quantity) AS supply_cost
            FROM lineitem l JOIN pf ON l.l_partkey = pf.p_partkey
            GROUP BY l.l_partkey, l.l_suppkey
        ),
        costs AS (
            SELECT sp.l_partkey, sp.supply_cost, e.s_name, e.s_acctbal, e.n_name
            FROM supply sp JOIN eu e ON sp.l_suppkey = e.s_suppkey
        ),
        min_cost AS (
            SELECT l_partkey, MIN(supply_cost) AS mc FROM costs GROUP BY l_partkey
        )
        SELECT c.s_acctbal, c.s_name, c.n_name, p.p_partkey, p.p_name, c.supply_cost
        FROM costs c
        JOIN min_cost m ON c.l_partkey = m.l_partkey AND c.supply_cost = m.mc
        JOIN pf p ON p.p_partkey = c.l_partkey
        ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, p.p_partkey
        LIMIT 100
    """,
)
def min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 (minimum-cost supplier), adapted to the TPC-H-lite schema: with no
    partsupp table, the supply relation is derived from lineitem — per
    (part, supplier) the minimum observed unit price. The classic correlated
    scalar subquery (`cost = (SELECT MIN(..) .. WHERE same part)`) is
    decorrelated the way Catalyst would: one grouped MIN per part, equality
    join-back on (partkey, cost).

    Scale shape: the part filter (9 of 2 000 parts here; one size×type cell
    at any SF) broadcasts INTO the lineitem scan before any aggregation, so
    the grouped MIN runs on a sliver of lineitem; the EU supplier relation
    (supplier⋈nation⋈region) broadcasts too. The only shuffles are the two
    grouped MINs, both already tiny. Unit price is a per-row double division
    (deterministic), MIN is order-independent, and the equality join-back
    compares the identical double — no epsilon needed."""
    pf = (
        t(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "PROMO"))
        .select("p_partkey", "p_name")
    )
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = t(spark, sf_dir, "lineitem")
    supply = (
        li.join(F.broadcast(pf), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey", "p_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost"))
    )
    costs = supply.join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    min_cost = costs.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("supply_cost").alias("mc")
    )
    return (
        costs.join(
            F.broadcast(min_cost),
            (F.col("l_partkey") == F.col("mk")) & (F.col("supply_cost") == F.col("mc")),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "l_partkey")
        .limit(100)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "supply_cost",
        )
    )
