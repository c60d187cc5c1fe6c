"""Sampling, dataset splitting, and profiling — the operations a
training-data pipeline runs before/after the dedup+quality family: carve
reproducible train/test splits, downsample skewed strata, and profile a
table's columns in one pass.

Determinism design: all sampling here is HASH-based, never RNG-based.
``rand()`` sampling is irreproducible across runs/engines and couples the
sample to partitioning; a content hash (md5 of the key) gives every row a
stable bucket in [0,100) that any engine reproduces bit-for-bit — the
property that makes a 100 TB split auditable (membership is a pure function
of the key, so a row's split never changes as the corpus grows and the split
can be re-derived, not stored). Spark `conv(substring(md5(k),25,8),16,10)`
≡ DuckDB `CAST('0x'||substr(md5(k),25,8) AS BIGINT)` — verified exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from songs_etl_spark.plans._util import dec2, fmt_ts, money, qty, t
from songs_etl_spark.plans.registry import register


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): low 32 bits of md5(key)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 25, 8), 16, 10).cast("bigint")
        % n_buckets
    )


def _duck_bucket(expr: str) -> str:
    return f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 25, 8)) AS BIGINT) % 100"


@register(
    "hash_split_train_test",
    doc="deterministic 80/20 train-test split via content-hash bucketing",
    oracle=f"""
        SELECT CASE WHEN {_duck_bucket('o_orderkey')} < 80 THEN 'train' ELSE 'test' END AS split,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT o_custkey) AS n_customers,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        FROM orders GROUP BY 1
    """,
)
def hash_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 split assigned by hash bucket of the order key — a narrow
    per-row projection (no shuffle, no sample() nondeterminism); the split
    column can be written as a partition column so downstream readers prune
    to one split without scanning the other."""
    orders = t(spark, sf_dir, "orders")
    split = F.when(hash_bucket(F.col("o_orderkey")) < 80, "train").otherwise("test")
    return (
        orders.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            dec2(F.sum(money("o_totalprice"))).alias("total_price"),
        )
    )


@register(
    "stratified_sample_documents",
    doc="per-stratum deterministic downsampling (rebalance a skewed corpus)",
    oracle=f"""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE {_duck_bucket('doc_id')} < CASE WHEN lang = 'en' THEN 10 ELSE 30 END
    """,
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-language rates (10% of the dominant 'en'
    stratum, 30% of the rest) — the corpus-rebalancing step before training.
    Unlike df.sampleBy, membership is a pure function of doc_id: stable under
    reruns, engine-independent, and joinable (the same doc always lands in
    the same sample)."""
    docs = t(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", F.lit(10)).otherwise(F.lit(30))
    return docs.filter(hash_bucket(F.col("doc_id")) < rate).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "constraint_audit_star",
    doc="data-quality audit: FK integrity / range / uniqueness rules → violations per rule",
    oracle="""
        SELECT 'fk_lineitem_orders' AS rule,
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
        UNION ALL
        SELECT 'fk_orders_customer',
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'fk_events_customer',
               (SELECT COUNT(*) FROM events e
                WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
        UNION ALL
        SELECT 'range_quantity_positive',
               (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
        UNION ALL
        SELECT 'range_discount_unit_interval',
               (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
        UNION ALL
        SELECT 'unique_orderkey',
               (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
    """,
)
def constraint_audit_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The validation pass a pipeline runs before publishing a snapshot: each
    rule is a count of violating rows — referential integrity as left-anti
    joins (the build side is just the distinct key column, broadcast when
    small), range rules as pushed-down filters, uniqueness as count minus
    distinct. Output is one (rule, n_violations) row per rule, so the audit
    composes into alerting regardless of table sizes."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    ev = t(spark, sf_dir, "events")

    def count_rule(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("n_violations")).select(
            F.lit(name).alias("rule"), "n_violations"
        )

    okeys = o.select("o_orderkey")
    ckeys = c.select("c_custkey")
    return (
        count_rule(
            "fk_lineitem_orders",
            li.select("l_orderkey").join(
                okeys, li.l_orderkey == okeys.o_orderkey, "left_anti"
            ),
        )
        .unionByName(
            count_rule(
                "fk_orders_customer",
                o.select("o_custkey").join(
                    F.broadcast(ckeys), o.o_custkey == ckeys.c_custkey, "left_anti"
                ),
            )
        )
        .unionByName(
            count_rule(
                "fk_events_customer",
                ev.select("user_id").join(
                    F.broadcast(ckeys), ev.user_id == ckeys.c_custkey, "left_anti"
                ),
            )
        )
        .unionByName(
            count_rule("range_quantity_positive", li.filter(F.col("l_quantity") <= 0))
        )
        .unionByName(
            count_rule(
                "range_discount_unit_interval",
                li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
            )
        )
        .unionByName(
            o.agg(
                (F.count("*") - F.countDistinct("o_orderkey")).alias("n_violations")
            ).select(F.lit("unique_orderkey").alias("rule"), "n_violations")
        )
    )


@register(
    "profile_lineitem_columns",
    doc="one-pass column profiling: nulls / distincts / min / max per column",
    oracle="""
        SELECT 'l_orderkey' AS col_name,
               COUNT(*) - COUNT(l_orderkey) AS n_null,
               COUNT(DISTINCT l_orderkey) AS n_distinct,
               CAST(MIN(l_orderkey) AS VARCHAR) AS min_val,
               CAST(MAX(l_orderkey) AS VARCHAR) AS max_val
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity', COUNT(*) - COUNT(l_quantity), COUNT(DISTINCT l_quantity),
               CAST(CAST(MIN(l_quantity) AS BIGINT) AS VARCHAR),
               CAST(CAST(MAX(l_quantity) AS BIGINT) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag', COUNT(*) - COUNT(l_returnflag), COUNT(DISTINCT l_returnflag),
               MIN(l_returnflag), MAX(l_returnflag)
        FROM lineitem
        UNION ALL
        SELECT 'l_shipdate', COUNT(*) - COUNT(l_shipdate), COUNT(DISTINCT l_shipdate),
               strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S'),
               strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S')
        FROM lineitem
    """,
)
def profile_lineitem_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile computed in ONE scan + one aggregation (the oracle's
    UNION ALL form scans the table once per column — the naive shape this
    query exists to avoid): all per-column aggregates run in a single agg,
    then unpivot to long (col_name, n_null, n_distinct, min_val, max_val)
    rows via stack. At 100 TB this is 1 pass over the data instead of k."""
    li = t(spark, sf_dir, "lineitem")
    n = F.count("*")
    wide = li.agg(
        (n - F.count("l_orderkey")).alias("ok_null"),
        F.countDistinct("l_orderkey").alias("ok_dist"),
        F.min("l_orderkey").cast("string").alias("ok_min"),
        F.max("l_orderkey").cast("string").alias("ok_max"),
        (n - F.count("l_quantity")).alias("q_null"),
        F.countDistinct("l_quantity").alias("q_dist"),
        qty(F.min("l_quantity")).cast("string").alias("q_min"),
        qty(F.max("l_quantity")).cast("string").alias("q_max"),
        (n - F.count("l_returnflag")).alias("rf_null"),
        F.countDistinct("l_returnflag").alias("rf_dist"),
        F.min("l_returnflag").alias("rf_min"),
        F.max("l_returnflag").alias("rf_max"),
        (n - F.count("l_shipdate")).alias("sd_null"),
        F.countDistinct("l_shipdate").alias("sd_dist"),
        fmt_ts(F.min("l_shipdate")).alias("sd_min"),
        fmt_ts(F.max("l_shipdate")).alias("sd_max"),
    )
    return wide.selectExpr(
        "stack(4, "
        "'l_orderkey',  ok_null, ok_dist, ok_min, ok_max, "
        "'l_quantity',  q_null,  q_dist,  q_min,  q_max, "
        "'l_returnflag',rf_null, rf_dist, rf_min, rf_max, "
        "'l_shipdate',  sd_null, sd_dist, sd_min, sd_max"
        ") AS (col_name, n_null, n_distinct, min_val, max_val)"
    )


@register(
    "weighted_doc_sample",
    doc="deterministic weighted Bernoulli sampling (keep-probability from a feature)",
    oracle="""
        SELECT doc_id, lang, n_chars,
               LEAST(1.0, n_chars / 2000.0) AS p_keep
        FROM documents
        WHERE CAST(CAST(('0x' || substr(md5(CAST(text AS VARCHAR)), 25, 8)) AS BIGINT) AS DOUBLE)
              / 4294967296.0 < LEAST(1.0, n_chars / 2000.0)
    """,
)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus sampling: each document is kept with
    probability proportional to a feature (here length, capped at 1) — but
    the coin flip is a CONTENT HASH mapped to [0,1), never rand(): the same
    corpus yields the same sample on any partitioning, any engine, any rerun
    (the invariant the whole sampling family maintains). A narrow per-row
    projection+filter — no shuffle, scan-speed at any corpus size."""
    docs = t(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("text")), 25, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(4294967296.0)
    )
    p = F.least(F.lit(1.0), F.col("n_chars") / F.lit(2000.0))
    return (
        docs.withColumn("p_keep", p)
        .filter(u < F.col("p_keep"))
        .select("doc_id", "lang", "n_chars", "p_keep")
    )


@register(
    "psi_value_drift",
    doc="train/test drift: per-bucket PSI terms of the value distribution "
    "between the two hash-split halves (population stability index)",
    oracle=f"""
        WITH tagged AS (
            SELECT CASE WHEN {_duck_bucket('event_id')} < 80 THEN 'train' ELSE 'test' END AS split,
                   event_type,
                   LEAST(CAST(FLOOR(CAST(value AS DECIMAL(18,4)) / 25) AS BIGINT), 15) AS bucket
            FROM events
        ),
        counts AS (
            SELECT event_type, bucket,
                   COUNT(*) FILTER (WHERE split = 'train') AS a,
                   COUNT(*) FILTER (WHERE split = 'test') AS b
            FROM tagged GROUP BY event_type, bucket
        ),
        tot AS (
            SELECT event_type, SUM(a) AS ta, SUM(b) AS tb
            FROM counts GROUP BY event_type
        )
        SELECT c.event_type, c.bucket,
               CAST(c.a AS BIGINT) AS n_train,
               CAST(c.b AS BIGINT) AS n_test,
               CASE WHEN c.a > 0 AND c.b > 0 THEN
                   ROUND((c.a / CAST(t.ta AS DOUBLE) - c.b / CAST(t.tb AS DOUBLE))
                         * LN((c.a / CAST(t.ta AS DOUBLE)) / (c.b / CAST(t.tb AS DOUBLE))), 9)
               END AS psi_term
        FROM counts c JOIN tot t ON c.event_type = t.event_type
    """,
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index terms between the deterministic 80/20
    hash-split halves: bucket the measure on exact decimals, count per
    (group, bucket, split), and emit each bucket's (p−q)·ln(p/q)
    contribution. Terms stay PER-BUCKET — the cross-bucket sum is one
    trivial reduction for the caller — because each term is a fixed chain
    of single IEEE ops on exact count ratios — rounded to 9 decimals since
    the one transcendental (ln) is the module's known 1-ulp JVM↔libm
    divergence (same guard as doc_unigram_logprob) — while a float SUM of
    terms would reintroduce accumulation-order dependence. Empty-on-either-side buckets yield NULL
    terms (the standard PSI smoothing decision is the caller's).

    Plan: one map-side split/bucket projection, one grouped count with
    conditional aggregation, totals joined back per group — two shuffles
    total, everything else broadcastable."""
    ev = t(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type",
        F.when(hash_bucket(F.col("event_id")) < 80, "train").otherwise("test").alias("split"),
        F.least(F.floor(money("value") / 25).cast("bigint"), F.lit(15)).alias("bucket"),
    )
    counts = tagged.groupBy("event_type", "bucket").agg(
        F.count(F.when(F.col("split") == "train", 1)).alias("a"),
        F.count(F.when(F.col("split") == "test", 1)).alias("b"),
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("a").alias("ta"), F.sum("b").alias("tb")
    )
    p = F.col("a") / F.col("ta").cast("double")
    q = F.col("b") / F.col("tb").cast("double")
    return counts.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "bucket",
        F.col("a").cast("bigint").alias("n_train"),
        F.col("b").cast("bigint").alias("n_test"),
        F.when(
            (F.col("a") > 0) & (F.col("b") > 0), F.round((p - q) * F.log(p / q), 9)
        ).alias("psi_term"),
    )


#: Weighted-reservoir sample size.
ARES_K = 40


@register(
    "weighted_reservoir_sample",
    doc="weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-Res): "
    "key = ln(u)/w from a deterministic hash-uniform u, top-k by key — "
    "keys rounded before ranking so the order is engine-exact",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, n_chars,
                   ROUND(
                       LN((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 1)
                          / CAST(281474976710656 AS DOUBLE))
                       / n_chars, 12) AS k
            FROM documents WHERE n_chars > 0
        )
        SELECT doc_id, n_chars, k, rk FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS rk FROM keyed
        ) WHERE rk <= {ARES_K}
    """,
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis A-Res weighted sampling without replacement:
    each item draws u ∈ (0,1) and keeps key u^(1/w) — equivalently
    ln(u)/w, monotone — and the k largest keys are the sample, giving
    inclusion probability proportional to weight with NO replacement and
    NO sequential pass (the distributed-sampling algorithm; a per-
    partition top-k merges associatively at 100 TB).

    Engine-exactness: u is the md5-derived 48-bit uniform over
    (0, 2^48]/2^48 (deterministic, never rand()); ln is the module's
    known 1-ulp risk, so keys are ROUNDed to 12 decimals BEFORE ranking
    and ties break on doc_id — the selected set and its order are then
    bit-stable across engines."""
    docs = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u_int = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
    )
    u = (u_int + 1) / F.lit(float(2**48))
    key = F.round(F.log(u) / F.col("n_chars"), 12)
    w = Window.orderBy(F.desc("k"), "doc_id")
    return (
        docs.select("doc_id", "n_chars", key.alias("k"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= ARES_K)
    )


@register(
    "group_split_by_source",
    doc="leakage-free GROUP-aware train/test split: the hash bucket keys on "
    "SOURCE, so every document of a source lands whole in one split — the "
    "GroupKFold discipline near-dup-heavy corpora need (doc-keyed splits "
    "leak near-identical training rows into test)",
    oracle=f"""
        WITH assigned AS (
            SELECT CASE WHEN {_duck_bucket('source')} < 80
                        THEN 'train' ELSE 'test' END AS split,
                   source, n_chars
            FROM documents
        )
        SELECT split,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT source) AS n_sources,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM assigned GROUP BY split
    """,
)
def group_split_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware 80/20 split: bucket = md5(source) — a per-row projection
    exactly like hash_split_train_test, but hashing the GROUP key means no
    source ever straddles splits (the n_sources counts partition the source
    universe by construction; with doc-keyed hashing every source would
    appear in both). Same scale shape: no shuffle beyond the reporting
    aggregate, and the split value doubles as a write partition column so
    readers prune the other split."""
    docs = t(spark, sf_dir, "documents")
    split = F.when(hash_bucket(F.col("source")) < 80, "train").otherwise("test")
    return (
        docs.withColumn("split", split)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


#: Kolmogorov-Smirnov two-sample critical coefficient at alpha = 0.05.
_KS_C_ALPHA = "1.358"


@register(
    "ks_test_value_drift",
    tags=("bcast-const",),
    doc="two-sample Kolmogorov-Smirnov test between the hash-split halves' "
    "event-value distributions: exact D statistic (max ECDF gap over "
    "distinct values) + the alpha=0.05 decision — the distribution-shape "
    "drift test beside psi_value_drift's binned index",
    oracle=f"""
        WITH tagged AS (
            SELECT CASE WHEN {_duck_bucket('event_id')} < 50 THEN 'a' ELSE 'b' END AS arm,
                   CAST(ROUND(CAST(value AS DECIMAL(18,4)) * 100) AS BIGINT) AS cents
            FROM events
        ), totals AS (
            SELECT CAST(COUNT(*) FILTER (WHERE arm = 'a') AS BIGINT) AS na,
                   CAST(COUNT(*) FILTER (WHERE arm = 'b') AS BIGINT) AS nb
            FROM tagged
        ), per_v AS (
            SELECT cents,
                   COUNT(*) FILTER (WHERE arm = 'a') AS ca,
                   COUNT(*) FILTER (WHERE arm = 'b') AS cb
            FROM tagged GROUP BY cents
        ), cum AS (
            SELECT cents,
                   SUM(ca) OVER (ORDER BY cents) AS cuma,
                   SUM(cb) OVER (ORDER BY cents) AS cumb
            FROM per_v
        ), d AS (
            SELECT MAX(ABS(CAST(cuma AS DOUBLE) / t.na
                           - CAST(cumb AS DOUBLE) / t.nb)) AS d_stat
            FROM cum CROSS JOIN totals t
        )
        SELECT t.na AS n_a, t.nb AS n_b, d.d_stat,
               {_KS_C_ALPHA} * SQRT(CAST(t.na + t.nb AS DOUBLE)
                                    / (CAST(t.na AS DOUBLE) * t.nb)) AS d_crit,
               d.d_stat > {_KS_C_ALPHA} * SQRT(CAST(t.na + t.nb AS DOUBLE)
                                    / (CAST(t.na AS DOUBLE) * t.nb)) AS reject_h0
        FROM d CROSS JOIN totals t
    """,
)
def ks_test_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS: D = max over observed values of the gap between the
    two arms' empirical CDFs, compared against the large-sample alpha=0.05
    critical value 1.358·√((n_a+n_b)/(n_a·n_b)). PSI needs binning choices;
    KS is binning-free and sensitive to any distribution-shape change —
    the pair every drift monitor runs together. Arms come from the
    deterministic md5 hash split (never rand()).

    Exactness: values are exact cent integers, cumulative counts exact
    window sums over the DISTINCT-value relation (bounded by value
    cardinality, not event count — the window sorts ~thousands of rows at
    any corpus size), each ECDF gap is one double chain, and MAX is
    order-free. Scale: one event-keyed aggregation + one value-grain
    window + a 1-row broadcast of the totals (bcast-const)."""
    ev = t(spark, sf_dir, "events")
    tagged = ev.select(
        F.when(hash_bucket(F.col("event_id")) < 50, "a").otherwise("b").alias("arm"),
        F.round(money("value") * 100).cast("bigint").alias("cents"),
    )
    totals = tagged.agg(
        F.count(F.when(F.col("arm") == "a", 1)).cast("bigint").alias("na"),
        F.count(F.when(F.col("arm") == "b", 1)).cast("bigint").alias("nb"),
    )
    per_v = tagged.groupBy("cents").agg(
        F.count(F.when(F.col("arm") == "a", 1)).alias("ca"),
        F.count(F.when(F.col("arm") == "b", 1)).alias("cb"),
    )
    wv = Window.orderBy("cents")
    cum = per_v.select(
        "cents",
        F.sum("ca").over(wv).alias("cuma"),
        F.sum("cb").over(wv).alias("cumb"),
    )
    d = (
        cum.crossJoin(F.broadcast(totals))
        .agg(
            F.max(
                F.abs(
                    F.col("cuma").cast("double") / F.col("na")
                    - F.col("cumb").cast("double") / F.col("nb")
                )
            ).alias("d_stat")
        )
    )
    crit = F.lit(float(_KS_C_ALPHA)) * F.sqrt(
        (F.col("na") + F.col("nb")).cast("double")
        / (F.col("na").cast("double") * F.col("nb"))
    )
    return (
        d.crossJoin(F.broadcast(totals))
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            "d_stat",
            crit.alias("d_crit"),
            (F.col("d_stat") > crit).alias("reject_h0"),
        )
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap (distributed resampling)
# ---------------------------------------------------------------------------

#: Bootstrap geometry: B resamples; each (row, resample) pair draws a
#: Poisson(1) multiplicity from the low 32 bits of md5(resample|key) via the
#: inverse-CDF thresholds below (floor(CDF_k · 2³²), capped at 5 —
#: P(X ≥ 5) ≈ 0.37%). Poisson(1) multiplicities are the standard
#: streaming/distributed stand-in for multinomial bootstrap resampling
#: (each row decides its own multiplicity independently — no global draw,
#: no shuffle), and the hash makes every draw a pure function of
#: (resample, key): reproducible bit-for-bit on any engine.
_BOOT_B = 16
_BOOT_T = (1580030168, 3160060337, 3950075421, 4213413783, 4279248373)


def _boot_mult_sql(h: str) -> str:
    w = " ".join(f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_BOOT_T))
    return f"CASE {w} ELSE 5 END"


@register(
    "poisson_bootstrap_order_mean",
    doc="distributed statistics: Poisson(1) hash bootstrap of the mean "
    "order value — B deterministic resamples, exact decimal resample "
    "sums, the percentile-CI table a 100 TB pipeline reads its error "
    "bars from",
    oracle=f"""
        WITH rs AS (
            SELECT r.r AS resample,
                   CAST(('0x' || substr(md5(CAST(r.r AS VARCHAR) || '|' ||
                                            CAST(o.o_orderkey AS VARCHAR)), 25, 8))
                        AS BIGINT) AS h,
                   CAST(o.o_totalprice AS DECIMAL(18,4)) AS price
            FROM orders o, range(0, {_BOOT_B}) r(r)
        ),
        agg AS (
            SELECT resample,
                   CAST(SUM(mult) AS BIGINT) AS n_eff,
                   CAST(CAST(SUM(mult * price) AS DOUBLE) / CAST(SUM(mult) AS BIGINT)
                        AS DOUBLE) AS mean_boot
            FROM (SELECT resample, {_boot_mult_sql("h")} AS mult, price FROM rs)
            GROUP BY resample
        )
        SELECT resample, n_eff, mean_boot,
               CAST(ROW_NUMBER() OVER (ORDER BY mean_boot, resample) AS BIGINT) AS rank
        FROM agg
    """,
)
def poisson_bootstrap_order_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bootstrap that actually runs at 100 TB: classical resampling
    draws n rows WITH replacement per resample — a global multinomial no
    distributed engine can execute — but for large n the per-row resample
    multiplicities converge to independent Poisson(1), so each row can
    decide its own multiplicity locally from a hash of (resample, key).
    B resamples then cost ONE bounded ×B fan-out plus one keyed
    aggregation: no shuffle of the data per resample, no driver-side
    sampling state, reproducible on any engine (hash-based, never RNG —
    this module's standing policy).

    Per resample: exact decimal sum of multiplicity-weighted order values,
    exact integer effective-n, mean as one correctly-rounded double
    division. Ranked output: the bootstrap distribution's order statistics
    — with B=16, rows rank 2 and 15 bracket the ~87% percentile CI of the
    mean; a deployment raises B and reads the quantiles it needs. Every
    multiplicity comes from the module's md5 low-32-bit uniform versus
    precomputed inverse-CDF integer thresholds (floor(CDF·2³²) — exact
    integer comparisons, no float CDF at query time)."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", money("o_totalprice").alias("price")
    )
    rs = orders.select(
        "o_orderkey",
        "price",
        F.explode(F.array(*[F.lit(r) for r in range(_BOOT_B)])).alias("resample"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col("resample"), F.col("o_orderkey"))), 25, 8
        ),
        16,
        10,
    ).cast("bigint")
    mult = F.lit(5)
    for k, thr in reversed(list(enumerate(_BOOT_T))):
        mult = F.when(h < thr, F.lit(k)).otherwise(mult)
    agg = (
        rs.select("resample", mult.alias("mult"), "price")
        .groupBy("resample")
        .agg(
            F.sum("mult").cast("bigint").alias("n_eff"),
            (
                F.sum(F.col("mult") * F.col("price")).cast("double")
                / F.sum("mult").cast("bigint").cast("double")
            ).alias("mean_boot"),
        )
    )
    w = Window.orderBy("mean_boot", "resample")
    return agg.select(
        "resample",
        "n_eff",
        "mean_boot",
        F.row_number().over(w).cast("bigint").alias("rank"),
    )


#: Horvitz-Thompson design: per-priority inclusion probability 1/k with k a
#: POWER OF TWO, so the hash-modulo coin (u32 % k == 0 over the uniform
#: 32-bit hash head) realizes pi = 1/k EXACTLY — 2^32 divides evenly — and
#: the design weight k is an exact integer.
_HT_K = {
    "1-URGENT": 2,
    "2-HIGH": 4,
    "3-MEDIUM": 8,
    "4-NOT SPECIFIED": 16,
    "5-LOW": 16,
}
_HT_K_SQL = "CASE " + " ".join(
    f"WHEN o_orderpriority = '{p}' THEN {k}" for p, k in _HT_K.items()
) + " ELSE 16 END"


@register(
    "horvitz_thompson_total",
    doc="unequal-probability sampling with a measured contract: per-stratum "
    "Horvitz-Thompson estimate of total order value (hash-modulo coin, "
    "exact power-of-two inclusion probabilities, exact integer weights) "
    "next to the exact total and its relative error",
    oracle=f"""
        WITH b AS (
            SELECT o_orderpriority,
                   {_HT_K_SQL} AS k,
                   CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4)) * 100) AS BIGINT) AS cents,
                   CAST(('0x' || substr(md5('ht:' || CAST(o_orderkey AS VARCHAR)), 1, 8))
                        AS BIGINT) AS h
            FROM orders
        )
        SELECT o_orderpriority,
               CAST(MAX(k) AS BIGINT) AS k_weight,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN h % k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
               CAST(SUM(cents) AS BIGINT) AS exact_total_cents,
               CAST(SUM(CASE WHEN h % k = 0 THEN cents * k ELSE 0 END) AS BIGINT)
                   AS ht_estimate_cents,
               CAST(ABS(SUM(CASE WHEN h % k = 0 THEN cents * k ELSE 0 END) - SUM(cents))
                    AS DOUBLE) / CAST(SUM(cents) AS DOUBLE) AS rel_err
        FROM b GROUP BY o_orderpriority
    """,
)
def horvitz_thompson_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz-Thompson estimation — the inference half the sampling family
    was missing: ``weighted_doc_sample`` / ``lang_quota_sample`` DRAW
    unequal-probability samples, this query shows the downstream consumer
    how to read totals back off one without bias, and MEASURES the error
    of doing so. Each order priority samples at its own rate (urgent
    orders at 1/2 — the stratum you care about — down to 1/16 for the bulk
    tail), every sampled row is re-weighted by exactly 1/π, and the
    per-stratum HT estimate of total order value sits next to the exact
    total with its relative error, all inside the value hash.

    Determinism and exactness: the coin is a content hash (md5 head modulo
    k), so the sample is identical on any engine/partitioning/rerun; k is
    a power of two so π = 1/k is EXACT over the uniform 32-bit hash head
    (2³² divides evenly — a modulo-5 coin would be off by 2⁻³²); weights
    and totals are exact integer cents; the only double is the final
    |ht − exact|/exact ratio. Scale shape: ONE map-side-combining
    aggregation over a narrow projection — the estimator never
    materializes the sample."""
    orders = t(spark, sf_dir, "orders")
    k = F.coalesce(
        *[
            F.when(F.col("o_orderpriority") == p, F.lit(kk))
            for p, kk in _HT_K.items()
        ],
        F.lit(16),
    )
    cents = F.round(money("o_totalprice") * 100).cast("bigint")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ht:"), F.col("o_orderkey").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    b = orders.select(
        "o_orderpriority", k.alias("k"), cents.alias("cents"), h.alias("h")
    )
    kept = F.col("h") % F.col("k") == 0
    return b.groupBy("o_orderpriority").agg(
        F.max("k").cast("bigint").alias("k_weight"),
        F.count("*").alias("n"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_sampled"),
        F.sum("cents").cast("bigint").alias("exact_total_cents"),
        F.sum(F.when(kept, F.col("cents") * F.col("k")).otherwise(0))
        .cast("bigint")
        .alias("ht_estimate_cents"),
        (
            F.abs(
                F.sum(F.when(kept, F.col("cents") * F.col("k")).otherwise(0))
                - F.sum("cents")
            ).cast("double")
            / F.sum("cents").cast("double")
        ).alias("rel_err"),
    )
