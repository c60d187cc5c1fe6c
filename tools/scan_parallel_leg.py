"""Scan-parallel bench leg (round-12 verdict item 5).

The driver's 8-vs-32-core scaling block is uninformative on the stock
testdata: every table is a single-row-group parquet file, so scan
parallelism is 1 task and the headline queries are overhead-bound — the
measured core-count ratios sit at ~1 and say nothing about the engine's
parallel posture. This tool builds a corpus whose scans actually split and
measures the same headline queries at two core counts on it.

Leg corpus (``build``): every heavy table (lineitem, orders, events,
documents, embeddings) is replicated ``--mult`` times with deterministic
id offsets (replica k of a row gets pk + k·(max_pk+1); orders/lineitem
offset o_orderkey consistently so the star joins keep their fan-out), then
written as a 32-file parquet directory — multi-file, multi-row-group, so a
scan yields 32 splits. Dimensions (region/nation/customer/supplier/part)
are copied unreplicated. No RNG anywhere; the corpus is a pure function of
the base SF.

Measurement (``run``): same methodology as bench.py — warm-up pass at
sf0.001 for codegen, shingle/persist caches cleared before each timed
pass, per-query min over ``--reps`` passes through the noop sink. Run it
twice with different $SPARK_GRAFT_CPUS and compare:

    python tools/scan_parallel_leg.py build --out /tmp/scanleg --mult 10
    SPARK_GRAFT_CPUS=32 python tools/scan_parallel_leg.py run --dir /tmp/scanleg
    SPARK_GRAFT_CPUS=8  python tools/scan_parallel_leg.py run --dir /tmp/scanleg

BASELINE.md records the measured ratio table. This is a measurement leg,
not a correctness gate: the replicated corpus has no DuckDB oracle, and
the driver's bench contract (bench.py at $SPARK_GRAFT_SF_DIR) is
untouched.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from songs_etl_spark.session import get_spark

#: Tables replicated with id offsets; (table, primary key column).
HEAVY = [
    ("lineitem", None),  # keyed off o_orderkey; handled with orders below
    ("orders", "o_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]
DIMS = ["region", "nation", "customer", "supplier", "part"]
OUT_FILES = 32


def build(base: str, out: str, mult: int) -> None:
    spark = get_spark("scanleg-build")
    os.makedirs(out, exist_ok=True)

    orders = spark.read.parquet(f"{base}/orders.parquet")
    lineitem = spark.read.parquet(f"{base}/lineitem.parquet")
    n_ord = orders.agg(F.max("o_orderkey")).first()[0] + 1

    def replicate(df, key: str, step: int):
        parts = [df]
        for k in range(1, mult):
            parts.append(df.withColumn(key, F.col(key) + F.lit(k * step)))
        outdf = parts[0]
        for p in parts[1:]:
            outdf = outdf.unionByName(p)
        return outdf

    # orders + lineitem share the o_orderkey offset so the star fan-out is
    # preserved per replica.
    replicate(orders, "o_orderkey", n_ord).repartition(OUT_FILES).write.mode(
        "overwrite"
    ).parquet(f"{out}/orders.parquet")
    replicate(lineitem, "l_orderkey", n_ord).repartition(OUT_FILES).write.mode(
        "overwrite"
    ).parquet(f"{out}/lineitem.parquet")

    for table, key in HEAVY[2:]:
        df = spark.read.parquet(f"{base}/{table}.parquet")
        step = df.agg(F.max(key)).first()[0] + 1
        replicate(df, key, step).repartition(OUT_FILES).write.mode(
            "overwrite"
        ).parquet(f"{out}/{table}.parquet")

    for table in DIMS:
        spark.read.parquet(f"{base}/{table}.parquet").repartition(4).write.mode(
            "overwrite"
        ).parquet(f"{out}/{table}.parquet")
    spark.stop()


def run(leg_dir: str, reps: int) -> None:
    from songs_etl_spark.plans import REGISTRY
    from songs_etl_spark.plans._util import clear_tracked_persists
    from songs_etl_spark.plans.dedup import clear_shingle_cache

    spark = get_spark("scanleg-run")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    names = [n for n, s in REGISTRY.items() if s.bench]
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm):
        for name in names:
            try:
                REGISTRY[name].fn(spark, warm).write.mode("overwrite").format(
                    "noop"
                ).save()
            except Exception as exc:  # pragma: no cover
                print(f"warm-up failed for {name}: {exc!r}", file=sys.stderr)
    passes: list[dict[str, float]] = []
    for _ in range(reps):
        clear_shingle_cache()
        clear_tracked_persists()
        per: dict[str, float] = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"scanleg:{name}")
            start = time.perf_counter()
            REGISTRY[name].fn(spark, leg_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            per[name] = round(time.perf_counter() - start, 3)
            spark.sparkContext.setJobDescription(None)
        passes.append(per)
    timings = {n: min(p[n] for p in passes) for n in names}
    print(
        json.dumps(
            {
                "leg": leg_dir,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
                "reps": reps,
                "queries": timings,
                "total": round(sum(timings.values()), 3),
                "pass_totals": [round(sum(p.values()), 3) for p in passes],
            }
        )
    )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["build", "run"])
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scanleg")
    ap.add_argument("--dir", default="/tmp/scanleg")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    if args.mode == "build":
        build(args.base, args.out, args.mult)
    else:
        run(args.dir, args.reps)


if __name__ == "__main__":
    main()
