"""Per-query profiling harness for optimization rounds: time individual
registry queries through the noop sink (min-of-N, same methodology as
bench.py) and/or dump their ``explain("formatted")`` plans.

Usage:
    python tools/perf_profile.py [--sf DIR] [--reps N] [--explain-dir DIR]
                                 [--no-time] [names...|--all]

Timing protocol mirrors bench.py: one warm-up pass of each query at the
smallest SF (codegen compile), shingle/persist caches cleared before each
timed pass so every pass re-does all data work at the SF under test.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from songs_etl_spark.plans import REGISTRY
from songs_etl_spark.plans._util import clear_tracked_persists
from songs_etl_spark.plans.dedup import clear_shingle_cache
from songs_etl_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--all", action="store_true", help="profile every registry query")
    ap.add_argument("--bench", action="store_true", help="profile the bench headline set")
    ap.add_argument("--explain-dir", default=None, help="write <name>.txt formatted plans here")
    ap.add_argument("--no-time", action="store_true", help="skip timing (explain only)")
    args = ap.parse_args()

    if args.all:
        names = list(REGISTRY)
    elif args.bench:
        names = [n for n, s in REGISTRY.items() if s.bench]
    else:
        names = args.names
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark("perf-profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name in names:
            clear_shingle_cache()
            clear_tracked_persists()
            df = REGISTRY[name].fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as fh:
                fh.write(plan)
            print(f"explain written: {name}", file=sys.stderr)

    if not args.no_time:
        # Warm-up at the smallest SF (codegen compile), as in bench.py.
        warm_dir = "/root/testdata/sf0.001"
        if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(args.sf):
            for name in names:
                clear_shingle_cache()
                clear_tracked_persists()
                try:
                    REGISTRY[name].fn(spark, warm_dir).write.mode("overwrite").format(
                        "noop"
                    ).save()
                except Exception as exc:
                    print(f"warm-up failed for {name}: {exc!r}", file=sys.stderr)
        passes: list[dict[str, float]] = []
        for _ in range(args.reps):
            clear_shingle_cache()
            clear_tracked_persists()
            per: dict[str, float] = {}
            for name in names:
                spark.sparkContext.setJobDescription(f"profile:{name}")
                start = time.perf_counter()
                try:
                    df = REGISTRY[name].fn(spark, args.sf)
                    df.write.mode("overwrite").format("noop").save()
                    per[name] = round(time.perf_counter() - start, 3)
                except Exception as exc:
                    per[name] = -1.0
                    print(f"FAILED {name}: {exc!r}", file=sys.stderr)
                spark.sparkContext.setJobDescription(None)
            passes.append(per)
        timings = {n: min(p[n] for p in passes) for n in names}
        print(json.dumps({"sf": args.sf, "reps": args.reps, "queries": timings,
                          "passes": passes}))
    spark.stop()


if __name__ == "__main__":
    main()
