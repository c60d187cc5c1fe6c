"""Local mirror of the verify driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle on the same Parquet, compare row count +
column names + order-insensitive values with EXACT equality (full-precision
floats). If a query passes here it will pass the driver's value-hash.

Usage:
    python tools/oracle_check.py [--sf /root/testdata/sf0.001] [names...]
"""

from __future__ import annotations

import argparse
import datetime
import decimal
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def norm_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, bool):
        return str(v)
    # numpy scalars
    item = getattr(v, "item", None)
    if item is not None and not isinstance(v, (str, int)):
        return norm_cell(item())
    return str(v)


def frame_to_rows(pdf) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(tuple(norm_cell(v) for v in row) for row in pdf.itertuples(index=False))
    return cols, rows


def compare(name: str, spark, con, sf_dir: str) -> dict:
    from songs_etl_spark.plans import REGISTRY

    spec = REGISTRY[name]
    out: dict = {"name": name, "ok": False}
    try:
        df = spec.fn(spark, sf_dir)
        sdf = df.toPandas()
    except Exception:
        out["error"] = "spark: " + traceback.format_exc(limit=3)
        return out
    # Scale-quarantine guard (runs in the full-gate pytest too, so new
    # queries can't dodge it): a nested-loop join is only allowed when the
    # registry tags say why — 'baseline' (deliberate O(n²) exactness
    # anchor) or 'bcast-const' (constant-size broadcast side: 1-row
    # aggregate / ≤10-row query set — a map-side pass, not a pair scan).
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        plan = ""
    if ("BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan) and not (
        {"baseline", "bcast-const"} & set(spec.tags)
    ):
        out["error"] = (
            "untagged nested-loop join in executed plan — tag the query "
            "'baseline' or 'bcast-const' in the registry, or fix the plan"
        )
        return out
    if spec.oracle is None:
        out.update(ok=True, mode="rows-only", n=len(sdf))
        return out
    try:
        ddf = con.execute(spec.oracle).fetchdf()
    except Exception:
        out["error"] = "duckdb: " + traceback.format_exc(limit=3)
        return out
    s_cols, s_rows = frame_to_rows(sdf)
    d_cols, d_rows = frame_to_rows(ddf)
    out.update(n_spark=len(s_rows), n_duck=len(d_rows))
    if s_cols != d_cols:
        out["error"] = f"columns differ: spark={s_cols} duck={d_cols}"
        return out
    if len(s_rows) != len(d_rows):
        out["error"] = f"row count differs: spark={len(s_rows)} duck={len(d_rows)}"
        return out
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    if mismatches:
        i, a, b = mismatches[0]
        out["error"] = (
            f"{len(mismatches)}/{len(s_rows)} rows differ; first at sorted idx {i}:\n"
            f"  cols : {s_cols}\n  spark: {a}\n  duck : {b}"
        )
        return out
    out["ok"] = True
    out["mode"] = "oracle"
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from songs_etl_spark.plans import REGISTRY
    from songs_etl_spark.session import get_spark

    names = args.names or list(REGISTRY)
    spark = get_spark("oracle-check", cpus=min(8, os.cpu_count() or 8))
    con = duckdb_connection(args.sf)
    failures = 0
    for name in names:
        res = compare(name, spark, con, args.sf)
        status = "OK  " if res["ok"] else "FAIL"
        extra = res.get("mode", "")
        print(f"{status} {name:32s} {extra} n={res.get('n_spark', res.get('n', '?'))}")
        if not res["ok"]:
            failures += 1
            print("     " + res.get("error", "").replace("\n", "\n     "))
    print(f"\n{len(names) - failures}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
