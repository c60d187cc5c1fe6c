"""BPE trainer stress at PRODUCTION round counts (round-6 verdict task 2).

The batched trainer's entire argument is driver-barrier count: a production
tokenizer is 30k+ merges, and `bpe_train_merges` pays one Spark job + one
collect PER MERGE while `bpe_train_merges_batched` pays ~R/K. The registered
oracle regime (R=8) cannot show that, so this harness trains R>=512 merges on
the scale-stress 10x corpus for both trainers and several K values,
recording wall time, the MEASURED barrier count (which bakes in the
conflict/tie truncation rate — the unknown the verdict asked to
characterize), and bit-equality of the full merge tables.

Usage:
    python tools/bpe_stress.py [--rounds 512] [--mult 10] [--ks 4,16,64,256]
        [--base /root/testdata/sf0.1] [--skip-sequential]

Reuses .scale_stress/m{mult} when present (build it via
`tools/scale_stress.py --no-clean`); builds it otherwise.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=512)
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--ks", default="4,16,64,256")
    ap.add_argument(
        "--skip-sequential",
        action="store_true",
        help="measure only the batched legs (the sequential leg is ~R jobs)",
    )
    args = ap.parse_args()
    ks = [int(k) for k in args.ks.split(",")]

    from songs_etl_spark.plans.text import (
        _base_words,
        _train_bpe_batched_core,
        _train_bpe_core,
    )
    from songs_etl_spark.session import get_spark
    from tools.scale_stress import STRESS_ROOT, build_corpus

    spark = get_spark("bpe-stress")
    out_dir = os.path.join(STRESS_ROOT, f"m{args.mult}")
    if not os.path.isdir(f"{out_dir}/documents.parquet"):
        build_corpus(spark, args.base, out_dir, args.mult)

    base = _base_words(spark, out_dir).persist()
    n_words = base.count()
    print(f"-- m{args.mult}: {n_words} distinct words, R={args.rounds}")

    results: dict[str, dict] = {}
    seq_rows = None
    if not args.skip_sequential:
        t0 = time.perf_counter()
        seq_rows, seq_words = _train_bpe_core(base, args.rounds)
        secs = round(time.perf_counter() - t0, 2)
        seq_words.unpersist()
        results["sequential"] = {
            "secs": secs,
            "barriers": len(seq_rows),
            "merges": len(seq_rows),
        }
        print(f"   sequential        {secs:8.2f} s  {len(seq_rows)} barriers")

    for k in ks:
        t0 = time.perf_counter()
        rows, words, barriers = _train_bpe_batched_core(base, args.rounds, k=k)
        secs = round(time.perf_counter() - t0, 2)
        words.unpersist()
        equal = None
        if seq_rows is not None:
            equal = rows == seq_rows
            if not equal:
                raise AssertionError(
                    f"batched K={k} diverged from sequential at R={args.rounds}"
                )
        results[f"batched_k{k}"] = {
            "secs": secs,
            "barriers": barriers,
            "merges": len(rows),
            "bit_equal_to_sequential": equal,
        }
        eq = "" if equal is None else ("  == sequential" if equal else "  DIVERGED")
        print(
            f"   batched K={k:<4d}    {secs:8.2f} s  {barriers} barriers "
            f"({len(rows) / max(barriers, 1):.1f} merges/round){eq}"
        )

    base.unpersist()
    print(json.dumps({"n_words": n_words, "rounds": args.rounds, "results": results}))

    print("\n| trainer | wall (s) | driver barriers | merges/barrier |")
    print("|---|---|---|---|")
    for name, r in results.items():
        print(
            f"| {name} | {r['secs']} | {r['barriers']} | "
            f"{r['merges'] / max(r['barriers'], 1):.1f} |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
