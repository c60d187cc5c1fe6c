"""Registry of (Spark query, DuckDB oracle) pairs — the correctness contract.

Every operator the engine claims is represented here as a callable
``fn(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an ANSI-SQL
oracle that DuckDB runs against the same Parquet tables. The verify driver
compares row count + schema + order-insensitive value hash, so:

- **column names must match exactly** (alias everything, both sides);
- **values must match bit-for-bit** — see the determinism policy below.

Determinism policy (cross-engine float discipline)
--------------------------------------------------
Floating-point sums are order-dependent; Spark's partial aggregation and
DuckDB's sequential scan would disagree in the last ulp, and any rounding of
a nondeterministic double can flip a digit. Rules used by every query here:

1. Money/measure aggregates: cast per-row doubles to ``DECIMAL(18,4)``
   *before* aggregating (testdata values carry ≤4 decimals, so the cast is
   exact), aggregate in decimal (exact, order-independent), and cast the
   result to an explicit ``DECIMAL(p,2)`` on both sides.
2. Averages/ratios: exact (decimal or integer) sums cast to double, divided
   by exact counts — bit-identical on both engines with no rounding.
3. Doubles produced by a deterministic per-row expression chain (no
   reordered accumulation) may be emitted raw.
4. Timestamps are formatted to strings explicitly (``date_format`` /
   ``strftime``) — never emitted as native timestamp values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""  # SURVEY.md §2 operator ids this query covers
    bench: bool = False  # included in bench.py headline set
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query callable with its oracle SQL."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench, tags=tags)
        return fn

    return wrap
