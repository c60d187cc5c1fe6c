"""Data-skipping layout evidence: range-clustered Parquet writes produce
files whose footer min/max statistics are disjoint on the cluster key, so
selective scans prune whole files/row-groups — the layout contract that
makes a narrow predicate O(1) files at 100 TB instead of a full scan.

Checked on real written footers (pyarrow), not on plan text alone; filter
pushdown to the scan is asserted on the physical plan.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from songs_etl_spark.sources.writers import write_clustered

SF = "/root/testdata/sf0.001"
N_FILES = 8


@pytest.fixture(scope="module")
def clustered_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("skip") / "events_by_value")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    write_clustered(ev, path, cluster_by=("value",), n_files=N_FILES)
    return path


def _file_ranges(path: str, column: str):
    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        meta = pq.ParquetFile(f).metadata
        idx = meta.schema.names.index(column)
        lo = min(
            meta.row_group(g).column(idx).statistics.min for g in range(meta.num_row_groups)
        )
        hi = max(
            meta.row_group(g).column(idx).statistics.max for g in range(meta.num_row_groups)
        )
        ranges.append((lo, hi))
    return ranges


def test_file_ranges_disjoint_on_cluster_key(clustered_path):
    ranges = sorted(_file_ranges(clustered_path, "value"))
    assert len(ranges) == N_FILES
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert lo_a <= hi_a
        # range-partitioned: next file starts at or after this one ends
        assert hi_a <= lo_b, f"overlapping file ranges {hi_a} > {lo_b}"


def test_narrow_predicate_touches_few_files(clustered_path):
    ranges = sorted(_file_ranges(clustered_path, "value"))
    full_lo, full_hi = ranges[0][0], max(hi for _, hi in ranges)
    width = (full_hi - full_lo) / 100.0
    q_lo, q_hi = full_lo + 50 * width, full_lo + 51 * width
    touched = [r for r in ranges if not (r[1] < q_lo or r[0] > q_hi)]
    assert len(touched) <= 2, f"1%-wide predicate overlaps {len(touched)}/{N_FILES} files"


def test_filter_pushed_to_scan(spark, clustered_path):
    df = spark.read.parquet(clustered_path).filter(
        (F.col("value") >= 100.0) & (F.col("value") <= 101.0)
    ).select("event_id", "value")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(value,100.0)" in plan
    assert "LessThanOrEqual(value,101.0)" in plan


def test_skipped_scan_returns_same_rows_as_full(spark, clustered_path):
    got = (
        spark.read.parquet(clustered_path)
        .filter((F.col("value") >= 100.0) & (F.col("value") <= 101.0))
        .count()
    )
    want = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter((F.col("value") >= 100.0) & (F.col("value") <= 101.0))
        .count()
    )
    assert got == want and want > 0


class TestZOrderLayout:
    """Z-order clustering bounds BOTH dimensions per file, so either-column
    predicates prune — the multi-dim upgrade over single-key range layout."""

    @pytest.fixture(scope="class")
    def zpath(self, spark, tmp_path_factory):
        from songs_etl_spark.plans.analytics import zorder_key

        path = str(tmp_path_factory.mktemp("skip") / "events_by_z")
        ev = spark.read.parquet(f"{SF}/events.parquet").select(
            "event_id",
            F.pmod(F.col("user_id"), F.lit(1024)).alias("xb"),
            F.pmod(F.floor("value").cast("bigint"), F.lit(1024)).alias("yb"),
        )
        z = ev.withColumn("zval", zorder_key(F.col("xb"), F.col("yb")))
        write_clustered(z, path, cluster_by=("zval",), n_files=16)
        return path

    def test_both_dimensions_bounded_per_file(self, zpath):
        # every file covers a z-range -> its x and y spans are each far
        # narrower than the full 0..1023 domain for most files
        xr = _file_ranges(zpath, "xb")
        yr = _file_ranges(zpath, "yb")
        assert len(xr) == 16
        narrow_x = sum(1 for lo, hi in xr if hi - lo <= 512)
        narrow_y = sum(1 for lo, hi in yr if hi - lo <= 512)
        assert narrow_x >= 12, f"only {narrow_x}/16 files x-bounded"
        assert narrow_y >= 12, f"only {narrow_y}/16 files y-bounded"

    def test_box_predicate_prunes_files(self, zpath):
        xr = _file_ranges(zpath, "xb")
        yr = _file_ranges(zpath, "yb")
        # quarter box of the ACTUAL data domain in each dimension
        x_lo, x_hi = min(lo for lo, _ in xr), max(hi for _, hi in xr)
        y_lo, y_hi = min(lo for lo, _ in yr), max(hi for _, hi in yr)
        bx = x_lo + (x_hi - x_lo) // 4
        by = y_lo + (y_hi - y_lo) // 4
        touched = sum(
            1
            for (xlo, xhi), (ylo, yhi) in zip(xr, yr)
            if not (xhi < x_lo or xlo > bx) and not (yhi < y_lo or ylo > by)
        )
        assert touched < 16, "z-order layout pruned nothing for a box predicate"
