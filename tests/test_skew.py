"""salted_join must be a drop-in for a plain equi-join under skew."""

from __future__ import annotations

from collections import Counter

import pytest

from songs_etl_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 'hot' carries 500 of 520 left rows — the shape that melts one reducer.
    left = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [(f"k{i}", i) for i in range(20)],
        "k string, lv bigint",
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("k3", "A"), ("k7", "B"), ("absent", "Z")], "k string, rv string"
    )
    return left, right


def multiset(rows):
    return Counter(tuple(r) for r in rows)


def test_salted_inner_equals_plain(spark, skewed):
    left, right = skewed
    plain = left.join(right, ["k"]).select("k", "lv", "rv").collect()
    salted = salted_join(left, right, ["k"], n_salts=8).select("k", "lv", "rv").collect()
    assert multiset(salted) == multiset(plain)
    assert len(plain) == 502  # 500 hot + k3 + k7


def test_salted_left_outer_equals_plain(spark, skewed):
    left, right = skewed
    plain = left.join(right, ["k"], "left").select("k", "lv", "rv").collect()
    salted = salted_join(left, right, ["k"], n_salts=8, how="left").select(
        "k", "lv", "rv"
    ).collect()
    assert multiset(salted) == multiset(plain)


def test_salt_actually_spreads(spark, skewed):
    left, _ = skewed
    from songs_etl_spark.operators.skew import SALT_COL
    import pyspark.sql.functions as F

    salted = left.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8))
    )
    n_buckets = salted.filter(F.col("k") == "hot").select(SALT_COL).distinct().count()
    assert n_buckets >= 6  # hot key spread over most of the 8 salts


def test_rejects_right_outer(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="full")
