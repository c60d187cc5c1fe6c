"""Unit tests for the scalar/array function library (functions/*): casts with
coerce semantics, the release-date precision quirk, tokenization/shingling,
vector math, and surrogate-key determinism."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from songs_etl_spark.functions.casts import parse_release_date, try_iso_timestamp
from songs_etl_spark.functions.keys import surrogate_key
from songs_etl_spark.functions.text import char_ngrams, tokens, word_shingles
from songs_etl_spark.functions.vectors import cosine_similarity, dot, l2_norm


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_try_iso_timestamp_variants(spark):
    df = spark.createDataFrame(
        [("2024-05-01T10:00:00Z",), ("2024-05-01 10:00:00",), ("garbage",), (None,)],
        "s string",
    )
    got = [r.v for r in df.select(try_iso_timestamp("s").alias("v")).collect()]
    assert got[0] == got[1]
    assert got[0] is not None and got[0].hour == 10
    assert got[2] is None and got[3] is None


def test_parse_release_date_precisions(spark):
    df = spark.createDataFrame(
        [("2020",), ("2020-03",), ("2020-03-15",), ("03/2020",)], "s string"
    )
    got = [str(r.v) if r.v else None for r in df.select(parse_release_date("s").alias("v")).collect()]
    assert got == ["2020-01-01", "2020-03-01", "2020-03-15", None]


def test_tokens_and_shingles(spark):
    df = spark.createDataFrame([("The  quick, Brown-Fox! 99",)], "s string")
    toks = one(df.sparkSession, F.lit(None)) if False else df.select(tokens("s").alias("v")).collect()[0].v
    assert toks == ["the", "quick", "brown", "fox", "99"]
    sh = df.select(word_shingles(tokens("s"), 3).alias("v")).collect()[0].v
    assert sh == ["the quick brown", "quick brown fox", "brown fox 99"]
    # Fewer tokens than n → empty, not error.
    short = spark.createDataFrame([("one two",)], "s string")
    assert short.select(word_shingles(tokens("s"), 3).alias("v")).collect()[0].v == []


def test_char_ngrams(spark):
    df = spark.createDataFrame([("AbCd",)], "s string")
    assert df.select(char_ngrams("s", 2).alias("v")).collect()[0].v == ["ab", "bc", "cd"]


def test_vector_math_exact(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>")
    row = df.select(
        dot("a", "b").alias("d"),
        l2_norm("a").alias("na"),
        cosine_similarity("a", "b").alias("cos"),
    ).collect()[0]
    assert row.d == 32.0
    assert row.na == math.sqrt(14.0)
    assert abs(row.cos - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12


def test_cosine_zero_norm_is_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], "a array<double>, b array<double>")
    assert df.select(cosine_similarity("a", "b").alias("v")).collect()[0].v is None


def test_surrogate_key_is_sha2_prefix(spark):
    df = spark.createDataFrame([("pl1", "x")], "k string, other string")
    got = df.select(surrogate_key("k").alias("v")).collect()[0].v
    assert got == hashlib.sha256(b"pl1").hexdigest()[:10]
    # Multi-column keys separate with '|'.
    got2 = df.select(surrogate_key("k", "other").alias("v")).collect()[0].v
    assert got2 == hashlib.sha256(b"pl1|x").hexdigest()[:10]


def test_has_token_predicates_match_tokenize(spark):
    """has_token / has_min_tokens must be EXACTLY equivalent to filtering on
    size(tokens(text)) — they replace it inside pushed-down filters (the
    round-11 double-tokenize fix), so any divergence silently changes query
    results. Edge cases: empty, all-separator, unicode uppercase (İ lowers
    to i + combining dot — a real [a-z] char), digits-only runs, leading/
    trailing separators, single char, NULL."""
    from songs_etl_spark.functions.text import has_min_tokens, has_token

    rows = [
        ("",),
        ("   \t\n",),
        ("!!!---???",),
        ("a",),
        ("7",),
        ("hello",),
        ("  hello  ",),
        ("hello world",),
        ("one two three",),
        ("one,two;three.four",),
        ("..a..b..",),
        ("ÀÉÎ",),          # lowers to àéî: no [a-z0-9] run
        ("İstanbul",),      # lowers to i̇stanbul: has runs
        ("x" * 10000,),
        (("w " * 500).strip(),),
        (None,),
    ]
    df = spark.createDataFrame(rows, "text string")
    for n in (1, 2, 3, 5, 7):
        expected = [
            r.doc
            for r in df.selectExpr("text as doc")
            .filter(F.size(tokens("doc")) >= n)
            .collect()
        ]
        got = [
            r.doc
            for r in df.selectExpr("text as doc")
            .filter(has_min_tokens("doc", n))
            .collect()
        ]
        assert got == expected, f"n={n}: {got} != {expected}"
    # has_token is the n=1 case
    assert [
        r.doc for r in df.selectExpr("text as doc").filter(has_token("doc")).collect()
    ] == [
        r.doc
        for r in df.selectExpr("text as doc").filter(F.size(tokens("doc")) >= 1).collect()
    ]
