"""Hand-computed tests for the as-of join operator (operators/temporal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from songs_etl_spark.operators.temporal import asof_join


def make(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn("ts", F.to_timestamp("ts"))


def test_asof_join_picks_latest_prior(spark):
    left = make(
        spark,
        [
            (1, "2024-01-01 10:00:00", "p1"),
            (1, "2024-01-01 12:00:00", "p2"),
            (2, "2024-01-01 09:00:00", "p3"),  # before any right row
        ],
        "user_id bigint, ts string, pid string",
    )
    right = make(
        spark,
        [
            (1, "2024-01-01 09:30:00", "c1"),
            (1, "2024-01-01 11:00:00", "c2"),
            (1, "2024-01-01 13:00:00", "c3"),  # after every left row
            (2, "2024-01-01 09:30:00", "c4"),
        ],
        "user_id bigint, ts string, cid string",
    )
    got = {
        r.pid: r.asof_cid
        for r in asof_join(left, right, ["user_id"], "ts", ["cid"]).collect()
    }
    assert got == {"p1": "c1", "p2": "c2", "p3": None}


def test_asof_join_same_instant_matches(spark):
    left = make(spark, [(1, "2024-01-01 10:00:00", "p1")], "user_id bigint, ts string, pid string")
    right = make(spark, [(1, "2024-01-01 10:00:00", "c1")], "user_id bigint, ts string, cid string")
    rows = asof_join(left, right, ["user_id"], "ts", ["cid"]).collect()
    # Inclusive semantics: a right row at exactly left.ts is visible.
    assert rows[0].asof_cid == "c1"


def test_asof_join_null_payload_comes_from_matched_row(spark):
    """merge_asof/wj semantics: the payload is the MATCHED row's wholesale.
    A NULL field in the latest prior right row must stay NULL — not be
    resurrected from an older right row (pre-fix, per-column last(ignorenulls)
    carried each field independently)."""
    left = make(spark, [(1, "2024-01-01 12:00:00", "p1")], "user_id bigint, ts string, pid string")
    right = make(
        spark,
        [
            (1, "2024-01-01 09:00:00", "old", 100),
            (1, "2024-01-01 11:00:00", None, 200),  # matched row: cid NULL
        ],
        "user_id bigint, ts string, cid string, score bigint",
    )
    rows = asof_join(left, right, ["user_id"], "ts", ["cid", "score"]).collect()
    assert rows[0].asof_cid is None and rows[0].asof_score == 200


def test_asof_join_tolerance_masks_by_matched_row_ts(spark):
    """With tolerance, a field NULL in the fresh matched row must NOT pass
    the mask carrying a stale older value (the round-6 ADVICE divergence)."""
    left = make(spark, [(1, "2024-01-01 12:00:00", "p1")], "user_id bigint, ts string, pid string")
    right = make(
        spark,
        [
            (1, "2024-01-01 08:00:00", "stale", 100),   # 4 h old: outside tolerance
            (1, "2024-01-01 11:30:00", None, 200),       # 30 min old: inside
        ],
        "user_id bigint, ts string, cid string, score bigint",
    )
    rows = asof_join(
        left, right, ["user_id"], "ts", ["cid", "score"],
        tolerance_ms=3_600_000,
    ).collect()
    # matched row (11:30) is fresh → its payload wholesale: cid NULL, score 200
    assert rows[0].asof_cid is None and rows[0].asof_score == 200


def test_asof_join_tolerance_all_stale_is_no_match(spark):
    left = make(spark, [(1, "2024-01-01 12:00:00", "p1")], "user_id bigint, ts string, pid string")
    right = make(
        spark,
        [(1, "2024-01-01 08:00:00", "stale", 100)],
        "user_id bigint, ts string, cid string, score bigint",
    )
    rows = asof_join(
        left, right, ["user_id"], "ts", ["cid", "score"],
        tolerance_ms=3_600_000,
    ).collect()
    assert rows[0].asof_cid is None and rows[0].asof_score is None


def test_asof_join_forward_picks_earliest_following(spark):
    left = make(
        spark,
        [(1, "2024-01-01 10:00:00", "p1"), (1, "2024-01-01 12:30:00", "p2")],
        "user_id bigint, ts string, pid string",
    )
    right = make(
        spark,
        [
            (1, "2024-01-01 09:00:00", "before"),
            (1, "2024-01-01 11:00:00", "c1"),
            (1, "2024-01-01 13:00:00", "c2"),
        ],
        "user_id bigint, ts string, cid string",
    )
    got = {
        r.pid: r.asof_cid
        for r in asof_join(
            left, right, ["user_id"], "ts", ["cid"], direction="forward"
        ).collect()
    }
    assert got == {"p1": "c1", "p2": "c2"}


def test_asof_join_forward_same_instant_and_tolerance(spark):
    left = make(spark, [(1, "2024-01-01 10:00:00", "p1"),
                        (1, "2024-01-01 06:00:00", "p0")],
                "user_id bigint, ts string, pid string")
    right = make(spark, [(1, "2024-01-01 10:00:00", "c_same")],
                 "user_id bigint, ts string, cid string")
    got = {
        r.pid: r.asof_cid
        for r in asof_join(
            left, right, ["user_id"], "ts", ["cid"],
            direction="forward", tolerance_ms=3_600_000,
        ).collect()
    }
    # inclusive at the same instant; 4 h early is outside the 1 h window
    assert got == {"p1": "c_same", "p0": None}


def test_asof_join_nearest_picks_closer_side_ties_backward(spark):
    left = make(
        spark,
        [
            (1, "2024-01-01 10:00:00", "closer_after"),   # prior 2h, next 1h
            (1, "2024-01-01 16:00:00", "closer_before"),  # prior 30min, next 4h
            (2, "2024-01-01 12:00:00", "tie"),            # 1h both sides
        ],
        "user_id bigint, ts string, pid string",
    )
    right = make(
        spark,
        [
            (1, "2024-01-01 08:00:00", "a"),
            (1, "2024-01-01 11:00:00", "b"),
            (1, "2024-01-01 15:30:00", "c"),
            (1, "2024-01-01 20:00:00", "d"),
            (2, "2024-01-01 11:00:00", "t_before"),
            (2, "2024-01-01 13:00:00", "t_after"),
        ],
        "user_id bigint, ts string, cid string",
    )
    got = {
        r.pid: r.asof_cid
        for r in asof_join(
            left, right, ["user_id"], "ts", ["cid"], direction="nearest"
        ).collect()
    }
    assert got == {"closer_after": "b", "closer_before": "c", "tie": "t_before"}


def test_asof_join_nearest_tolerance_masks_each_side(spark):
    left = make(spark, [(1, "2024-01-01 12:00:00", "p1")],
                "user_id bigint, ts string, pid string")
    right = make(
        spark,
        [(1, "2024-01-01 07:00:00", "old"), (1, "2024-01-01 13:30:00", "late_ok")],
        "user_id bigint, ts string, cid string",
    )
    rows = asof_join(
        left, right, ["user_id"], "ts", ["cid"],
        direction="nearest", tolerance_ms=2 * 3_600_000,
    ).collect()
    # prior click is 5 h stale (masked); following click is within 2 h
    assert rows[0].asof_cid == "late_ok"


def test_asof_join_intra_timestamp_ties_deterministic(spark):
    """Round-7 ADVICE: multiple right rows at the same (partition, ts) must
    resolve deterministically across shuffles — the carry is max/min over a
    (matched_ts, payload…) struct, so backward picks the GREATEST payload
    struct and forward the LEAST, independent of partitioning."""
    left = make(
        spark,
        [(1, "2024-01-01 12:00:00", "after"), (1, "2024-01-01 10:00:00", "before")],
        "user_id bigint, ts string, pid string",
    )
    dup_rows = [
        (1, "2024-01-01 11:00:00", "a", 7),
        (1, "2024-01-01 11:00:00", "z", 3),  # same-instant duplicates
    ]
    schema = "user_id bigint, ts string, cid string, event_id bigint"
    expected_back = ("z", 3)   # greatest (cid, event_id) struct
    expected_fwd = ("a", 7)    # least
    for nparts in (1, 7, 32):
        right = make(spark, dup_rows, schema).repartition(nparts)
        back = {
            r.pid: (r.asof_cid, r.asof_event_id)
            for r in asof_join(
                left, right, ["user_id"], "ts", ["cid", "event_id"]
            ).collect()
        }
        fwd = {
            r.pid: (r.asof_cid, r.asof_event_id)
            for r in asof_join(
                left, right, ["user_id"], "ts", ["cid", "event_id"],
                direction="forward",
            ).collect()
        }
        assert back["after"] == expected_back and back["before"] == (None, None)
        assert fwd["before"] == expected_fwd and fwd["after"] == (None, None)


def test_asof_join_partition_isolation(spark):
    left = make(spark, [(1, "2024-01-01 10:00:00", "p1")], "user_id bigint, ts string, pid string")
    right = make(spark, [(2, "2024-01-01 09:00:00", "c1")], "user_id bigint, ts string, cid string")
    rows = asof_join(left, right, ["user_id"], "ts", ["cid"]).collect()
    # A prior row under a different key never leaks across partitions.
    assert rows[0].asof_cid is None


def test_asof_join_strict_excludes_same_instant(spark):
    """allow_exact_matches=False (pandas merge_asof parity): a right row at
    the left row's own timestamp must NOT match in any direction; strictly
    prior/following rows still do."""
    left = make(
        spark,
        [(1, "2024-01-01 12:00:00", "p")],
        "user_id bigint, ts string, pid string",
    )
    right = make(
        spark,
        [
            (1, "2024-01-01 12:00:00", "same"),
            (1, "2024-01-01 11:00:00", "prior"),
            (1, "2024-01-01 13:00:00", "next"),
        ],
        "user_id bigint, ts string, cid string",
    )
    back = asof_join(
        left, right, ["user_id"], "ts", ["cid"], allow_exact_matches=False
    ).collect()[0]
    assert back.asof_cid == "prior"
    fwd = asof_join(
        left, right, ["user_id"], "ts", ["cid"],
        direction="forward", allow_exact_matches=False,
    ).collect()[0]
    assert fwd.asof_cid == "next"
    # inclusive mode unchanged: same-instant row wins in both directions
    inc = asof_join(left, right, ["user_id"], "ts", ["cid"]).collect()[0]
    assert inc.asof_cid == "same"
    # nearest strict: same-instant excluded, prior wins the tie (equal gaps)
    near = asof_join(
        left, right, ["user_id"], "ts", ["cid"],
        direction="nearest", allow_exact_matches=False,
    ).collect()[0]
    assert near.asof_cid == "prior"
