"""Tests for operators/asof.py (as-of join, banded range join)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from local_vectordb_spark.operators.asof import asof_join_backward, band_join_count


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),
            (2, "u1", _ts("2024-01-01T12:00:00")),
            (3, "u2", _ts("2024-01-01T09:00:00")),  # no prior right row
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T09:30:00"), 10.0),
            ("u1", _ts("2024-01-01T11:00:00"), 20.0),
            ("u2", _ts("2024-01-01T09:30:00"), 99.0),  # after left → no match
        ],
        ["user_id", "ts", "value"],
    )
    out = {
        r.event_id: r.value_asof
        for r in asof_join_backward(left, right, "ts", ["user_id"], ["value"]).collect()
    }
    assert out == {1: 10.0, 2: 20.0, 3: None}


def test_asof_equal_ts_matches(spark):
    """A right row at exactly left.ts matches (>= semantics)."""
    t = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame([(1, "u1", t)], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame([("u1", t, 7.0)], ["user_id", "ts", "value"])
    [row] = asof_join_backward(left, right, "ts", ["user_id"], ["value"]).collect()
    assert row.value_asof == 7.0


def test_asof_tiebreak_deterministic(spark):
    """Concurrent right rows: greatest tiebreak wins."""
    t = _ts("2024-01-01T09:00:00")
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:00:00"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [("u1", t, 5.0, 100), ("u1", t, 6.0, 200)],
        ["user_id", "ts", "value", "seq"],
    )
    [row] = asof_join_backward(
        left, right, "ts", ["user_id"], ["value"], right_tiebreak="seq"
    ).collect()
    assert row.value_asof == 6.0


def test_band_join_count_matches_naive(spark, sf_dir):
    """Bucket-rewrite band join == naive inequality join on real data."""
    from local_vectordb_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    fast = {
        r.event_id: r.n
        for r in band_join_count(errors, clicks, "ts", ["user_id"], 600, "n").collect()
    }
    from local_vectordb_spark.functions.timeutil import epoch_micros

    clicks_renamed = clicks.select("user_id", F.col("ts").alias("c_ts"))
    joined = errors.join(clicks_renamed, "user_id", "left")
    naive = {
        r.event_id: r.n
        for r in joined.withColumn(
            "hit",
            (
                F.col("c_ts").isNotNull()
                & (
                    F.abs(epoch_micros(joined, "ts") - epoch_micros(joined, "c_ts"))
                    <= 600 * 1_000_000
                )
            ).cast("long"),
        )
        .groupBy("event_id")
        .agg(F.sum("hit").alias("n"))
        .collect()
    }
    assert fast == naive
    assert sum(fast.values()) > 0  # the band actually catches neighbours


def test_band_join_boundary_inclusive(spark):
    """A right row exactly tolerance away counts (≤ semantics), one
    microsecond beyond does not."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:01:00"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T10:00:00")),  # exactly 60s before
            ("u1", _ts("2024-01-01T10:02:00")),  # exactly 60s after
            ("u1", _ts("2024-01-01T10:02:00.000001")),  # 60s + 1µs
        ],
        ["user_id", "ts"],
    )
    [row] = band_join_count(left, right, "ts", ["user_id"], 60, "n").collect()
    assert row.n == 2


def test_asof_equal_ts_matches_with_tiebreak(spark):
    """ADVICE r1: equal-ts right row must still match when
    right_tiebreak is set (left rows carry a null tiebreak and must
    sort AFTER equal-ts right rows, not before)."""
    t = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame([(1, "u1", t)], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [("u1", t, 7.0, 100), ("u1", t, 8.0, 200)],
        ["user_id", "ts", "value", "seq"],
    )
    [row] = asof_join_backward(
        left, right, "ts", ["user_id"], ["value"], right_tiebreak="seq"
    ).collect()
    assert row.value_asof == 8.0  # matched, and greatest tiebreak won


def test_band_join_duplicate_left_rows_preserved(spark):
    """ADVICE r1: fully duplicate left rows each produce their own
    output row (grouping carries a unique per-row id)."""
    t = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame(
        [("u1", t), ("u1", t)], ["user_id", "ts"]  # identical rows
    )
    right = spark.createDataFrame([("u1", t)], ["user_id", "ts"])
    rows = band_join_count(left, right, "ts", ["user_id"], 60, "n").collect()
    assert len(rows) == 2
    assert [r.n for r in rows] == [1, 1]


def test_band_join_unique_key_matches_rownumber_path(spark, sf_dir):
    """The unique_key fast path (no full-row window shuffle) must
    return exactly what the row_number fallback returns when the key
    really is unique."""
    from local_vectordb_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    slow = band_join_count(errors, clicks, "ts", ["user_id"], 600, "n")
    fast = band_join_count(
        errors, clicks, "ts", ["user_id"], 600, "n", unique_key="event_id"
    )
    assert sorted(map(tuple, slow.collect())) == sorted(map(tuple, fast.collect()))


def test_band_join_validate_unique_raises_on_duplicate_key(spark):
    """ADVICE r5: the unique_key contract is trusted on the hot path;
    validate_unique=True pays one counting job and raises when the
    declared key is not actually unique instead of silently collapsing
    duplicate left rows."""
    import pytest

    t = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame(
        [("e1", "u1", t), ("e1", "u2", t)], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame([("u1", t)], ["user_id", "ts"])
    with pytest.raises(ValueError, match="not unique"):
        band_join_count(
            left, right, "ts", ["user_id"], 60, "n",
            unique_key="event_id", validate_unique=True,
        )
    # a genuinely unique key passes validation
    ok_left = spark.createDataFrame(
        [("e1", "u1", t), ("e2", "u2", t)], ["event_id", "user_id", "ts"]
    )
    rows = band_join_count(
        ok_left, right, "ts", ["user_id"], 60, "n",
        unique_key="event_id", validate_unique=True,
    ).collect()
    assert len(rows) == 2
