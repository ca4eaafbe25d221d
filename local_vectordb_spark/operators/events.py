"""Event-stream operators, batch-first (SURVEY §2.5 north-star ops).

Tumbling / sliding windows and sessionization over the `events` table
using the same `F.window` / `F.session_window` constructs that run
unchanged under Structured Streaming (streaming/ingest.py wires them to
readStream). Batch execution means one shuffle on the grouping key;
window assignment itself is a narrow map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Fixed windows: count + sum(value) per (window_start, *group)."""
    return (
        events.groupBy(F.window(ts_col, duration).alias("w"), *group_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), *group_cols, "n_events", "sum_value")
    )


def sliding(
    events: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    return (
        events.groupBy(F.window(ts_col, duration, slide).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Session windows per user: a session extends while successive
    events arrive within `gap`. `F.session_window` is the native
    stateful construct (streaming-ready); the oracle equivalent is the
    classic lag/gap/cumulative-sum rewrite.
    """
    return (
        events.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(user_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
