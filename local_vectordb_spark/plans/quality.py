"""Physical-plan introspection: the 100 TB design gate.

The reference executes imperatively with no plan at all (SURVEY §4);
on Spark the plan IS the performance contract. These helpers turn
``explain()`` output into assertable facts so tests can pin the plans
we want — filters pushed into the parquet scan, projections pruned,
small dimensions broadcast, no accidental sort-merge joins or extra
shuffles — and fail loudly when a refactor regresses the plan shape.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain(mode)`` prints)."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    plan = plan_string(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        inner = m.group(1).strip()
        if inner:
            out.extend(s.strip() for s in inner.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    plan = plan_string(df)
    scans: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [
            f.split(":")[0].strip() for f in m.group(1).split(",") if ":" in f
        ]
        scans.append(cols)
    return scans


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges in the final (AQE-aware) plan.

    Counts distinct Exchange operators in the formatted plan; with AQE
    enabled before execution this is the initial plan, which is the
    upper bound we assert against.
    """
    plan = plan_string(df)
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange SinglePartition", plan))


def broadcast_join_count(df: DataFrame) -> int:
    plan = plan_string(df)
    return len(re.findall(r"\bBroadcastHashJoin|\bBroadcastNestedLoopJoin", plan))


def sort_merge_join_count(df: DataFrame) -> int:
    plan = plan_string(df)
    return len(re.findall(r"\bSortMergeJoin", plan))
