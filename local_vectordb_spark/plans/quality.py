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


# -- broadcast-build audit (the 100x OOM gate) ------------------------------
#
# An explicit ``F.broadcast()`` hint OVERRIDES autoBroadcastJoinThreshold:
# if the hinted side grows with the data (orders/customer/lineitem at
# 100 TB), the driver must materialize it whole and dies. Only
# SF-invariant sides (nation=25, region=5) or cardinality-reduced subtrees
# (a 1-row aggregate, a top-k) may be force-broadcast. These helpers read
# the physical plan and report every parquet scan that feeds a
# BroadcastExchange, noting whether a cardinality reducer (aggregate /
# limit) sits on the path between them.

_SCAN_TABLE_RE = re.compile(
    r"(?:FileScan|Scan)\b[^\n]*?/([A-Za-z0-9_]+)\.parquet"
)
_CARDINALITY_REDUCERS = re.compile(
    r"HashAggregate|SortAggregate|ObjectHashAggregate"
    r"|TakeOrderedAndProject|GlobalLimit|LocalLimit|CollectLimit"
)


def _tree_depth(line: str) -> int:
    """Column where the operator name starts in a simple-mode plan tree."""
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def broadcast_build_scans(df: DataFrame) -> list[tuple[str, bool]]:
    """Every parquet table scanned under a BroadcastExchange.

    Returns ``(table_name, reduced)`` pairs, where ``reduced`` is True
    when an aggregate/limit sits between the exchange and the scan (so
    the broadcast cardinality does not scale with the table).
    """
    lines = plan_string(df, "simple").splitlines()
    depths = [_tree_depth(ln) for ln in lines]
    out: list[tuple[str, bool]] = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        d = depths[i]
        j = i + 1
        while j < len(lines) and depths[j] > d:
            m = _SCAN_TABLE_RE.search(lines[j])
            if m:
                reduced = False
                cur = depths[j]
                for k in range(j - 1, i, -1):
                    if depths[k] < cur:  # ancestor of the scan
                        cur = depths[k]
                        if _CARDINALITY_REDUCERS.search(lines[k]):
                            reduced = True
                out.append((m.group(1), reduced))
            j += 1
    return out


def unreduced_fact_broadcasts(
    df: DataFrame,
    facts: tuple[str, ...] = ("orders", "customer", "lineitem", "part", "supplier"),
) -> list[str]:
    """Fact-table scans force-broadcast without a cardinality reducer.

    Evaluate with ``spark.sql.autoBroadcastJoinThreshold=-1`` so the
    only BroadcastExchanges left in the plan are hint-forced ones; any
    name this returns is a join that would OOM the driver at 100x.
    """
    return [t for t, reduced in broadcast_build_scans(df) if t in facts and not reduced]
