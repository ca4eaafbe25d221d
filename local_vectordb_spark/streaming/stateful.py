"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the escape hatch for stateful semantics the built-in
windows can't express: an ever-running per-user accumulator that emits
updated lifetime totals every micro-batch (the streaming analogue of a
running GROUP BY with no window boundary).

State is one small tuple per user — Arrow-batched per group, bounded by
cardinality(user_id), partitioned by the grouping key so each executor
owns a disjoint key range.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def _update_totals(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Lifetime (n_events, sum_value) per user, updated per micro-batch."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
