"""Time-series joins Spark lacks as built-ins: as-of join and banded
time-range join (north-star ops beyond the reference surface — the
reference has no time-series joins at all).

Both are implemented as *compositions of DataFrame ops* (the preferred
strategy for custom operators), not UDFs, so the hot path stays in
whole-stage codegen:

- **as-of join** is the union+carry-forward formulation: tag both
  sides, union, and take `last(value, ignoreNulls)` over a window
  ordered by time — the distributed equivalent of the classic merge
  walk. One shuffle on the `by` key; no per-row subquery, no range
  condition for the planner to turn into a nested-loop join.
- **band join** ("all right rows within ±tolerance of a left row")
  buckets time into tolerance-sized cells and equi-joins on
  (key, cell) after exploding each left row into its three candidate
  cells, then applies the exact band filter. The equi-join keeps the
  shuffle hash-partitioned; candidates per row are bounded by the
  band, never by the table — the standard scalable rewrite of an
  interval cross join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_asof",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the `value_cols` of the latest right
    row with the same `by_cols` key and `right.ts <= left.ts`
    (backward as-of; ties at equal ts match — DuckDB ASOF / pandas
    `merge_asof` semantics). Left rows with no prior right row get
    nulls (left-join semantics).

    `right_tiebreak`: optional right-side column ordering concurrent
    right rows (the greatest wins), making the pick deterministic when
    right timestamps collide.

    Output: every left column plus `{v}{suffix}` per value column.
    One shuffle on `by_cols`; window state per key is O(1) (running
    last), so skewed keys cost sort time, not memory.
    """
    lcols = left.columns
    tb = ["_tb"] if right_tiebreak is not None else []

    l = left.withColumn("_is_left", F.lit(1))
    for c in value_cols:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    if right_tiebreak is not None:
        l = l.withColumn(
            "_tb", F.lit(None).cast(right.schema[right_tiebreak].dataType)
        )

    r = right.select(
        *by_cols,
        ts_col,
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        *([F.col(right_tiebreak).alias("_tb")] if right_tiebreak else []),
    ).withColumn("_is_left", F.lit(0))
    for c in lcols:
        if c not in (*by_cols, ts_col):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    u = l.unionByName(r)
    # At equal ts every right row must sort BEFORE the left row so the
    # window ending at the left row includes it → ties match. Left rows
    # carry a null tiebreak, so order _tb nulls-LAST (nulls-first would
    # push left rows ahead of equal-ts right rows and break tie
    # matching). Among concurrent right rows the greatest tiebreak
    # sorts last and wins the last().
    order = [F.col(ts_col).asc(), *[F.col(c).asc_nulls_last() for c in tb], F.col("_is_left").asc()]
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u
    for c in value_cols:
        filled = filled.withColumn(
            f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    return filled.filter(F.col("_is_left") == 1).select(
        *lcols, *[F.col(f"_r_{c}").alias(f"{c}{suffix}") for c in value_cols]
    )


def band_join_count(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: Sequence[str],
    tolerance_s: int,
    count_alias: str = "n_band",
    unique_key: str | None = None,
    validate_unique: bool = False,
) -> DataFrame:
    """Count, for each left row, the right rows with the same `by_cols`
    key whose timestamp lies within ±`tolerance_s` seconds (the banded
    time-range join, e.g. "clicks within a minute of each error").

    Rewrite: cell = floor(epoch/tolerance); a band of width ±tol can
    only intersect the left row's cell and its two neighbours, so the
    left side explodes into 3 candidate cells and the join is a plain
    equi-join on (key…, cell) + the exact |Δt| ≤ tol filter. Left rows
    with no neighbours keep count 0 (left join + conditional count).

    `unique_key` is a TRUSTED contract: it skips the row_number
    disambiguator, so if the declared column is NOT actually unique,
    left rows sharing a key value silently collapse into one output
    row — the exact bug the fallback exists to prevent. Pass
    `validate_unique=True` to pay one counting job that raises on a
    violated contract (debug/test tool; leave off on the hot path).
    """
    from local_vectordb_spark.functions.timeutil import epoch_micros

    rid = "__band_rid__"
    if rid in left.columns:
        raise ValueError(
            f"band_join_count: left side already has a {rid!r} column"
        )
    # dtype-branching epoch helper: PySpark 4.x reads the events table's
    # parquet TIMESTAMP(NANOS) as TIMESTAMP_NTZ, which unix_micros
    # rejects — resolve per side since left/right schemas may differ.
    l_micros = epoch_micros(left, ts_col)
    r_micros = epoch_micros(right, ts_col)
    tol_us = int(tolerance_s) * 1_000_000
    cell = F.floor(l_micros / F.lit(tol_us))
    r_cell = F.floor(r_micros / F.lit(tol_us))
    # A per-input-row disambiguator keeps fully duplicate left rows
    # from collapsing into one output row in the regrouping after the
    # explode. With a caller-declared `unique_key` the key itself is
    # the disambiguator — zero extra cost, the 100 TB path. Otherwise
    # row_number partitioned by ALL left columns: DETERMINISTIC under
    # task retries (identical rows are interchangeable, so any 1..m
    # numbering yields the same groups) — unlike
    # monotonically_increasing_id, which can re-assign ids when an
    # unstable upstream partitioning is recomputed and silently
    # split/merge groups — but it costs one extra full-row shuffle.
    if unique_key is not None:
        if validate_unique:
            total, distinct = left.agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct(F.col(unique_key)).alias("d"),
            ).first()
            if total != distinct:
                raise ValueError(
                    f"band_join_count: unique_key={unique_key!r} is not "
                    f"unique ({total} rows, {distinct} distinct values) — "
                    "duplicate left rows would silently collapse"
                )
        lk = left.withColumn(rid, F.col(unique_key))
    else:
        w = Window.partitionBy(*left.columns).orderBy(F.lit(1))
        lk = left.withColumn(rid, F.row_number().over(w))
    lk = lk.withColumn("_l_us", l_micros).withColumn(
        "_cell", F.explode(F.array(cell - 1, cell, cell + 1))
    )
    rk = right.select(*by_cols, r_cell.alias("_cell"), r_micros.alias("_r_us"))
    joined = lk.join(rk, [*by_cols, "_cell"], "left")
    hit = (
        F.col("_r_us").isNotNull()
        & (F.abs(F.col("_l_us") - F.col("_r_us")) <= tol_us)
    ).cast("long")
    return (
        joined.groupBy(rid, *left.columns)
        .agg(F.coalesce(F.sum(hit), F.lit(0)).alias(count_alias))
        .drop(rid)
    )
