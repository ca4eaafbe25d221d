"""Timestamp-dtype helpers.

PySpark 4.x reads parquet ``TIMESTAMP(NANOS)`` columns (the driver's
``events.ts``) as ``TIMESTAMP_NTZ`` — the session-timezone-free type
that matches DuckDB's naive ``timestamp`` semantics exactly — while
3.x-era code paths (and ``spark.sql.legacy.parquet.nanosAsLong``) saw
either ``LONG`` or session-local ``TIMESTAMP``. ``F.unix_micros``
rejects NTZ outright (``DATATYPE_MISMATCH``), so every epoch consumer
goes through :func:`epoch_micros`, which branches on the actual column
dtype and stays timezone-independent for NTZ input.

Capability anchor: the reference has no time-series ops at all; this
underpins the north-star event-stream family (as-of / band joins,
inter-arrival) over the driver's ``events`` table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType


def epoch_micros(df: DataFrame, ts_col: str) -> Column:
    """Microseconds since the Unix epoch for ``df[ts_col]``, for any of
    the three timestamp representations the events table can arrive in:

    - ``TIMESTAMP_NTZ`` (PySpark 4.x parquet-nanos read): wall-clock
      diff against an NTZ epoch literal via ``timestampdiff`` — no
      session-timezone dependence, matching DuckDB ``epoch_us(ts)`` on
      the same naive value.
    - ``TIMESTAMP`` (LTZ): plain ``unix_micros``.
    - ``LONG`` (legacy ``nanosAsLong`` read): integer ``div 1000``
      nanos→micros floor.

    Dtype is resolved from the DataFrame schema at plan-build time, so
    the returned Column is a pure JVM expression (codegen-friendly, no
    UDF) whichever branch is taken.
    """
    dtype = df.schema[ts_col].dataType
    col = F.col(ts_col)
    if isinstance(dtype, TimestampNTZType):
        epoch_ntz = F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))
        return F.timestamp_diff("MICROSECOND", epoch_ntz, col)
    if isinstance(dtype, LongType):
        # FLOOR division in exact integer arithmetic: subtract the
        # positive remainder first — bare `div` truncates toward zero,
        # which would put pre-1970 nanos one microsecond high, and
        # double `/` loses exactness above 2^53 ns
        return F.expr(f"(`{ts_col}` - pmod(`{ts_col}`, 1000)) div 1000")
    return F.unix_micros(col)
