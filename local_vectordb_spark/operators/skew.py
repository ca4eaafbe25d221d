"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime, but two patterns still need explicit salt:
a groupBy whose hot key overwhelms one reducer, and a shuffle join
against a side that cannot broadcast. Both are pure rewrites — results
are identical to the unsalted form; only the shuffle key changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_SEED = 42


def salted_count(
    df: DataFrame, key_cols: list[str], n_salts: int = 16
) -> DataFrame:
    """Two-phase skew-proof count: shuffle on (key, salt) first, so a
    hot key spreads over n_salts reducers, then combine the partials
    with a second (tiny) shuffle on key alone. Output: (*key_cols, n).
    """
    salt = (F.rand(SALT_SEED) * n_salts).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_n"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_n").alias("n"))


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with the large side's hot keys spread across
    n_salts partitions. The large side gets a random salt per row; the
    small side is exploded n_salts times so every (key, salt) pair
    still meets its match. Use when `small` is too big to broadcast
    but n_salts times `small` still shuffles acceptably.
    """
    salt_l = (F.rand(SALT_SEED) * n_salts).cast("int")
    lhs = large.withColumn("_salt", salt_l)
    rhs = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return lhs.join(rhs, [key, "_salt"], how).drop("_salt")
