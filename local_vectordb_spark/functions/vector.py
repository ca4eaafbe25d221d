"""Vector math as native Catalyst column expressions.

The reference computes cosine similarity per-pair in Python/numpy
(/root/reference/src/models/nsw_index.py:164-168, inlined again at
src/models/collection.py:321-329 and src/models/ivf_index.py:183-185).
Here the same math is a JVM-side expression tree over ARRAY columns —
it stays inside whole-stage codegen, never crosses into Python, and is
therefore the scalable hot path for scoring billions of vectors.

All arithmetic is done in DOUBLE regardless of the stored element type
(test data stores ARRAY<FLOAT>) so results are reproducible against a
double-precision oracle and stable under re-partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot_product(a: Column, b: Column) -> Column:
    """Sum of elementwise products, computed in double precision."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def l2_distance(a: Column, b: Column) -> Column:
    """Euclidean distance (used for IVF centroid probing, SURVEY Q4:
    the reference probes centroids by L2 at src/models/ivf_index.py:159-166).
    """
    return F.sqrt(
        F.aggregate(
            F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (||a||*||b||) with the reference's zero-norm guard
    (similarity is defined as 0.0 when either norm is zero,
    /root/reference/src/models/nsw_index.py:164-168).
    """
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)
