import math

import pytest
from pyspark.sql import functions as F

from local_vectordb_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_distance,
    l2_norm,
)


def _one(spark, expr, a, b=None):
    data = [(a, b)] if b is not None else [(a, a)]
    df = spark.createDataFrame(data, "a array<float>, b array<float>")
    return df.select(expr(F.col("a"), F.col("b")).alias("v")).first()["v"]


def test_dot(spark):
    assert _one(spark, dot_product, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]) == pytest.approx(32.0)


def test_norm(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "a array<float>")
    assert df.select(l2_norm(F.col("a")).alias("v")).first()["v"] == pytest.approx(5.0)


def test_l2_distance(spark):
    assert _one(spark, l2_distance, [0.0, 0.0], [3.0, 4.0]) == pytest.approx(5.0)


def test_cosine_identity(spark):
    v = [0.1, 0.2, 0.7, 0.4]
    assert _one(spark, cosine_similarity, v, v) == pytest.approx(1.0)


def test_cosine_orthogonal(spark):
    assert _one(spark, cosine_similarity, [1.0, 0.0], [0.0, 1.0]) == pytest.approx(0.0)


def test_cosine_zero_norm_guard(spark):
    # reference defines cosine vs a zero vector as 0.0 (nsw_index.py:164-168)
    assert _one(spark, cosine_similarity, [0.0, 0.0], [1.0, 2.0]) == 0.0


def test_cosine_matches_math(spark):
    a, b = [1.0, 2.0, 3.0], [-4.0, 5.0, 0.5]
    expect = (1 * -4 + 2 * 5 + 3 * 0.5) / (
        math.sqrt(14) * math.sqrt(16 + 25 + 0.25)
    )
    assert _one(spark, cosine_similarity, a, b) == pytest.approx(expect)
