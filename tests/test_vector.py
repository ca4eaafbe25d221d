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


# ---------------------------------------------------------------- SQ8


def _sq8_roundtrip(spark, vec):
    from local_vectordb_spark.functions import vector as V

    df = spark.createDataFrame([(vec,)], "v array<double>")
    base = df.select(
        "v", F.array_min("v").alias("vmin"), F.array_max("v").alias("vmax")
    )
    row = base.select(
        V.sq8_codes(F.col("v"), F.col("vmin"), F.col("vmax")).alias("codes"),
        V.sq8_reconstruct(
            V.sq8_codes(F.col("v"), F.col("vmin"), F.col("vmax")),
            F.col("vmin"),
            F.col("vmax"),
        ).alias("rv"),
    ).first()
    return row.codes, row.rv


def test_sq8_codes_in_byte_range_and_extremes_exact(spark):
    vec = [-1.0, -0.25, 0.0, 0.6, 1.0]
    codes, rv = _sq8_roundtrip(spark, vec)
    assert all(0 <= c <= 255 for c in codes)
    assert codes[0] == 0 and codes[-1] == 255
    # range endpoints reconstruct exactly
    assert rv[0] == pytest.approx(-1.0) and rv[-1] == pytest.approx(1.0)


def test_sq8_reconstruction_error_bounded(spark):
    import random

    rng = random.Random(7)
    vec = [rng.uniform(-2, 3) for _ in range(64)]
    codes, rv = _sq8_roundtrip(spark, vec)
    span = max(vec) - min(vec)
    step = span / 255.0
    for x, r in zip(vec, rv):
        assert abs(x - r) <= step / 2 + 1e-12


def test_sq8_constant_vector(spark):
    codes, rv = _sq8_roundtrip(spark, [0.5, 0.5, 0.5])
    assert codes == [0, 0, 0]
    assert rv == pytest.approx([0.5, 0.5, 0.5])
