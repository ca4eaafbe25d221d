import math

import pytest
from pyspark.sql import functions as F

from local_vectordb_spark.functions import embedding as E


def test_letter_count_embedding_manual(spark):
    df = spark.createDataFrame([("abca",)], "text string")
    vec = df.select(E.letter_count_embedding(F.col("text")).alias("v")).first()["v"]
    # counts: a=2, b=1, c=1, rest 0 → norm sqrt(6)
    n = math.sqrt(6)
    assert vec[0] == pytest.approx(2 / n)
    assert vec[1] == pytest.approx(1 / n)
    assert vec[2] == pytest.approx(1 / n)
    assert all(x == 0.0 for x in vec[3:])


def test_letter_count_zero_guard(spark):
    df = spark.createDataFrame([("123 456",)], "text string")
    vec = df.select(E.letter_count_embedding(F.col("text")).alias("v")).first()["v"]
    assert all(x == 0.0 for x in vec)


def test_hashed_embedding_deterministic_unit_norm(spark):
    df = spark.createDataFrame([("hello world",), ("hello world",), ("bye",)], "text string")
    udf = E.hashed_embedding_udf(dim=32)
    rows = df.select(F.col("text"), udf(F.col("text")).alias("v")).collect()
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], []).append(r["v"])
    assert by_text["hello world"][0] == by_text["hello world"][1]
    for vs in by_text.values():
        assert math.isclose(sum(x * x for x in vs[0]), 1.0, rel_tol=1e-9)
    assert by_text["hello world"][0] != by_text["bye"][0]


def test_embed_if_missing_only_fills_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", [0.5, 0.5]), (2, "b", None)],
        "id long, text string, vec array<double>",
    )
    out = {r["id"]: r["vec"] for r in E.embed_if_missing(df, "text", "vec", E.hashed_embedding_udf(dim=2)).collect()}
    assert out[1] == [0.5, 0.5]  # existing kept
    assert out[2] is not None and len(out[2]) == 2


def test_api_embedder_raises_at_boundary(spark):
    """The production-shaped backend must fail exactly at the client
    boundary (no client shipped here), not before the UDF runs."""
    import pytest
    from pyspark.sql import functions as F

    from local_vectordb_spark.functions.embedding import api_embedding_udf

    df = spark.createDataFrame([("hello",)], "t string")
    with pytest.raises(Exception) as exc:
        df.select(api_embedding_udf()(F.col("t"))).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )
