"""Skew rewrites must be result-identical to their plain forms, and
bucketed tables must join without a shuffle (the co-located-join story
for repeated large-large joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_vectordb_spark import plans
from local_vectordb_spark.operators import skew
from local_vectordb_spark.session import load_table


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_salted_count_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    salted = skew.salted_count(ev, ["event_type"], n_salts=8)
    assert _rows(salted) == _rows(plain)


def test_salted_join_matches_plain(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = l.join(o, "l_orderkey").groupBy("o_orderpriority").agg(
        F.round(F.sum("l_quantity"), 2).alias("q")
    )
    salted = skew.salted_join(l, o, "l_orderkey", n_salts=4).groupBy(
        "o_orderpriority"
    ).agg(F.round(F.sum("l_quantity"), 2).alias("q"))
    assert _rows(salted) == _rows(plain)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("buckets")
    for name, df, key in [
        ("orders_b", load_table(spark, sf_dir, "orders"), "o_orderkey"),
        (
            "lineitem_b",
            load_table(spark, sf_dir, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        ),
    ]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", str(root / name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    yield "orders_b", "lineitem_b"
    for name in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o_name, l_name = bucketed_tables
    joined = (
        spark.table(l_name)
        .join(spark.table(o_name), "o_orderkey")
        .select("o_orderkey", "l_quantity", "o_totalprice")
    )
    assert plans.count_shuffles(joined) == 0, plans.plan_string(joined)


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed_tables):
    o_name, l_name = bucketed_tables
    bucketed = (
        spark.table(l_name)
        .join(spark.table(o_name), "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    l = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    o = load_table(spark, sf_dir, "orders")
    plain = (
        l.join(o, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert _rows(bucketed) == _rows(plain)
