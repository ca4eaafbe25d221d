"""Invariant tests for the extended relational queries (sf0.001 —
fast; exact value parity vs DuckDB is covered by the oracle gate at
sf0.01 via tools/verify_local.py)."""

from __future__ import annotations

from local_vectordb_spark import queries_relational as qr
from local_vectordb_spark.session import load_table


def test_q6_single_row_positive(spark, sf_dir):
    row = qr.tpch_q6_forecast_revenue(spark, sf_dir).collect()
    assert len(row) == 1 and row[0].revenue > 0 and row[0].n_items > 0


def test_setops_algebra(spark, sf_dir):
    rows = qr.setops_wealthy_nations(spark, sf_dir).collect()
    by_op = {}
    for r in rows:
        by_op.setdefault(r.op, set()).add(r.nationkey)
    union = by_op.get("union", set())
    inter = by_op.get("intersect", set())
    exc = by_op.get("except", set())
    assert inter <= union
    assert exc <= union
    assert not (inter & exc)


def test_pivot_counts_total(spark, sf_dir):
    df = qr.pivot_status_by_priority(spark, sf_dir)
    total = sum(r.n_f + r.n_o + r.n_p for r in df.collect())
    assert total == load_table(spark, sf_dir, "orders").count()


def test_grouping_sets_both_sides_sum_to_total(spark, sf_dir):
    rows = qr.grouping_sets_flag_status(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "lineitem").count()
    by_flag = sum(r.n_items for r in rows if r.linestatus == "ALL")
    by_status = sum(r.n_items for r in rows if r.returnflag == "ALL")
    assert by_flag == total and by_status == total


def test_semi_anti_partition_parts(spark, sf_dir):
    """Semi and anti joins on the same predicate partition the table."""
    from pyspark.sql import functions as F

    p = load_table(spark, sf_dir, "part")
    bulk = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 49)
        .select("l_partkey")
    )
    n_semi = p.join(bulk, p.p_partkey == bulk.l_partkey, "left_semi").count()
    n_anti = p.join(bulk, p.p_partkey == bulk.l_partkey, "left_anti").count()
    assert n_semi + n_anti == p.count()
