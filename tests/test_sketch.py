"""HLL++ sketch accuracy: approx distinct within the configured rsd
band of the exact count on every group."""

from __future__ import annotations

from local_vectordb_spark.queries_pipeline import sketch_distinct_users_daily


def test_sketch_within_error_band(spark, sf_dir):
    rows = sketch_distinct_users_daily(spark, sf_dir).collect()
    assert rows, "no groups produced"
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err < 0.05, f"{r.day}: {r.approx_users} vs {r.exact_users}"
