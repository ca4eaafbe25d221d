"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke-check at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query for the correctness
gate (row-count + schema + order-insensitive value hash at sf0.01).

Conventions shared by every query/oracle pair:
- all floating-point outputs are rounded (scores to 6 decimals, money
  aggregates to 2) on BOTH sides so double-precision results hash
  identically across engines;
- vector math is computed in DOUBLE on both sides (test data stores
  ARRAY<FLOAT>);
- every computed column is aliased identically in Spark and SQL;
- ties in any top-k are broken by id ascending.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from local_vectordb_spark import queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: brute-force cosine top-k over sf0.001 embeddings,
    hydrated against documents (SURVEY §7 minimum slice: Q1+Q2+Q3+Q6).
    """
    return q.flagship(spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks the FIRST 50 entries of queries()
# in registration order. Round 10 rotation (r9 verdict #3): (a) the 9
# r6-tier queries deferred from the r9 window (last driver row r6 — at
# the 3-round staleness bound, they MUST lead this window), then
# (b) 41 of the 50 queries whose last driver row is r7. Every crud_*,
# api_*, and knn/ivf/graph mutation entry from the r7 tier stays
# IN-window because add()/update() FK semantics changed this round
# (loud rejection, commit 9e86582). The 9 deferred r7-tier queries are
# simple single-shape built-ins unchanged since r7 (events_json_extract,
# events_tumbling_hour, events_sliding_window, events_sessionize,
# rollup_revenue, window_top_orders_per_customer, text_quality,
# text_token_stats, graph_bfs_2hop); they lead the r11 window together
# with the three full-oracle entries ADDED in r10 that have no driver
# row yet (split_group_aware_lsh, docs_training_manifest_leakage_safe,
# api_search_batch_auto — all three-scale-verified in
# VERIFY_LOCAL_r10*). Everything stays re-verified locally at three
# scale factors each round via tools/verify_local.py. (The
# trained/residual PQ tiers remain rows-only by design and keep their
# recall invariants in tests.)
_PRIORITY = [
    # (a) last driver row r6 — deferred from r9, staleness bound hit
    "string_funcs_parts",
    "date_funcs_monthly_revenue",
    "pivot_status_by_priority",
    "setops_wealthy_nations",
    "scalar_subquery_premium_parts",
    "semi_join_deep_discount_orders",
    "grouping_sets_flag_status",
    "numeric_stats_lineitem",
    "window_running_totals",
    # (b) last driver row r7 — 41 of the 50-query tier
    "ann_recall_multi",
    "api_search_batch_cosine",
    "crud_cascade_delete",
    "crud_delete",
    "crud_exists_semi",
    "crud_fk_orphans",
    "crud_full_scan",
    "crud_insert_append",
    "crud_point_lookup",
    "crud_reject_duplicates",
    "crud_truncate",
    "crud_upsert",
    "fts_bm25",
    "graph_add_remove",
    "graph_beam_search",
    "graph_beam_search_lsh",
    "graph_lsh_edge_recall",
    "hybrid_rrf",
    "ivf_add_remove_roundtrip",
    "ivf_batch_search_full_probe",
    "ivf_pq_multiprobe",
    "ivf_search_full_probe",
    "ivf_sign_multiprobe",
    "ivf_sign_pruned",
    "knn_batch",
    "knn_brute_force",
    "knn_graph",
    "knn_graph_lsh",
    "knn_hydrated",
    "knn_metadata_filter",
    "knn_mmr_diversified",
    "knn_pq_adc_deep",
    "knn_pq_batch",
    "knn_pq_stored",
    "knn_sq8",
    "lsh_search_md5_multi",
    "stream_dedup_fingerprint",
    "stream_then_ivf_search",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    all_q = dict(q.SPARK_QUERIES)
    # fail FAST on names without code: a silent skip would shift every
    # later entry's slot in the 50-query driver window unnoticed (and
    # r4 shipped exactly that bug as 24 phantom names)
    missing = [n for n in _PRIORITY if n not in all_q]
    if missing:
        raise AssertionError(f"_PRIORITY names not in registry: {missing}")
    ordered = {n: all_q[n] for n in _PRIORITY}
    ordered.update({n: f for n, f in all_q.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(q.ORACLE_SQL)
