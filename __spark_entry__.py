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
# in registration order. Round 9 rotation (r8 verdict #1): (a) the 9
# full-oracle queries with NO driver row in any round — the seven added
# late in r8 (graph_beam_search_stored, dedup_lines_boilerplate,
# split_group_aware, embedding_stats, api_search_auto,
# stream_strip_boilerplate, stream_view_purchase_attribution) plus
# knn_graph_auto (added r8 with knn_graph's full oracle) and the new
# crud_time_travel (r8 verdict #5) — then (b) 41 of the 50 queries
# whose last driver row is r6, which hit the 3-round staleness bound
# this round. The 9 deferred r6-tier queries (simple single-shape
# relational built-ins, unchanged since r6: string_funcs_parts,
# date_funcs_monthly_revenue, pivot_status_by_priority,
# setops_wealthy_nations, scalar_subquery_premium_parts,
# semi_join_deep_discount_orders, grouping_sets_flag_status,
# numeric_stats_lineitem, window_running_totals) lead the r10 window;
# they remain re-verified locally at three scale factors each round via
# tools/verify_local.py. (The trained/residual PQ tiers remain
# rows-only by design and keep their recall invariants in tests.)
_PRIORITY = [
    # (a) first driver row — all full-oracle
    "graph_beam_search_stored",
    "dedup_lines_boilerplate",
    "split_group_aware",
    "embedding_stats",
    "api_search_auto",
    "stream_strip_boilerplate",
    "stream_view_purchase_attribution",
    "knn_graph_auto",
    "crud_time_travel",
    # (b) last driver row r6 — 41 of the 50-query tier
    "ann_recall_report",
    "anti_join_never_bulk_ordered_parts",
    "api_search_cosine",
    "decontam_ngram_overlap",
    "dedup_components",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_lsh",
    "dedup_exact",
    "dedup_keep_best_per_family",
    "dedup_minhash_lsh_md5",
    "dedup_ngram_jaccard",
    "dedup_simhash_md5",
    "docs_training_manifest",
    "ivf_pq_search",
    "knn_graph_broadcast",
    "knn_pq_adc",
    "knn_range_search",
    "lsh_search_md5",
    "pack_token_budget",
    "sample_temperature_by_lang",
    "stream_dedup_exact",
    "text_scrub_denylist",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_priority_late_orders",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_latency_priority",
    "tpch_q13_order_count_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_part_supplier_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_promotion_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_rich_customers",
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
