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
# in registration order. Round 6 (r5 verdict task #7) maximizes
# hash-green density: every slot is an ORACLE-MATCHED query — (a) the 8
# queries new in r6 getting their first driver row, (b) all 27 oracled
# queries whose last driver row was r3, (c) 15 fills from the r4 tier
# (the partsupp-adapted TPC-H five, the dedup family, the API facade).
# Rows-only paths (seed-/impl-dependent by design) are all covered by
# the full-registry VERIFY_LOCAL_r6.txt backstop plus oracle-matched
# twins inside this window.
_PRIORITY = [
    # (a) new in r6
    "knn_range_search",
    "knn_graph_broadcast",
    "lsh_search_md5",
    "knn_pq_adc",
    "ivf_pq_search",
    "ann_recall_report",
    "sample_temperature_by_lang",
    "docs_training_manifest",
    "dedup_keep_best_per_family",
    # (b) last driver row is r3
    "anti_join_never_bulk_ordered_parts",
    "date_funcs_monthly_revenue",
    "decontam_ngram_overlap",
    "grouping_sets_flag_status",
    "numeric_stats_lineitem",
    "pack_token_budget",
    "pivot_status_by_priority",
    "scalar_subquery_premium_parts",
    "semi_join_deep_discount_orders",
    "setops_wealthy_nations",
    "string_funcs_parts",
    "text_scrub_denylist",
    "tpch_q10_returned_items",
    "tpch_q12_latency_priority",
    "tpch_q13_order_count_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_revenue",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_rich_customers",
    "tpch_q4_priority_late_orders",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "window_running_totals",
    # (c) r4-tier fills
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_parts",
    "tpch_q16_part_supplier_counts",
    "tpch_q20_promotion_suppliers",
    "stream_dedup_exact",
    "dedup_components",
    "dedup_exact",
    "dedup_minhash_lsh_md5",
    "dedup_ngram_jaccard",
    "dedup_simhash_md5",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_lsh",
    "api_search_cosine",
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
