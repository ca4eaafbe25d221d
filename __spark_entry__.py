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
# in registration order. Round 13 rotation (r12 verdict #1): (a) the
# 23 queries whose last driver row is r9 — at the staleness bound,
# they MUST lead this window: pack_token_budget,
# sample_temperature_by_lang, split_group_aware, text_scrub_denylist,
# and the 19 r9-tier tpch_q* entries (the relational suite's first
# driver row in four rounds); (b) the api.py-riding entries, because
# api.py changes again in r13 (the _chunk_count pinned-snapshot fix
# and the ivf memo-on-pinned-live fix, both r12 ADVICE, plus the
# size-aware nsw default beam, r12 verdict #5) — every api_search_*
# facade entry plus stream_then_ivf_search, which rides the facade
# IVF path; (c) the alphabetically-first 18 of the 47 queries whose
# last driver row is r10 — a transparent pick that pre-drains the r10
# tier before all 47 hit the staleness bound at once in r14 (the
# remaining 29 lead that window). Everything stays re-verified
# locally at three scale factors each round via
# tools/verify_local.py. (The trained/residual PQ tiers remain
# rows-only by design and keep their recall invariants in tests.)
_PRIORITY = [
    # (a) staleness-bound mandate (r12 verdict #1): last driver row r9
    "pack_token_budget",
    "sample_temperature_by_lang",
    "split_group_aware",
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
    # (b) code paths changed in r13: api.py (_chunk_count counts the
    # keyed snapshot; ivf serves the memo on a pinned-live search;
    # size-aware nsw default beam)
    "api_search_nsw",
    "api_search_auto",
    "api_search_cosine",
    "api_search_sign",
    "api_search_time_travel",
    "api_search_batch_auto",
    "api_search_batch_cosine",
    "api_search_batch_table",
    "stream_then_ivf_search",
    "api_search_sign_incremental",  # r13-NEW full oracle: incremental
    # index maintenance (delta-chain sign layout) — a new entry gets
    # its driver row in its own round
    "crud_change_feed",  # r13-NEW full oracle: CDC read of the delta log
    # (c) last driver row r10 — alphabetically-first 16 of the
    # 47-query tier (the remaining 31 hit the bound in r14 and lead
    # that window)
    "ann_recall_multi",
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
    "date_funcs_monthly_revenue",
    "fts_bm25",
    "graph_add_remove",
    "graph_beam_search",
    "graph_beam_search_lsh",
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
