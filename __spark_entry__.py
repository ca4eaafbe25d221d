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
# in registration order. Round 17 rotation (r16 verdict #3, executed
# exactly as pre-queued in the r16 comment): (a) the 30 remaining
# oracled entries of the 39-query r13 tier hit their staleness bound
# this round and MUST lead — alphabetical from crud_truncate through
# the TPC-H block (their last driver hash evidence is
# CORRECTNESS_r13; all 30 are full-oracle). (b) The r17 code-change
# riders: api.py grew sync_bundle (bundle delta-sync, r16 verdict #5)
# plus the review hardenings (dirty-dir guard before artifact builds,
# (dev, ino)-keyed checksum reuse, read-only-root ephemeral timeline,
# open_serving_bundle _CURRENT/_TIMELINE gates) and serving.py
# broadened the session-timezone parser — the riders are the entries
# whose oracles hash bytes crossing those paths:
# api_search_export_bundle (the export + open pipeline end to end),
# api_search_bundle_time_travel (FIRST driver row, r16 verdict #3 —
# the export's version-pinning proof, sharing api_search_cosine's
# full oracle), api_search_bundle_sync (NEW this round — search
# served from a bundle refreshed in place by the delta sync, sharing
# api_search_cosine's full oracle), and api_search_sign_filtered
# (NEW this round — metadata-filtered search kept partition-pruned on
# the stored sign layout via a semi join against an id+metadata
# column-pruned base scan; its own full oracle reproduces probe ∧
# filter ∧ top-k). (c) Spare slots: the alphabetically-first 16 of
# the 45-query r14 tier, which hits its bound in r18 — the remaining
# 29 of that tier MUST lead the r18 window (alphabetical from
# ivf_add_remove_roundtrip through window_running_totals per
# CORRECTNESS_r14), with the r15 tier (45 entries) bounding in r19. All 50 slots this round are FULL-ORACLE —
# the first all-hash window of the build (the r12 tier's rows-only
# member sketch_distinct_users_daily rode its own tier in r16 and is
# not stale again until r20). The 8 registry entries with no driver
# row at any round (knn_graph_blocked + the 7 trained PQ/recall
# tiers) are rows-only by design with no oracle; they stay outside
# the rotation — a driver rows-only row adds nothing over the local
# three-scale verification and the recall invariants in tests, and
# window slots are reserved for hash evidence (r15 verdict).
_PRIORITY = [
    # (a) staleness-bound mandate: the r13 tier's 30 remaining oracled
    # entries, alphabetical
    "crud_truncate",
    "crud_upsert",
    "date_funcs_monthly_revenue",
    "fts_bm25",
    "graph_add_remove",
    "graph_beam_search",
    "graph_beam_search_lsh",
    "pack_token_budget",
    "sample_temperature_by_lang",
    "split_group_aware",
    "text_scrub_denylist",
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
    "tpch_q2_min_cost_supplier",
    "tpch_q4_priority_late_orders",
    "tpch_q6_forecast_revenue",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    # (b) riders of the r17 bundle/serving changes
    "api_search_export_bundle",
    "api_search_bundle_time_travel",
    "api_search_bundle_sync",
    "api_search_sign_filtered",
    # (c) spare slots: alphabetically-first 16 of the r14 tier (its
    # staleness bound lands in r18; the remaining 29 lead that window)
    "api_search_auto",
    "api_search_batch_auto",
    "api_search_batch_cosine",
    "api_search_batch_table",
    "api_search_cosine",
    "api_search_nsw",
    "api_search_sign",
    "chunk_documents",
    "dedup_lsh_bucket_audit",
    "dedup_minhash_lsh_md5_capped",
    "dedup_ngram_jaccard_capped",
    "docs_training_manifest_leakage_safe",
    "embed_hashed_md5",
    "graph_lsh_edge_recall",
    "grouping_sets_flag_status",
    "hybrid_rrf",
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
