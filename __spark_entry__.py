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
# in registration order. Round 5 front-loads (a) the two queries broken
# by the PySpark 4.1.2 TIMESTAMP_NTZ change and fixed this round
# (functions/timeutil.epoch_micros), (b) queries added in r5 (names
# appended here only once the code exists), (c) the 15 registry queries
# that have never had a driver-window row (judge-verified locally only),
# and (d) fills from the queries whose last driver row is r3. Everything
# outside the window is re-verified locally as VERIFY_LOCAL_r5.txt.
_PRIORITY = [
    # (a) fixed in r5 — NTZ-safe epoch helper
    "events_band_clicks_near_errors",
    "events_interarrival",
    # (b) new in r5
    "embed_hashed_md5",
    "ivf_search_pruned",
    "ivf_sign_pruned",
    "stream_then_ivf_search",
    "api_search_batch_table",
    "graph_beam_search",
    "orders_percentile_by_priority",
    "part_cube_brand_size",
    "events_retention_cohorts",
    "docs_zipf_token_freq",
    "events_session_funnel",
    "supplier_balance_ntile",
    "events_error_burst_windows",
    "docs_quality_quantiles",
    "docs_dedup_family_sizes",
    "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh_md5_capped",
    "dedup_lsh_bucket_audit",
    # (c) never had a driver-window row
    "text_langid",
    "dedup_simhash",
    "embed_letter_knn",
    "embed_hashed",
    "mm_media_meta",
    "mm_frame_sample",
    "ivf_batch_search",
    "lsh_search",
    "text_fingerprint_rolling",
    "text_fingerprint_winnow",
    "chunk_documents",
    "embed_pool_by_label",
    "quantiles_order_value",
    "text_bpe_token_stats",
    "sketch_distinct_users_daily",
    # (d) last driver row is r3
    "knn_sq8",
    "knn_mmr_diversified",
    "fts_bm25",
    "hybrid_rrf",
    "skew_salted_event_counts",
    "text_repetition_stats",
    "text_pii_scrub_audit",
    "events_partition_pruned_scan",
    "events_asof_last_view",
    "stream_tumbling_hour",
    "stream_sliding_window",
    "stream_sessionize",
    "sample_hash_10pct",
    "sample_stratified_by_lang",
    "split_train_val_test",
    "pack_token_budget",
    "text_scrub_denylist",
    "decontam_ngram_overlap",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_disjunctive_revenue",
    "tpch_q22_dormant_rich_customers",
    "semi_join_deep_discount_orders",
    "anti_join_never_bulk_ordered_parts",
    "setops_wealthy_nations",
    "grouping_sets_flag_status",
    "scalar_subquery_premium_parts",
    "pivot_status_by_priority",
    "window_running_totals",
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
