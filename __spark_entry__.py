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
# in registration order. Round 11 rotation (r10 verdict #4): (a) the 3
# full-oracle entries ADDED in r10 with no driver row yet
# (split_group_aware_lsh, docs_training_manifest_leakage_safe,
# api_search_batch_auto — three-scale-verified in VERIFY_LOCAL_r10*)
# plus the r11-NEW api_search_nsw (the facade's stored-graph ANN path,
# fully oracled), then (b) the 9 r7-stale queries deferred from the
# r10 window (at the staleness bound — they MUST be in this window),
# then (c) all 8 streaming entries regardless of recency because
# streaming runtime code CHANGES this round (run_available_now's
# conf-scope lock and the ingest dead-letter sink were reworked per
# r10 ADVICE), then (d) 29 of the 47 remaining queries whose last
# driver row is r8, preferring the ones whose code paths are touched
# this round (api_search_batch_table rides api.py edits). The 18
# deferred r8-tier queries are simple single-shape built-ins untouched
# since r8 (docs_shuffle_order, docs_zipf_token_freq,
# docs_quality_quantiles, docs_dedup_family_sizes,
# orders_percentile_by_priority, part_cube_brand_size,
# quantiles_order_value, supplier_balance_ntile,
# sketch_distinct_users_daily, skew_salted_event_counts,
# events_interarrival, events_partition_pruned_scan,
# events_retention_cohorts, events_band_clicks_near_errors,
# events_error_burst_windows, text_bpe_token_stats, text_langid,
# text_repetition_stats); they lead the r12 window. Everything stays
# re-verified locally at three scale factors each round via
# tools/verify_local.py. (The
# trained/residual PQ tiers remain rows-only by design and keep their
# recall invariants in tests.)
_PRIORITY = [
    # (a) added in r10/r11, full oracle, no driver row yet
    "split_group_aware_lsh",
    "docs_training_manifest_leakage_safe",
    "api_search_batch_auto",
    "api_search_nsw",  # r11-new: the facade ANN path, fully oracled
    # (b) last driver row r7 — deferred from r10, staleness bound hit
    "events_json_extract",
    "events_tumbling_hour",
    "events_sliding_window",
    "events_sessionize",
    "rollup_revenue",
    "window_top_orders_per_customer",
    "text_quality",
    "text_token_stats",
    "graph_bfs_2hop",
    # (c) streaming runtime code changed this round (r10 ADVICE items)
    "stream_tumbling_hour",
    "stream_sliding_window",
    "stream_sessionize",
    "stream_dedup_exact",
    "stream_dedup_fingerprint",
    "stream_view_purchase_attribution",
    "stream_strip_boilerplate",
    "stream_then_ivf_search",
    # (d) last driver row r8 — 30 of the 47-query tier
    "api_search_batch_table",
    "chunk_documents",
    "dedup_lsh_bucket_audit",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_md5_capped",
    "dedup_ngram_jaccard_capped",
    "dedup_simhash",
    "embed_hashed",
    "embed_hashed_md5",
    "embed_letter_knn",
    "embed_pool_by_label",
    "events_asof_last_view",
    "events_session_funnel",
    "ivf_batch_search",
    "ivf_search",
    "ivf_search_pruned",
    "knn_pq_batch_stored",
    "knn_sign_batch",
    "knn_sign_batch_pruned",
    "lsh_bucket_pairs",
    "lsh_search",
    "mm_frame_sample",
    "mm_media_meta",
    "sample_hash_10pct",
    "sample_stratified_by_lang",
    "split_train_val_test",
    "text_fingerprint_rolling",
    "text_fingerprint_winnow",
    "text_pii_scrub_audit",
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
