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
# in registration order. Round 8 rotation (r7 verdict #1): (a) the 4
# oracled queries with NO driver row in any round yet (the sign-batch
# pair, the epoch-shuffle order, the stored-codes batch PQ), (b) the 3
# queries whose last driver row is r4 — four rounds stale, the oldest
# tier left — and (c) ALL 43 queries whose last driver row is r5,
# which hit the 3-round staleness bound exactly this round (mm_*, the
# funnel/as-of/cohort events family, the sampling/curation family, the
# text long tail, streaming, and the relational percentile/cube/ntile
# tail). 4+3+43 = exactly the 50-slot window; everything else was
# driver-verified in r6/r7 and is re-verified locally each round via
# tools/verify_local.py regardless. (The trained-PQ tiers remain
# rows-only by design and keep their recall invariants in tests.)
#
# Round-9 rotation note: the SEVEN queries added late in r8 with full
# oracles but no driver row yet — graph_beam_search_stored,
# dedup_lines_boilerplate, split_group_aware, embedding_stats,
# api_search_auto, stream_strip_boilerplate,
# stream_view_purchase_attribution — are tier (a) of the next window,
# followed by whatever the r8 window leaves 3 rounds stale. All seven
# are green in VERIFY_LOCAL_r8*.txt at three scale factors.
_PRIORITY = [
    # (a) first driver row
    "knn_sign_batch",
    "knn_sign_batch_pruned",
    "docs_shuffle_order",
    "knn_pq_batch_stored",
    # (b) last driver row r4
    "dedup_minhash_lsh",
    "ivf_search",
    "lsh_bucket_pairs",
    # (c) last driver row r5 — the full 43-query tier
    "api_search_batch_table",
    "text_langid",
    "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh_md5_capped",
    "dedup_lsh_bucket_audit",
    "dedup_simhash",
    "embed_letter_knn",
    "embed_hashed_md5",
    "embed_hashed",
    "mm_media_meta",
    "mm_frame_sample",
    "ivf_batch_search",
    "ivf_search_pruned",
    "lsh_search",
    "text_fingerprint_rolling",
    "text_fingerprint_winnow",
    "chunk_documents",
    "embed_pool_by_label",
    "quantiles_order_value",
    "skew_salted_event_counts",
    "text_bpe_token_stats",
    "sketch_distinct_users_daily",
    "events_interarrival",
    "text_repetition_stats",
    "text_pii_scrub_audit",
    "events_partition_pruned_scan",
    "events_retention_cohorts",
    "docs_zipf_token_freq",
    "events_session_funnel",
    "events_error_burst_windows",
    "docs_quality_quantiles",
    "orders_percentile_by_priority",
    "part_cube_brand_size",
    "supplier_balance_ntile",
    "stream_tumbling_hour",
    "stream_sliding_window",
    "stream_sessionize",
    "sample_hash_10pct",
    "sample_stratified_by_lang",
    "split_train_val_test",
    "events_asof_last_view",
    "events_band_clicks_near_errors",
    "docs_dedup_family_sizes",
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
