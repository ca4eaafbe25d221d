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
# in registration order. Round 15 rotation (r14 verdict #1): (a) the
# 40 queries whose last driver row is r11 — the whole remainder of the
# 46-query r11 tier after r14 drained its alphabetically-first 6
# oracled entries — hit the staleness bound this round and MUST lead.
# The tier's 8 rows-only members (dedup_minhash_lsh, dedup_simhash,
# embed_hashed, ivf_batch_search, ivf_search, ivf_search_pruned,
# lsh_bucket_pairs, lsh_search — seed-/training-dependent by design,
# each with an oracled twin in the registry and recall invariants in
# tests) ride along so the WHOLE tier drains at once and the r14
# header's 37-vs-40 ambiguity (r14 ADVICE: the counts were off by one)
# can't recur: 40 named = 40 checked. (b) The entries riding code that
# changes in r15 — api.py's commit stamp became timezone-AWARE
# (r14 ADVICE: a naive datetime is re-interpreted in
# spark.sql.session.timeZone): the riders are the entries whose
# ORACLES verify timestamp bytes or version-pinned snapshots —
# crud_change_feed (ts_ok), crud_cdf_mirror (symmetric diff includes
# both timestamps), api_search_sign_incremental (delta-chain
# provenance), and the two time-travel reads. The other 8 facade
# entries ride the same file but their oracles are
# timestamp-independent, their driver rows are r14-fresh, and all 176
# stay re-verified locally at three scale factors
# (tools/verify_local.py). (c) Spare slots: the alphabetically-first
# 5 of the 40-query r12 tier (hits its bound in r16) —
# the remaining 35 of that tier MUST lead the r16 window
# (dedup_embedding_cosine_lsh, dedup_exact, dedup_keep_best_per_family,
# dedup_lines_boilerplate, dedup_minhash_lsh_md5, dedup_ngram_jaccard,
# dedup_simhash_md5, docs_*, embedding_stats, events_band_*,
# events_error_*, events_interarrival, events_partition_pruned_scan,
# events_retention_cohorts, graph_beam_search_stored, ivf_pq_search,
# ivf_sign_two_level, knn_graph_auto, knn_graph_broadcast, knn_pq_adc,
# knn_range_search, lsh_search_md5, orders_percentile_by_priority,
# part_cube_brand_size, quantiles_order_value,
# sketch_distinct_users_daily, skew_salted_event_counts,
# supplier_balance_ntile, text_bpe_token_stats, text_langid,
# text_repetition_stats; 35 + r16 code-riders stays inside 50, and the
# 39-query r13 tier then hits its bound in r17 and takes r16's spare
# slots alphabetically).
_PRIORITY = [
    # (a) staleness-bound mandate (r14 verdict #1): last driver row
    # r11 — the full 40-query remainder of the r11 tier, alphabetical
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embed_hashed",
    "embed_letter_knn",
    "embed_pool_by_label",
    "events_asof_last_view",
    "events_json_extract",
    "events_session_funnel",
    "events_sessionize",
    "events_sliding_window",
    "events_tumbling_hour",
    "graph_bfs_2hop",
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
    "rollup_revenue",
    "sample_hash_10pct",
    "sample_stratified_by_lang",
    "split_group_aware_lsh",
    "split_train_val_test",
    "stream_dedup_exact",
    "stream_dedup_fingerprint",
    "stream_sessionize",
    "stream_sliding_window",
    "stream_strip_boilerplate",
    "stream_tumbling_hour",
    "stream_view_purchase_attribution",
    "text_fingerprint_rolling",
    "text_fingerprint_winnow",
    "text_pii_scrub_audit",
    "text_quality",
    "text_token_stats",
    "window_top_orders_per_customer",
    # (b) riders of the r15 api.py timestamp change: the oracles that
    # hash timestamp bytes or version-pinned snapshot state
    "crud_change_feed",
    "crud_cdf_mirror",
    "crud_time_travel",
    "api_search_time_travel",
    "api_search_sign_incremental",
    # (c) spare slots: alphabetically-first 5 of the r12 tier (its
    # staleness bound lands in r16; the remaining 35 lead that window)
    "ann_recall_report",
    "anti_join_never_bulk_ordered_parts",
    "decontam_ngram_overlap",
    "dedup_components",
    "dedup_embedding_cosine",
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
