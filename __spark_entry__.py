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
# in registration order. Round 12 rotation (r11 verdict #1): (a)
# api_search_sign — r11-new full oracle with no driver row yet (it
# value-checks the `auto` strategy's past-the-knee default path) —
# plus the 18 queries whose last driver row is r8, at the staleness
# bound: they MUST be in this window; (b) the facade entries, because
# api.py changes this round (beam/hops loud-fail on the exact
# fallback per r11 ADVICE; two-level coarse quantizer in _ivf_stored
# per r11 verdict #6) and stream_then_ivf_search, which rides BOTH
# the reworked ingest dead-letter sink (r11 ADVICE) and the facade
# IVF path, plus the r12-NEW full-oracle entries ivf_sign_two_level
# (the deterministic twin of the two-level coarse quantizer) and
# api_search_time_travel (version-pinned search) — a new entry should
# get its driver row in its own round, the lesson of api_search_sign's
# r11 deferral; (c) 22 of the 45 remaining queries whose last driver
# row is r9 — the alphabetically-first 22, a transparent pick — so
# the 23 deferred (pack_token_budget, sample_temperature_by_lang,
# split_group_aware, text_scrub_denylist, and the 19 r9-tier tpch_q*
# entries) hit their staleness bound in r13 and lead that window with
# 27 slots to spare. Everything stays re-verified locally at three
# scale factors each round via tools/verify_local.py.
# (The trained/residual PQ tiers remain rows-only by design and keep
# their recall invariants in tests.)
_PRIORITY = [
    # (a) staleness-bound mandate (r11 verdict #1)
    "api_search_sign",  # r11-new full oracle, never driver-checked
    "docs_shuffle_order",
    "docs_zipf_token_freq",
    "docs_quality_quantiles",
    "docs_dedup_family_sizes",
    "orders_percentile_by_priority",
    "part_cube_brand_size",
    "quantiles_order_value",
    "supplier_balance_ntile",
    "sketch_distinct_users_daily",
    "skew_salted_event_counts",
    "events_interarrival",
    "events_partition_pruned_scan",
    "events_retention_cohorts",
    "events_band_clicks_near_errors",
    "events_error_burst_windows",
    "text_bpe_token_stats",
    "text_langid",
    "text_repetition_stats",
    # (b) code paths changed in r12: api.py (search validation,
    # two-level coarse quantizer) and streaming/ingest.py (dead-letter
    # clear-first idempotency)
    "api_search_nsw",
    "api_search_auto",
    "api_search_cosine",
    "api_search_batch_auto",
    "api_search_batch_cosine",
    "api_search_batch_table",
    "stream_then_ivf_search",
    "ivf_sign_two_level",  # r12-new full oracle: two-level routing twin
    "api_search_time_travel",  # r12-new full oracle: pinned-version search
    # (c) last driver row r9 — alphabetically-first 22 of the 45-query
    # tier (the other 23 hit the bound in r13 and lead that window)
    "ann_recall_report",
    "anti_join_never_bulk_ordered_parts",
    "crud_time_travel",
    "decontam_ngram_overlap",
    "dedup_components",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_lsh",
    "dedup_exact",
    "dedup_keep_best_per_family",
    "dedup_lines_boilerplate",
    "dedup_minhash_lsh_md5",
    "dedup_ngram_jaccard",
    "dedup_simhash_md5",
    "docs_training_manifest",
    "embedding_stats",
    "graph_beam_search_stored",
    "ivf_pq_search",
    "knn_graph_auto",
    "knn_graph_broadcast",
    "knn_pq_adc",
    "knn_range_search",
    "lsh_search_md5",
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
