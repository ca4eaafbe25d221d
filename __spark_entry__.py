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
# in registration order. Round 14 rotation (r13 verdict #1): (a) the
# 31 queries whose last driver row is r10 — at the staleness bound,
# they MUST lead this window (the remainder of the 47-query r10 tier
# after r13 pre-drained its alphabetical head through
# graph_beam_search_lsh); (b) the entries riding code that changes in
# r14 — api.py (Python-literal commit timestamps so the recorded
# delta is byte-identical to the snapshot, r13 ADVICE; typed
# IncompleteChangeLog; _incremental_base early return) and the
# crud_change_feed/api_search_sign_incremental staging in queries.py
# (ts_ok column, st_nlink gate): every api_search_* facade entry,
# crud_change_feed, crud_time_travel, and stream_then_ivf_search
# (rides the facade IVF path); (c) the alphabetically-first 7 of the
# 46 queries whose last driver row is r11 — that tier hits its bound
# in r15, so the remaining 39 MUST lead the r15 window (39 + the r14
# code-riders keeps r15 inside 50; the 41-query r12 tier then hits
# its bound in r16 and takes r15's spare slots first, alphabetically).
# Everything stays re-verified locally at three scale factors each
# round via tools/verify_local.py. (The trained/residual PQ tiers
# remain rows-only by design and keep their recall invariants in
# tests.)
_PRIORITY = [
    # (a) staleness-bound mandate (r13 verdict #1): last driver row
    # r10 — the 31 remaining after r13's alphabetical pre-drain
    "graph_lsh_edge_recall",
    "grouping_sets_flag_status",
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
    "numeric_stats_lineitem",
    "pivot_status_by_priority",
    "scalar_subquery_premium_parts",
    "semi_join_deep_discount_orders",
    "setops_wealthy_nations",
    "string_funcs_parts",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "window_running_totals",
    # (b) code paths changed in r14: api.py write-path timestamps +
    # typed change-log error + incremental-base early return; the
    # shared _inc_search_store staging (st_nlink gate) and the
    # crud_change_feed ts_ok column in queries.py
    "api_search_nsw",
    "api_search_auto",
    "api_search_cosine",
    "api_search_sign",
    "api_search_time_travel",
    "api_search_batch_auto",
    "api_search_batch_cosine",
    "api_search_batch_table",
    "api_search_sign_incremental",
    "crud_change_feed",
    "crud_cdf_mirror",  # r14-NEW full oracle: the CDF contract proved
    # end to end — stale snapshot + feed must equal the live table,
    # full rows including timestamps, symmetric diff pinned to 0
    "crud_time_travel",
    "stream_then_ivf_search",
    # (c) last driver row r11 — the alphabetically-first 6 ORACLED
    # entries of the 46-query tier (the staleness bound tracks the
    # full-oracle rows; the tier's rows-only members —
    # dedup_minhash_lsh, dedup_simhash, embed_hashed and friends —
    # are seed-dependent by design with oracled twins, so spending a
    # window slot on their weaker rows-only driver check re-verifies
    # nothing a slot on an oracled sibling doesn't). The remaining 40
    # hit the bound in r15 and lead that window: embed_letter_knn,
    # embed_pool_by_label, events_*, graph_bfs_2hop,
    # ivf_batch_search, ivf_search, ivf_search_pruned,
    # knn_pq_batch_stored, knn_sign_batch, knn_sign_batch_pruned,
    # lsh_bucket_pairs, lsh_search, mm_*, rollup_revenue, sample_*,
    # split_group_aware_lsh, split_train_val_test, stream_*, text_*,
    # window_top_orders_per_customer.
    "chunk_documents",
    "dedup_lsh_bucket_audit",
    "dedup_minhash_lsh_md5_capped",
    "dedup_ngram_jaccard_capped",
    "docs_training_manifest_leakage_safe",
    "embed_hashed_md5",
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
