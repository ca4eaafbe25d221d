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
# in registration order. Round 16 rotation (r15 verdict #1, executed
# exactly as pre-queued in the r15 comment): (a) the 35-query r12 tier
# hits its staleness bound this round and MUST lead — its 34 ORACLED
# members go first (r15 verdict "what's wrong" #2: oracled entries
# lead; rows-only entries ride only with their own stale tier), and
# the tier's single rows-only member (sketch_distinct_users_daily —
# an HLL-sketch aggregate with no exact SQL twin by design) rides
# AFTER the code-change riders so the window front-loads hash
# evidence: 49 of 50 slots are full-oracle this round (r15 ran 42).
# (b) The r16 code-change riders: serving.py grew the X-Timeline-Id
# echo and offset-aware UTC timestamp serialization, streaming/cdf.py
# grew the timeline-identity gate + direct-parquet bootstrap (r15
# ADVICE, all four items), and api.py grew the store timeline id and
# export_serving_bundle — the riders are the entries whose oracles
# hash bytes that cross those code paths: crud_change_feed (ts_ok
# gates timestamp bytes), crud_cdf_mirror (the consumer mirror's
# symmetric diff includes both timestamps), crud_time_travel +
# api_search_time_travel (version-pinned snapshot reads over the
# store whose root now carries _TIMELINE), api_search_sign_incremental
# (delta-chain provenance), and api_search_export_bundle (NEW this
# round — the exported-bundle serving path, sharing api_search_sign's
# full value oracle). (c) Spare slots: the alphabetically-first 9 of
# the 39-query r13 tier, which hits its bound in r17 — the remaining
# 30 of that tier MUST lead the r17 window (alphabetical from
# crud_truncate through window/text entries per CORRECTNESS_r13), and
# the 45-query r14 tier then bounds in r18. The 8 registry entries
# with no driver row at any round (knn_graph_blocked + the 7 trained
# PQ/recall tiers) are rows-only by design with no oracle; they are
# deliberately outside the rotation — a driver rows-only row adds
# nothing over the local three-scale verification and the recall
# invariants in tests, and window slots are reserved for hash
# evidence (r15 verdict "what's wrong" #2).
_PRIORITY = [
    # (a) staleness-bound mandate: the r12 tier's 34 oracled entries,
    # alphabetical
    "dedup_embedding_cosine_lsh",
    "dedup_exact",
    "dedup_keep_best_per_family",
    "dedup_lines_boilerplate",
    "dedup_minhash_lsh_md5",
    "dedup_ngram_jaccard",
    "dedup_simhash_md5",
    "docs_dedup_family_sizes",
    "docs_quality_quantiles",
    "docs_shuffle_order",
    "docs_training_manifest",
    "docs_zipf_token_freq",
    "embedding_stats",
    "events_band_clicks_near_errors",
    "events_error_burst_windows",
    "events_interarrival",
    "events_partition_pruned_scan",
    "events_retention_cohorts",
    "graph_beam_search_stored",
    "ivf_pq_search",
    "ivf_sign_two_level",
    "knn_graph_auto",
    "knn_graph_broadcast",
    "knn_pq_adc",
    "knn_range_search",
    "lsh_search_md5",
    "orders_percentile_by_priority",
    "part_cube_brand_size",
    "quantiles_order_value",
    "skew_salted_event_counts",
    "supplier_balance_ntile",
    "text_bpe_token_stats",
    "text_langid",
    "text_repetition_stats",
    # (b) riders of the r16 serving/cdf/api changes: the oracles that
    # hash timestamp bytes, version-pinned snapshots, or the new
    # exported-bundle serving path
    "crud_change_feed",
    "crud_cdf_mirror",
    "crud_time_travel",
    "api_search_time_travel",
    "api_search_sign_incremental",
    "api_search_export_bundle",
    # (a, continued) the r12 tier's single rows-only member rides its
    # own stale tier, after the oracled block
    "sketch_distinct_users_daily",
    # (c) spare slots: alphabetically-first 9 of the r13 tier (its
    # staleness bound lands in r17; the remaining 30 lead that window)
    "ann_recall_multi",
    "crud_cascade_delete",
    "crud_delete",
    "crud_exists_semi",
    "crud_fk_orphans",
    "crud_full_scan",
    "crud_insert_append",
    "crud_point_lookup",
    "crud_reject_duplicates",
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
