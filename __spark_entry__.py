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
# in registration order. Round 18 rotation (r17 verdict #3, executed
# exactly as pre-queued in the r17 comment): (a) the 29 remaining
# oracled entries of the 50-query r14 tier hit their staleness bound
# this round and MUST lead — alphabetical from ivf_add_remove_roundtrip
# through window_running_totals per CORRECTNESS_r14 (the tier's other
# 21 members: 16 rode r17 as spares, 5 — api_search_sign_incremental,
# api_search_time_travel, crud_cdf_mirror, crud_change_feed,
# crud_time_travel — have newer r15/r16 evidence and ride those
# tiers). (b) The r18 code-change riders — the entries whose oracles
# hash bytes crossing this round's api.py/queries.py/cdf.py changes:
# api_bundle_cascade_read (NEW — multi-table bundle, r17 verdict #6:
# chunks→documents→libraries served offline from the sibling-carrying
# bundle, full oracle over every chunk row),
# api_search_export_bundle + api_search_bundle_sync (their staging now
# exports/syncs WITH siblings, and sync_bundle carries the
# stale-donor-invalidation fix — r17 ADVICE medium),
# api_search_bundle_time_travel (rides open_serving_bundle's new
# sibling _CURRENT gates), api_search_sign_incremental (the stored
# sign layout gained self-sized id-hash sub-partitions + width
# carry-through on the incremental path — r17 verdict #7) and
# crud_cdf_mirror (the mirror bootstrap width now self-sizes from
# snapshot bytes, floor 16 — same verdict item; also rides the
# timeline-mint errno narrowing, r17 ADVICE low), and
# api_search_sq8 (NEW r18 — the QUANTIZED serving tier: the sign
# layout carries an SQ8 code-column triple, the probe reads codes
# instead of fp bytes, exact fp rerank via a bucket-pruned point
# read; `auto` routes here past AUTO_SQ8_MIN; full oracle since
# quantize/reconstruct is deterministic arithmetic DuckDB
# reproduces). (c) Spare slots: the alphabetically-first 14
# not-already-listed ORACLED entries of
# the 50-query r15 tier, which bounds in r19 — ann_recall_report
# through events_sessionize (events_sliding_window, the 15th,
# yields its slot to the sq8 rider and leads r19 with its tier;
# the tier's rows-only members —
# dedup_minhash_lsh, dedup_simhash, embed_hashed, ivf_batch_search,
# ivf_search, ivf_search_pruned, lsh_bucket_pairs, lsh_search — are
# seed-dependent KMeans/LSH forms whose md5/full-probe twins carry
# the hash evidence; window slots are reserved for hash evidence, so
# they are skipped, same rule as r17's comment). The remaining 26
# oracled r15-tier entries MUST lead the r19 window (alphabetical
# from events_sliding_window through window_top_orders_per_customer
# per CORRECTNESS_r15 — events_sliding_window rejoins its tier after
# yielding its r18 spare slot; minus any that ride r19 code changes
# or newer tiers), and api_search_batch_sq8 (NEW r18, full oracle,
# no driver row yet) rides r19 alongside any r19 code-change riders. All 50 slots this round are
# FULL-ORACLE (the r12 tier's rows-only member
# sketch_distinct_users_daily rode its own tier in r16 and is not
# stale again until r20). The 8 registry entries with no driver row
# at any round (knn_graph_blocked + the 7 trained PQ/recall tiers)
# are rows-only by design with no oracle; they stay outside the
# rotation — a driver rows-only row adds nothing over the local
# three-scale verification and the recall invariants in tests, and
# window slots are reserved for hash evidence (r15 verdict).
_PRIORITY = [
    # (a) staleness-bound mandate: the r14 tier's 29 remaining oracled
    # entries, alphabetical
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
    "stream_then_ivf_search",
    "string_funcs_parts",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "window_running_totals",
    # (b) riders of the r18 bundle/layout/mirror changes
    "api_bundle_cascade_read",
    "api_search_export_bundle",
    "api_search_bundle_sync",
    "api_search_bundle_time_travel",
    "api_search_sign_incremental",
    "crud_cdf_mirror",
    "api_search_sq8",
    # (c) spare slots: alphabetically-first 14 not-already-listed
    # entries of the r15 tier (its staleness bound lands in r19; the
    # remaining 31 lead that window)
    "ann_recall_report",
    "anti_join_never_bulk_ordered_parts",
    "api_search_time_travel",
    "crud_change_feed",
    "crud_time_travel",
    "decontam_ngram_overlap",
    "dedup_components",
    "dedup_embedding_cosine",
    "embed_letter_knn",
    "embed_pool_by_label",
    "events_asof_last_view",
    "events_json_extract",
    "events_session_funnel",
    "events_sessionize",
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
