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
# in registration order. Round 19 rotation (executed exactly as
# pre-queued in the r18 comment below this one's predecessor): (a) the
# 26 remaining ORACLED entries of the 50-query r15 tier hit their
# staleness bound this round and MUST lead — alphabetical from
# events_sliding_window through window_top_orders_per_customer per
# CORRECTNESS_r15, minus the tier's 8 rows-only members
# (dedup_minhash_lsh, dedup_simhash, embed_hashed, ivf_batch_search,
# ivf_search, ivf_search_pruned, lsh_bucket_pairs, lsh_search —
# seed-dependent KMeans/MLlib-LSH forms whose md5/full-probe twins
# carry the hash evidence; window slots are reserved for hash
# evidence, the standing r15-verdict rule) and minus
# api_search_sign_incremental + crud_cdf_mirror, which have newer
# r16/r18 evidence and ride those tiers. (b) The r19 code-change
# riders — entries whose oracles hash bytes crossing this round's
# optimization changes: api_search_batch_sq8 (NEW r18, full oracle,
# first driver row — pre-queued), dedup_simhash_md5 (the numpy
# mapInArrow simhash-vote kernel), docs_quality_quantiles +
# docs_training_manifest + docs_training_manifest_leakage_safe +
# dedup_keep_best_per_family (the Arrow quality kernel — text_quality
# itself leads with its tier in (a)), graph_beam_search +
# graph_beam_search_lsh + graph_beam_search_stored + api_search_nsw
# (the driver-frontier bounded-collect traversal), dedup_embedding_
# cosine_lsh (input materialization barrier), dedup_lines_boilerplate
# (staged multiline chunking), and knn_pq_batch +
# ivf_batch_search_full_probe + api_search_batch_table (single-slice
# local query/probe tables — representatives of that sweep).
# (c) Spare slots: the alphabetically-first 9 not-already-listed
# ORACLED entries of the 50-query r16 tier, whose staleness bound
# lands in r20 — ann_recall_multi through crud_exists_semi. The
# REMAINING oracled r16-tier entries MUST lead the r20 window
# (alphabetical per CORRECTNESS_r16, minus any that ride r20 code
# changes or newer tiers), with spares drawn from the r17 tier.
_PRIORITY = [
    # (a) staleness-bound mandate: the r15 tier's 26 remaining oracled
    # entries, alphabetical
    "events_sliding_window",
    "events_tumbling_hour",
    "graph_bfs_2hop",
    "knn_pq_batch_stored",
    "knn_sign_batch",
    "knn_sign_batch_pruned",
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
    # (b) riders of the r19 optimization changes
    "api_search_batch_sq8",
    "dedup_simhash_md5",
    "docs_quality_quantiles",
    "docs_training_manifest",
    "docs_training_manifest_leakage_safe",
    "dedup_keep_best_per_family",
    "graph_beam_search",
    "graph_beam_search_lsh",
    "graph_beam_search_stored",
    "api_search_nsw",
    "dedup_embedding_cosine_lsh",
    "dedup_lines_boilerplate",
    "knn_pq_batch",
    "ivf_batch_search_full_probe",
    "api_search_batch_table",
    # (c) spare slots: alphabetically-first 9 not-already-listed
    # oracled entries of the r16 tier (its staleness bound lands in
    # r20; the remaining entries lead that window)
    "ann_recall_multi",
    "api_search_export_bundle",
    "api_search_sign_incremental",
    "api_search_time_travel",
    "crud_cascade_delete",
    "crud_cdf_mirror",
    "crud_change_feed",
    "crud_delete",
    "crud_exists_semi",
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
