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
# in registration order. Round 7 rotation (r6 verdict #5): (a) the 7
# oracled queries with NO driver row yet (the r7 recall/graph/batch-PQ
# tiers, the newly oracle-closed streaming e2e's stored-codes sibling),
# (b) ALL 32 queries whose last driver row is r4 — three rounds stale,
# the oldest tier in the registry — and (c) 11 r5-tier picks the r6
# verdict named (the streaming e2e with its NEW oracle, the fulltext/
# rerank/compression family, multimodal, the funnel pair). The
# remaining r5 tier (33 queries) is r8's window; everything here is
# re-verified locally each round via tools/verify_local.py regardless.
_PRIORITY = [
    # (a) first driver row
    "ivf_sign_multiprobe",
    "lsh_search_md5_multi",
    "knn_pq_adc_deep",
    "ivf_pq_multiprobe",
    "knn_pq_batch",
    "knn_graph_lsh",
    "knn_pq_stored",
    # (b) last driver row r4
    "api_search_batch_cosine",
    "crud_cascade_delete",
    "crud_delete",
    "crud_exists_semi",
    "crud_fk_orphans",
    "crud_full_scan",
    "crud_insert_append",
    "crud_point_lookup",
    "crud_reject_duplicates",
    "crud_truncate",
    "crud_upsert",
    "events_json_extract",
    "events_sessionize",
    "events_sliding_window",
    "events_tumbling_hour",
    "graph_add_remove",
    "graph_bfs_2hop",
    "ivf_add_remove_roundtrip",
    "ivf_batch_search_full_probe",
    "ivf_search_full_probe",
    "knn_batch",
    "knn_brute_force",
    "knn_graph",
    "knn_hydrated",
    "knn_metadata_filter",
    "rollup_revenue",
    "text_quality",
    "text_token_stats",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "window_top_orders_per_customer",
    # (c) r5-tier picks named in the r6 verdict + the round-7 flagship
    # additions (beam-over-LSH-graph, oracle-matched recall reports,
    # fingerprint stream dedup) taking their first driver row; the
    # displaced r5 queries (mm_*, funnel, as-of) hit their 3-round
    # staleness bound exactly at r8 and lead that window
    "stream_then_ivf_search",
    "fts_bm25",
    "hybrid_rrf",
    "knn_sq8",
    "knn_mmr_diversified",
    "graph_beam_search",
    "ivf_sign_pruned",
    "graph_beam_search_lsh",
    "graph_lsh_edge_recall",
    "ann_recall_multi",
    "stream_dedup_fingerprint",
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
