"""Query registry: every SURVEY §2 operator as a (Spark callable, DuckDB
oracle SQL) pair, keyed by the same name.

This module is the single source of truth consumed by
``__spark_entry__.py`` (driver contract), ``bench.py`` (headline
timings) and ``tests/`` (local correctness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from local_vectordb_spark.operators import knn
from local_vectordb_spark.session import load_table

SPARK_QUERIES: dict = {}
ORACLE_SQL: dict[str, str] = {}

K = 10


def register(name: str, sql: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _query_vecs(sf_dir: str, max_vec_id: int = 1) -> list[tuple[int, list[float]]]:
    """Driver-side lookup of query vectors (the analogue of the
    reference embedding query text driver-side before the scan,
    /root/reference/src/models/collection.py:312).  Read with pyarrow —
    a point lookup should not cost a Spark job."""
    import pyarrow.dataset as ds

    tbl = (
        ds.dataset(f"{sf_dir}/embeddings.parquet")
        .to_table(filter=ds.field("vec_id") < max_vec_id, columns=["vec_id", "embedding"])
        .sort_by("vec_id")
    )
    return [
        (int(i), [float(x) for x in v])
        for i, v in zip(tbl["vec_id"].to_pylist(), tbl["embedding"].to_pylist())
    ]


# --------------------------------------------------------------------------
# Q1+Q2+Q3 — brute-force cosine top-k (flat index search)
# --------------------------------------------------------------------------


@register(
    "knn_brute_force",
    f"""
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS score
    FROM embeddings e
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    ORDER BY score DESC, e.vec_id ASC
    LIMIT {K}
    """,
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return knn.knn_brute_force(emb, _query_vecs(sf_dir)[0][1], k=K)


# --------------------------------------------------------------------------
# Q2 batched — bulk similarity search (one corpus scan for many queries)
# --------------------------------------------------------------------------


@register(
    "knn_batch",
    f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS query_vec
      FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
      SELECT q.query_id, e.vec_id,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.query_vec::DOUBLE[]), 6) AS score
      FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, score
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rn
      FROM scored
    )
    WHERE rn <= {K}
    """,
)
def knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return knn.knn_batch(emb, _query_vecs(sf_dir, max_vec_id=8), k=K)


# --------------------------------------------------------------------------
# Q6 — result hydration (join results back to content)
# --------------------------------------------------------------------------


@register(
    "knn_hydrated",
    f"""
    WITH topk AS (
      SELECT e.vec_id,
             ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS score
      FROM embeddings e
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      ORDER BY score DESC, e.vec_id ASC
      LIMIT {K}
    )
    SELECT t.vec_id, t.score, d.text AS content
    FROM topk t JOIN documents d ON t.vec_id = d.doc_id
    """,
)
def knn_hydrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    topk = knn.knn_brute_force(emb, _query_vecs(sf_dir)[0][1], k=K)
    return knn.hydrate(topk, docs)


# --------------------------------------------------------------------------
# Q8 — metadata-filtered kNN (filter pushes to the Parquet scan)
# --------------------------------------------------------------------------


@register(
    "knn_metadata_filter",
    f"""
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS score
    FROM embeddings e
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE e.label = 3
    ORDER BY score DESC, e.vec_id ASC
    LIMIT {K}
    """,
)
def knn_metadata_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    filtered = knn.metadata_filter(emb, label=3)
    return knn.knn_brute_force(filtered, _query_vecs(sf_dir)[0][1], k=K)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entry() target: scan → score → top-k → hydrate."""
    return knn_hydrated(spark, sf_dir)
