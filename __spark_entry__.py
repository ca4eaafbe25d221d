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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(q.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(q.ORACLE_SQL)
