"""Ingest the reference engine's on-disk format into DataFrames.

The reference persists one JSON object per record at
``{data_dir}/{libraries|documents|chunks}/{uuid}.json``
(/root/reference/src/models/collection.py:58-75, src/main.py:33-43),
serialized with ``json.dump(item.model_dump(), f, default=str)`` — so
UUIDs and datetimes arrive as strings ("2025-10-31 12:34:56.789012")
and ``metadata: dict[str, str|int]`` mixes value types.

``read_collection`` reads that layout with an EXPLICIT schema (never
infer at scale — inference is a full extra pass over the data):

- datetimes parse via ``timestampFormat`` matching ``str(datetime)``;
- metadata maps to MAP<STRING,STRING> — Spark's JSON parser captures
  non-string scalars verbatim when the target type is string, which
  reproduces exactly what the reference's ``default=str`` round-trip
  produces (SURVEY §1.2);
- corrupt files surface in a ``_corrupt_record`` column instead of
  failing the job (the reference silently returns None on
  JSONDecodeError, collection.py:62-68 — here the bad rows stay
  observable).

Scale note: a 100 TB corpus as one-file-per-record is millions of tiny
files — the worst layout for any engine. The supported path is
``snapshot_to_parquet`` once, then all queries run on the parquet
snapshot with real pushdown/pruning/stats.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BASE_FIELDS = [
    T.StructField("id", T.StringType(), False),
    T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("created_at", T.TimestampType(), True),
    T.StructField("updated_at", T.TimestampType(), True),
]

LIBRARY_SCHEMA = T.StructType(
    [*_BASE_FIELDS, T.StructField("name", T.StringType(), True)]
)

DOCUMENT_SCHEMA = T.StructType(
    [
        *_BASE_FIELDS,
        T.StructField("name", T.StringType(), True),
        T.StructField("library_id", T.StringType(), True),
    ]
)

CHUNK_SCHEMA = T.StructType(
    [
        *_BASE_FIELDS,
        T.StructField("content", T.StringType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("document_id", T.StringType(), True),
    ]
)

SCHEMAS: dict[str, T.StructType] = {
    "libraries": LIBRARY_SCHEMA,
    "documents": DOCUMENT_SCHEMA,
    "chunks": CHUNK_SCHEMA,
}

# str(datetime.utcnow()) → "2025-10-31 12:34:56.789012" (optional micros)
_REFERENCE_TS_FORMAT = "yyyy-MM-dd HH:mm:ss[.SSSSSS]"


def read_collection(
    spark: SparkSession, data_dir: str, kind: str, keep_corrupt: bool = False
) -> DataFrame:
    """Read one reference collection directory as a DataFrame.

    ``kind`` is one of libraries/documents/chunks. Returns the §1.1
    Spark-mapped schema; rows that fail to parse land in
    ``_corrupt_record`` (dropped unless ``keep_corrupt``).
    """
    if kind not in SCHEMAS:
        raise ValueError(f"unknown collection kind: {kind!r}")
    # fresh StructType — .add() would mutate the shared module constant
    schema = T.StructType(
        [*SCHEMAS[kind].fields, T.StructField("_corrupt_record", T.StringType(), True)]
    )
    df = (
        spark.read.schema(schema)
        .option("timestampFormat", _REFERENCE_TS_FORMAT)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(os.path.join(data_dir, kind, "*.json"))
    )
    if keep_corrupt:
        # Spark forbids queries that reference ONLY the corrupt-record
        # column of a JSON scan; caching materializes the parse so
        # callers can inspect _corrupt_record freely.
        return df.cache()
    # a failed parse nulls every data field, so id IS NOT NULL both
    # drops corrupt rows and avoids the corrupt-column-only restriction
    return df.filter(F.col("id").isNotNull()).drop("_corrupt_record")


def snapshot_to_parquet(
    spark: SparkSession, data_dir: str, out_dir: str
) -> dict[str, int]:
    """One-time migration: reference JSON layout → parquet tables.

    Returns row counts per collection. Output is coalesced to a
    sane file count (the input is one record per file)."""
    counts: dict[str, int] = {}
    for kind in SCHEMAS:
        src = os.path.join(data_dir, kind)
        if not os.path.isdir(src):
            counts[kind] = 0
            continue
        df = read_collection(spark, data_dir, kind)
        df.coalesce(max(1, df.rdd.getNumPartitions() // 64)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{kind}.parquet"))
        counts[kind] = spark.read.parquet(
            os.path.join(out_dir, f"{kind}.parquet")
        ).count()
    return counts


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines source with a mandatory explicit schema."""
    return spark.read.schema(schema).json(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> DataFrame:
    """CSV source with a mandatory explicit schema (no inference pass)."""
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)
