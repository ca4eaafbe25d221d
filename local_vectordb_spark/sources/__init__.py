from local_vectordb_spark.sources.json_records import (  # noqa: F401
    CHUNK_SCHEMA,
    DOCUMENT_SCHEMA,
    LIBRARY_SCHEMA,
    read_collection,
    read_csv,
    read_jsonl,
    snapshot_to_parquet,
)
