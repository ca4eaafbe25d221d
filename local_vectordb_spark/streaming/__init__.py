from local_vectordb_spark.streaming.pipeline import (  # noqa: F401
    EVENT_SCHEMA,
    read_events_stream,
    run_available_now,
    stream_dedup,
    watermarked_sessionize,
    watermarked_sliding,
    watermarked_tumbling,
)
from local_vectordb_spark.streaming.stateful import running_user_totals  # noqa: F401
from local_vectordb_spark.streaming.ingest import (  # noqa: F401
    run_chunk_upsert_stream,
    run_chunk_upsert_stream_into_db,
)
