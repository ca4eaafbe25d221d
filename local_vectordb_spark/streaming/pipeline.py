"""Structured Streaming surface (SURVEY §7 step 7).

The reference is purely request/response — nothing streams — so this
module is pure capability extension: the SAME windowing operators used
in batch (operators/events.py) wired to ``readStream``, plus
watermark-bounded state so a stream that runs for months doesn't
accumulate unbounded window state.

Design rules at scale:
- every stateful op (windowed agg, dedup, session) sits behind a
  watermark, which bounds state to [max event time - watermark];
- file sources set maxFilesPerTrigger so a backlog replays as bounded
  micro-batches instead of one giant batch;
- tests drive streams with trigger(availableNow) into a memory sink —
  the production path swaps the sink, not the plan.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from local_vectordb_spark.operators import events as ev

# serializes run_available_now's session-global shuffle-partition
# scoping window (see its docstring)
_CONF_SCOPE_LOCK = threading.Lock()

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENT_SCHEMA,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-source stream over a directory of event parquet files.

    Explicit schema is mandatory for streaming reads; bounded trigger
    size keeps replay micro-batches executor-memory-sized.
    """
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )


def watermarked_tumbling(
    stream: DataFrame, watermark: str = "2 hours", **kwargs
) -> DataFrame:
    """Streaming tumbling-window counts — identical aggregation to the
    batch operator; the watermark only bounds state/lateness."""
    return ev.tumbling(stream.withWatermark("ts", watermark), **kwargs)


def watermarked_sliding(
    stream: DataFrame, watermark: str = "2 hours", **kwargs
) -> DataFrame:
    return ev.sliding(stream.withWatermark("ts", watermark), **kwargs)


def watermarked_sessionize(
    stream: DataFrame, watermark: str = "2 hours", **kwargs
) -> DataFrame:
    """Streaming session windows: state closes once the watermark passes
    session end + gap."""
    return ev.sessionize(stream.withWatermark("ts", watermark), **kwargs)


def stream_dedup(
    stream: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon: the streaming
    form of exact dedup (SURVEY §2.5). State holds one entry per key
    seen in the horizon and is evicted as the watermark advances."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def run_available_now(
    sdf: DataFrame,
    query_name: str,
    output_mode: str = "append",
    timeout_sec: int = 300,
    shuffle_partitions: int | None = None,
    progress_sink: list | None = None,
) -> DataFrame:
    """Drain all currently-available input through the streaming plan
    (trigger=availableNow) into an in-memory table; return it.

    ``shuffle_partitions`` scopes ``spark.sql.shuffle.partitions`` to
    this streaming run (captured by the stream at start, restored
    after): stateful operators allocate one state store per shuffle
    partition, so a KB-scale-state query on a 32-core session otherwise
    pays 32 state-store instances x per-batch commit overhead for
    state that fits in one. Size it by STATE volume, not corpus volume
    — a 100 TB ingest stream keyed on billions of users wants hundreds
    of state partitions; a per-(window,type) aggregate with dozens of
    groups wants single digits. Fresh checkpoints only: repartitioning
    state under an existing checkpoint is an error.

    ``progress_sink`` (a list) receives the run's per-trigger
    StreamingQueryProgress dicts, so tests can assert state-store row
    bounds across micro-batches.

    Test/inspection helper — production sinks are parquet/kafka via the
    same writeStream with a checkpointLocation.

    CONCURRENCY (r9 ADVICE): the scoped conf is SESSION-GLOBAL while
    the stream drains — Spark has no per-query shuffle-partition
    option, and the stream captures the value from the session that
    built ``sdf``, so a session clone can't carry it either. A lock
    serializes overlapping run_available_now calls in this process
    (interleaved set/restore can otherwise restore the wrong 'old'
    value); a BATCH query planned concurrently on the same session
    during the window would still see the scoped value — callers
    running a parallel harness should pass shuffle_partitions=None or
    use a separate SparkSession.
    """
    import json as _json

    spark = sdf.sparkSession
    key = "spark.sql.shuffle.partitions"
    # the context manager covers conf.get/set too (r10 ADVICE): a
    # transient py4j failure inside the scoped window must still
    # release the lock, or every later run_available_now call in the
    # process deadlocks
    with _CONF_SCOPE_LOCK:
        old = spark.conf.get(key)
        if shuffle_partitions is not None:
            spark.conf.set(key, str(shuffle_partitions))
        try:
            q = (
                sdf.writeStream.format("memory")
                .queryName(query_name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
            try:
                if not q.awaitTermination(timeout_sec):
                    raise TimeoutError(
                        f"stream {query_name} still running after {timeout_sec}s"
                    )
                if progress_sink is not None:
                    for p in q.recentProgress:
                        progress_sink.append(
                            _json.loads(p.json) if hasattr(p, "json") else p
                        )
            finally:
                if q.isActive:
                    q.stop()
        finally:
            if shuffle_partitions is not None:
                spark.conf.set(key, old)
    return spark.table(query_name)
