"""Streaming ingest of reference-format chunk records (SURVEY §3 entry
point 2, as a stream).

The reference's write path is one HTTP POST per chunk, each of which
re-validated parents, re-wrote a JSON file, and rebuilt every index
(collection.py:77-110, main.py:219-246 — Θ(n²) total). The streaming
re-expression: chunk JSON files land in a directory, each micro-batch
is validated (FK semi-join), merged into the parquet table by key
(insert new ids, overwrite changed ones), and derived artifacts refresh
once per BATCH, not per record.

foreachBatch is the right tool because the sink is a keyed upsert —
not an append — which file sinks can't express; a table format
(Delta/Iceberg) would replace the read-merge-overwrite with MERGE INTO
and make the commit atomic on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from local_vectordb_spark.operators import crud
from local_vectordb_spark.sources.json_records import CHUNK_SCHEMA


def run_chunk_upsert_stream(
    spark: SparkSession,
    src_dir: str,
    table_path: str,
    checkpoint_dir: str,
    documents: DataFrame | None = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """Drain chunk JSON files from ``src_dir`` into the parquet table at
    ``table_path`` (availableNow), upserting by id. Rows whose
    document_id is missing from ``documents`` are rejected (C8).
    Returns the final table DataFrame."""
    stream = (
        spark.readStream.schema(CHUNK_SCHEMA)
        .option("maxFilesPerTrigger", "64")
        .json(src_dir)
    )

    def upsert_batch(batch: DataFrame, batch_id: int) -> None:
        if documents is not None:
            batch = batch.join(
                documents.select("id").withColumnRenamed("id", "document_id"),
                "document_id",
                "left_semi",
            )
        # batch-local dedup: last writer wins within a micro-batch
        batch = batch.dropDuplicates(["id"])
        if os.path.isdir(table_path):
            base = spark.read.parquet(table_path)
            merged = crud.upsert(base, batch, "id")
        else:
            merged = batch
        # read-merge-overwrite on plain parquet: stage then swap via
        # two writes (a table format would make this one atomic MERGE)
        staged = f"{table_path}.staging"
        merged.write.mode("overwrite").parquet(staged)
        spark.read.parquet(staged).write.mode("overwrite").parquet(table_path)

    q = (
        stream.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError("chunk upsert stream did not drain in time")
    return spark.read.parquet(table_path)


def clear_dead_letter_batch(rejects_dir: str, batch_id: int) -> None:
    """Drop EVERYTHING a previous attempt of micro-batch ``batch_id``
    dead-lettered, at the START of the batch (r11 ADVICE): per-call
    overwrite alone is only idempotent while the retry rejects the
    same rows under the same call — a retry whose reject set became
    empty (first attempt partially committed before failing) or whose
    rows reclassified add→update never rewrites the stale
    subdirectory, so the earlier attempt's rows survive under the same
    batch_id. Clearing the whole ``batch_id=N`` partition first makes
    the invariant unconditional: after any attempt, the partition
    holds exactly THAT attempt's rejects."""
    import shutil

    shutil.rmtree(
        os.path.join(rejects_dir, f"batch_id={batch_id}"), ignore_errors=True
    )


def dead_letter(
    rejected: DataFrame, rejects_dir: str, batch_id: int, call: str
) -> None:
    """Per-micro-batch dead-letter write: rejects land under
    ``<rejects_dir>/batch_id=N/call=<add|update>``; ``batch_id`` and
    ``call`` surface as partition columns on read. Idempotency under
    foreachBatch's at-least-once retry is owned by
    :func:`clear_dead_letter_batch`, which the sink calls FIRST each
    attempt (r11 ADVICE — the old per-call overwrite left stale rows
    when a retry's reject set shrank to empty or reclassified); the
    overwrite here still self-replaces within one attempt."""
    if rejected.limit(1).count():
        rejected.write.mode("overwrite").parquet(
            os.path.join(rejects_dir, f"batch_id={batch_id}", f"call={call}")
        )


def run_chunk_upsert_stream_into_db(
    spark: SparkSession,
    src_dir: str,
    db,
    checkpoint_dir: str,
    timeout_sec: int = 300,
) -> DataFrame:
    """Drain chunk JSON files from ``src_dir`` into a :class:`VectorDB`
    via foreachBatch keyed upserts: per micro-batch, ids new to the
    table go through ``db.add`` (FK validation, duplicate rejection,
    batch embed) and existing ids through ``db.update`` (partial merge,
    re-embed on content change). Every committed batch bumps the
    table version, so the build-once IVF index (api.VectorDB._ivf_index)
    invalidates and the NEXT search rebuilds over the streamed state —
    index maintenance rides the version pointer, once per batch, never
    per record (the reference rebuilds per insert,
    /root/reference/src/models/collection.py:97-99). Returns the final
    chunks table.

    Rows the store rejects (missing parent document — add()/update()
    return them tagged since the r9 FK fix) are never silently lost:
    each batch's rejects land under
    ``<checkpoint_dir>/_rejects/batch_id=N`` — the dead-letter path of
    a production ingest. The sink is IDEMPOTENT per micro-batch:
    foreachBatch offers at-least-once side-effect semantics, so a
    retried batch re-runs with the SAME batch_id; each attempt CLEARS
    the whole ``batch_id=N`` partition before writing (r11 ADVICE —
    per-call overwrite alone left the first attempt's rows behind
    whenever a retry's reject set shrank to empty or reclassified
    add→update after a partial commit), then writes per-CALL
    subdirectories, so the partition always holds exactly the LAST
    attempt's rejects.
    """
    rejects_dir = os.path.join(checkpoint_dir, "_rejects")
    stream = (
        spark.readStream.schema(CHUNK_SCHEMA)
        .option("maxFilesPerTrigger", "64")
        .json(src_dir)
    )

    def upsert_batch(batch: DataFrame, batch_id: int) -> None:
        # idempotency first (r11 ADVICE): a RETRY of this batch_id must
        # end up with exactly this attempt's rejects — including the
        # case where the retry rejects NOTHING because the first
        # attempt partially committed before dying
        clear_dead_letter_batch(rejects_dir, batch_id)
        batch = batch.dropDuplicates(["id"])
        existing = db.table("chunks").select("id")
        new_rows = batch.join(existing, "id", "left_anti")
        upd_rows = batch.join(existing, "id", "left_semi")
        if new_rows.limit(1).count():
            dead_letter(db.add("chunks", new_rows), rejects_dir, batch_id, "add")
        if upd_rows.limit(1).count():
            dead_letter(
                db.update("chunks", upd_rows), rejects_dir, batch_id, "update"
            )

    q = (
        stream.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError("chunk upsert stream did not drain in time")
    return db.table("chunks")
