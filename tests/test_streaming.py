"""Streaming correctness: every streaming operator must agree with its
batch twin on the same (fully-available) input — the availableNow
trigger makes that an exact, deterministic comparison."""

from __future__ import annotations

import json
import uuid

import pytest
from pyspark.sql import functions as F

from local_vectordb_spark import streaming as st
from local_vectordb_spark.operators import events as ev
from local_vectordb_spark.session import load_table


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Stage sf0.001 events as a 4-file parquet dir (micro timestamps)
    so the file source replays them as real micro-batches."""
    out = tmp_path_factory.mktemp("events_stream")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(str(out / "events"))
    return str(out / "events")


def _rows(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_stream_tumbling_matches_batch(spark, sf_dir, events_dir):
    stream = st.read_events_stream(spark, events_dir)
    got = st.run_available_now(
        st.watermarked_tumbling(stream), "t_tumble", output_mode="complete"
    )
    want = ev.tumbling(load_table(spark, sf_dir, "events"))
    keys = ("window_start", "event_type", "n_events", "sum_value")
    assert _rows(got, *keys) == _rows(want, *keys)


def test_stream_sessionize_matches_batch(spark, sf_dir, events_dir):
    stream = st.read_events_stream(spark, events_dir)
    got = st.run_available_now(
        st.watermarked_sessionize(stream), "t_sess", output_mode="complete"
    )
    want = ev.sessionize(load_table(spark, sf_dir, "events"))
    keys = ("user_id", "session_start", "n_events", "sum_value")
    assert _rows(got, *keys) == _rows(want, *keys)


def test_stream_sliding_matches_batch(spark, sf_dir, events_dir):
    stream = st.read_events_stream(spark, events_dir)
    got = st.run_available_now(
        st.watermarked_sliding(stream), "t_slide", output_mode="complete"
    )
    want = ev.sliding(load_table(spark, sf_dir, "events"))
    keys = ("window_start", "n_events", "sum_value")
    assert _rows(got, *keys) == _rows(want, *keys)


def test_watermark_drops_too_late_keeps_within_horizon(spark, tmp_path):
    """Late-data semantics (r2 verdict #5): with a 1h watermark, an
    event arriving after its window is finalized is DROPPED, while a
    late event whose window is still within the watermark horizon is
    KEPT. Driven as 4 sequential drains over a shared checkpoint (one
    new file per drain), so the watermark provably advances from each
    drain's max event time before the next file arrives."""
    import pandas as pd

    src = tmp_path / "late_events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def write_batch(seq, times):
        pdf = pd.DataFrame(
            {
                "event_id": [seq * 100 + i for i in range(len(times))],
                # micro-second precision: Spark's TimestampType rejects
                # pandas' default nanosecond INT64 parquet encoding
                "ts": pd.Series(
                    [pd.Timestamp(f"2025-01-01 {t}") for t in times]
                ).astype("datetime64[us]"),
                "user_id": [1] * len(times),
                "event_type": ["click"] * len(times),
                "value": [1.0] * len(times),
                "props": ["{}"] * len(times),
            }
        )
        pdf.to_parquet(src / f"batch_{seq:03d}.parquet", index=False)

    def drain():
        """One availableNow pass resuming from the shared checkpoint;
        finalized (append-mode) windows accumulate in the parquet sink
        (the memory sink cannot recover from a checkpoint)."""
        stream = st.read_events_stream(spark, str(src))
        q = (
            st.watermarked_tumbling(stream, watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    write_batch(0, ["10:15:00"])  # on-time: window 10:00
    drain()
    write_batch(1, ["14:00:00"])  # advances watermark to 13:00
    drain()
    # 10:30 window(10:00) end 11:00 < wm 13:00 -> DROPPED
    # 13:30 window(13:00) end 14:00 > wm 13:00 -> KEPT
    write_batch(2, ["10:30:00", "13:30:00"])
    drain()
    write_batch(3, ["17:00:00"])  # wm -> 16:00, finalizes 13:00+14:00
    drain()

    emitted = spark.read.parquet(sink).collect()
    got = {r.window_start.strftime("%H:%M"): r.n_events for r in emitted}
    assert got.get("10:00") == 1  # late 10:30 arrival dropped
    assert got.get("13:00") == 1  # late 13:30 within horizon kept
    assert got.get("14:00") == 1
    assert "17:00" not in got  # still open at end of last drain


def test_stream_dedup_removes_replayed_files(spark, events_dir, tmp_path):
    # replay the same events twice (two copies of every file)
    dup_dir = tmp_path / "dup"
    base = spark.read.parquet(events_dir)
    base.write.mode("overwrite").parquet(str(dup_dir))
    base.write.mode("append").parquet(str(dup_dir))
    stream = st.read_events_stream(spark, str(dup_dir), max_files_per_trigger=64)
    got = st.run_available_now(st.stream_dedup(stream), "t_dedup")
    assert got.count() == base.count()
    assert got.select("event_id").distinct().count() == got.count()


def test_running_user_totals_across_batches(spark, sf_dir, events_dir):
    # force >=2 micro-batches so totals must survive in state
    stream = st.read_events_stream(spark, events_dir, max_files_per_trigger=2)
    emitted = st.run_available_now(
        st.running_user_totals(stream), "t_state", output_mode="update"
    )
    from pyspark.sql import functions as F

    final = emitted.groupBy("user_id").agg(F.max("n_events").alias("n_events"))
    want = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    assert _rows(final, "user_id", "n_events") == _rows(want, "user_id", "n_events")


def _write_chunk(dirpath, cid, content, doc_id):
    rec = {
        "id": cid,
        "content": content,
        "embedding": [0.1, 0.2],
        "document_id": doc_id,
        "metadata": {},
        "created_at": "2025-10-31 00:00:00",
        "updated_at": "2025-10-31 00:00:00",
    }
    (dirpath / f"{uuid.uuid4()}.json").write_text(json.dumps(rec))


def test_chunk_upsert_stream_two_drains(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    table = str(tmp_path / "chunks.parquet")
    ckpt = str(tmp_path / "ckpt")
    ids = [str(uuid.uuid4()) for _ in range(3)]
    doc = str(uuid.uuid4())
    for i, cid in enumerate(ids):
        _write_chunk(src, cid, f"v1 chunk {i}", doc)
    t1 = st.run_chunk_upsert_stream(spark, str(src), table, ckpt)
    assert t1.count() == 3

    # second drain: one update (same id) + one brand-new chunk,
    # resuming from the checkpoint so old files are not reprocessed
    _write_chunk(src, ids[0], "v2 chunk 0", doc)
    new_id = str(uuid.uuid4())
    _write_chunk(src, new_id, "v1 chunk 3", doc)
    t2 = st.run_chunk_upsert_stream(spark, str(src), table, ckpt)
    assert t2.count() == 4
    assert t2.filter(f"id = '{ids[0]}'").collect()[0].content == "v2 chunk 0"


def test_stream_upserts_invalidate_and_rebuild_ivf(spark, sf_dir, tmp_path):
    """foreachBatch upserts through the VectorDB must bump the table
    version (invalidating the build-once IVF cache), and the
    post-stream search must rebuild and rank the streamed content."""
    import json

    from local_vectordb_spark.api import VectorDB
    from local_vectordb_spark.streaming.ingest import (
        run_chunk_upsert_stream_into_db,
    )

    db = VectorDB(spark, str(tmp_path / "db"))
    ts = "2025-01-01 00:00:00"
    db.add(
        "libraries",
        spark.createDataFrame(
            [("lib1", ts, ts, "corpus")],
            "id string, created_at string, updated_at string, name string",
        ).select(
            "id",
            F.create_map().cast("map<string,string>").alias("metadata"),
            F.col("created_at").cast("timestamp").alias("created_at"),
            F.col("updated_at").cast("timestamp").alias("updated_at"),
            "name",
        ),
    )
    rows = [(f"d{i}", f"doc {i}") for i in range(20)]
    db.add(
        "documents",
        spark.createDataFrame(rows, "id string, name string").select(
            "id",
            F.create_map().cast("map<string,string>").alias("metadata"),
            F.lit(ts).cast("timestamp").alias("created_at"),
            F.lit(ts).cast("timestamp").alias("updated_at"),
            "name",
            F.lit("lib1").alias("library_id"),
        ),
    )
    db.add(
        "chunks",
        spark.createDataFrame(
            [(f"c{i}", f"baseline content number {i}", f"d{i}") for i in range(20)],
            "id string, content string, document_id string",
        ).select(
            "id",
            F.create_map().cast("map<string,string>").alias("metadata"),
            F.lit(ts).cast("timestamp").alias("created_at"),
            F.lit(ts).cast("timestamp").alias("updated_at"),
            "content",
            F.lit(None).cast("array<float>").alias("embedding"),
            "document_id",
        ),
    )
    db.search(query="warm the index", index_type="ivf", k=1).collect()
    # the cache is keyed on the ON-DISK chunks version (r9 ADVICE —
    # cross-instance writes must invalidate it too)
    v_before = db._current_version("chunks")
    assert db._ivf_version == v_before  # index is current pre-stream

    src = tmp_path / "incoming"
    src.mkdir()
    special = "a completely unmistakable streamed sentence about zebras"
    for i in range(5):
        rec = {
            "id": f"s{i}",
            "metadata": {},
            "created_at": ts,
            "updated_at": ts,
            "content": special if i == 3 else f"streamed filler {i}",
            "embedding": None,
            "document_id": f"d{i}",
        }
        (src / f"s{i}.json").write_text(json.dumps(rec))
    run_chunk_upsert_stream_into_db(spark, str(src), db, str(tmp_path / "ckpt"))

    v_now = db._current_version("chunks")
    assert v_now > v_before            # stream committed new versions
    assert db._ivf_version < v_now     # cache is stale -> will rebuild
    hits = db.search(query=special, index_type="ivf", k=3).collect()
    assert db._ivf_version == db._current_version("chunks")  # rebuilt
    assert hits[0].id == "s3"              # streamed chunk is the top hit
    assert db.table("chunks").count() == 25


def test_stream_dedup_fingerprint_collapses_doctored_copies(spark, sf_dir):
    """The semantic-key ingest dedup: byte-different near-copies
    (whitespace-doubled and padded — the doctoring is deliberately
    whitespace-only for charset independence) must collapse to one doc
    per content family, leaving exactly the undoctored corpus's
    per-lang count of DISTINCT normalized fingerprints (== count(*)
    unless the fixture naturally contains identical normalized texts
    within a lang, which the expectation must tolerate)."""
    from local_vectordb_spark.functions import text as T
    from local_vectordb_spark.queries_streaming import stream_dedup_fingerprint
    from local_vectordb_spark.session import load_table
    from pyspark.sql import functions as F

    got = {
        r["lang"]: r["n_docs"]
        for r in stream_dedup_fingerprint(spark, sf_dir).collect()
    }
    want = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.countDistinct(T.fingerprint(F.col("text"))).alias("n"))
        .collect()
    }
    assert got == want


def test_stream_strip_boilerplate_matches_batch(spark, sf_dir):
    """The stream-static strip must equal the batch form: per-lang
    kept-line totals from the streaming anti-join (several
    micro-batches via maxFilesPerTrigger) == the batch
    strip_boilerplate aggregation over the same staged corpus."""
    from local_vectordb_spark.operators import dedup
    from local_vectordb_spark.queries import SPARK_QUERIES, _docs_multiline

    got = {
        r.lang: (r.n_lines_kept, r.n_docs)
        for r in SPARK_QUERIES["stream_strip_boilerplate"](spark, sf_dir).collect()
    }
    staged = _docs_multiline(spark, sf_dir)
    batch = dedup.strip_boilerplate(staged, min_docs=3, min_chars=6)
    want = {
        r.lang: (r.n_lines, r.n_docs)
        for r in batch.join(staged.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_kept").cast("bigint").alias("n_lines"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .collect()
    }
    assert got == want


def test_stream_stream_attribution_matches_batch_range_join(spark, sf_dir):
    """The watermarked stream-stream join must emit exactly the batch
    range-join's (purchase, view-within-30min) pairs — per-purchase
    counts compared as whole dicts."""
    from local_vectordb_spark.queries import SPARK_QUERIES
    from local_vectordb_spark.session import load_table

    got = {
        r.purchase_id: r.n_views_30m
        for r in SPARK_QUERIES["stream_view_purchase_attribution"](
            spark, sf_dir
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    )
    want = {
        r.purchase_id: r.n
        for r in p.join(
            v,
            F.expr(
                "v_user = p_user AND view_ts >= p_ts - INTERVAL 30 MINUTES"
                " AND view_ts <= p_ts"
            ),
        )
        .groupBy("purchase_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want and got


def test_ordered_replay_staging_is_event_time_ordered(spark, sf_dir):
    """`_staged_events_ordered` invariants that make the minutes-scale
    watermark sound: walking files in mtime order walks event time —
    mtimes strictly increase with part number, and each file's min ts
    is >= the previous file's max ts (range partitioning), so the
    replay has zero cross-batch late data."""
    import os

    import pyarrow.parquet as pq

    from local_vectordb_spark.queries_streaming import _staged_events_ordered

    path = _staged_events_ordered(spark, sf_dir)
    parts = sorted(f for f in os.listdir(path) if f.startswith("part-"))
    assert len(parts) >= 4
    mtimes = [os.stat(os.path.join(path, f)).st_mtime for f in parts]
    assert all(a < b for a, b in zip(mtimes, mtimes[1:]))
    prev_max = None
    for f in parts:
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        col = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "ts"
        )
        mins = [md.row_group(g).column(col).statistics.min for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(col).statistics.max for g in range(md.num_row_groups)]
        if prev_max is not None:
            assert min(mins) >= prev_max
        prev_max = max(maxs)


def test_stream_stream_attribution_state_bounded(spark, sf_dir):
    """The bounded-state claim, MEASURED (r8 verdict #2): draining the
    ordered replay with the 10-minute watermark must (a) run several
    micro-batches, (b) actually EVICT join state as the watermark
    advances, and (c) never hold state anywhere near corpus size —
    the live horizon is watermark + the 30-minute range predicate, so
    buffered rows track the clock, not the drain length."""
    from local_vectordb_spark.queries_streaming import _view_purchase_joined

    prog: list = []
    out = st.run_available_now(
        _view_purchase_joined(spark, sf_dir),
        f"t_attr_state_{uuid.uuid4().hex[:8]}",
        output_mode="append",
        shuffle_partitions=4,
        progress_sink=prog,
    )
    assert out.count() > 0
    batches = [p for p in prog if p.get("stateOperators")]
    assert len([p for p in batches if p["numInputRows"] > 0]) >= 4
    totals = [
        sum(op["numRowsTotal"] for op in p["stateOperators"]) for p in batches
    ]
    removed = sum(
        op.get("numRowsRemoved", 0) for p in batches for op in p["stateOperators"]
    )
    assert removed > 0, "watermark never evicted any join state"
    ev_df = load_table(spark, sf_dir, "events")
    n_side = ev_df.filter(F.col("event_type").isin("view", "purchase")).count()
    # peak state must be far below the corpus the old 35-day horizon
    # would have buffered (both sides combined)
    assert max(totals) < 0.5 * n_side, (max(totals), n_side)


def test_stream_strip_boilerplate_holds_zero_state(spark, sf_dir):
    """r9 verdict #8: the stream-static anti-join's 'stateless per
    micro-batch' claim, MEASURED — the drain must run several
    micro-batches and report NO state-store rows in any of them (a
    stream-static join buffers nothing; only watermarked stateful
    operators would)."""
    from local_vectordb_spark.queries_streaming import _stripped_lines_stream

    prog: list = []
    out = st.run_available_now(
        _stripped_lines_stream(spark, sf_dir),
        f"t_strip_state_{uuid.uuid4().hex[:8]}",
        output_mode="append",
        progress_sink=prog,
    )
    assert out.count() > 0
    fed = [p for p in prog if p.get("numInputRows", 0) > 0]
    assert len(fed) >= 2, "expected several micro-batches"
    state_rows = sum(
        op.get("numRowsTotal", 0)
        for p in prog
        for op in p.get("stateOperators") or []
    )
    assert state_rows == 0, f"stream-static join held state: {state_rows} rows"


@pytest.mark.parametrize(
    "builder,name",
    [
        (lambda s: st.watermarked_tumbling(s), "tumble"),
        (lambda s: st.watermarked_sliding(s), "slide"),
        (lambda s: st.watermarked_sessionize(s), "sess"),
    ],
)
def test_windowed_agg_state_bounded_by_groups(spark, sf_dir, builder, name):
    """r9 verdict #8: every windowed-agg stream's state must be bounded
    by the number of LIVE GROUPS (windows x keys / sessions), never by
    the corpus — per-trigger numRowsTotal <= the final group count and
    far below the input row count, asserted across all micro-batches."""
    from local_vectordb_spark.queries_streaming import _staged_events_ordered

    stream = st.read_events_stream(
        spark, _staged_events_ordered(spark, sf_dir), max_files_per_trigger=2
    )
    prog: list = []
    out = st.run_available_now(
        builder(stream),
        f"t_wstate_{name}_{uuid.uuid4().hex[:8]}",
        output_mode="complete",
        shuffle_partitions=8,
        progress_sink=prog,
    )
    n_groups = out.count()
    assert n_groups > 0
    batches = [p for p in prog if p.get("stateOperators")]
    assert len([p for p in batches if p["numInputRows"] > 0]) >= 2
    totals = [
        sum(op["numRowsTotal"] for op in p["stateOperators"]) for p in batches
    ]
    # State tracks GROUPS (plus transient not-yet-merged session rows),
    # never the event corpus. At sf0.001 the fixture is degenerate
    # (~1 event per hour-window group, so groups ~ corpus); the bound
    # that matters — and the one that holds at every scale — is
    # state <= O(groups): 10x the events would add rows per group, not
    # state rows.
    assert max(totals) <= 2 * n_groups, (max(totals), n_groups)


def test_stream_dedup_state_evicts_with_watermark(spark, sf_dir):
    """Completes r9 verdict #8 for the last stateful family: the
    ingest-dedup state store must EVICT keys as the watermark advances
    over the event-time-ordered replay (dropDuplicatesWithinWatermark
    holds one row per key inside the horizon, never the whole feed) —
    numRowsRemoved > 0 across the drain and peak state far below the
    corpus key count."""
    from local_vectordb_spark.queries_streaming import _staged_events_ordered

    stream = st.read_events_stream(
        spark, _staged_events_ordered(spark, sf_dir), max_files_per_trigger=1
    )
    deduped = st.stream_dedup(stream, keys=("event_id",), watermark="10 minutes")
    prog: list = []
    out = st.run_available_now(
        deduped,
        f"t_dedupstate_{uuid.uuid4().hex[:8]}",
        output_mode="append",
        shuffle_partitions=4,
        progress_sink=prog,
    )
    n_keys = out.count()
    batches = [p for p in prog if p.get("stateOperators")]
    assert len([p for p in batches if p["numInputRows"] > 0]) >= 4
    removed = sum(
        op.get("numRowsRemoved", 0) for p in batches for op in p["stateOperators"]
    )
    assert removed > 0, "watermark never evicted any dedup state"
    totals = [
        sum(op["numRowsTotal"] for op in p["stateOperators"]) for p in batches
    ]
    assert max(totals) < 0.5 * n_keys, (max(totals), n_keys)


def test_chunk_upsert_stream_dead_letters_fk_rejects(spark, tmp_path):
    """A streamed chunk naming a missing parent document must land in
    the checkpoint's _rejects dead-letter table (tagged with reason and
    batch id), not in the chunks table and not silently nowhere."""
    import os

    from local_vectordb_spark.api import VectorDB
    from local_vectordb_spark.sources.json_records import SCHEMAS
    from local_vectordb_spark.streaming.ingest import (
        run_chunk_upsert_stream_into_db,
    )

    db = VectorDB(spark, str(tmp_path / "db"))
    ts = "2025-01-01 00:00:00"
    db.add(
        "libraries",
        spark.createDataFrame(
            [("lib1", {}, None, None, "corpus")], SCHEMAS["libraries"]
        ).select(
            "id",
            F.create_map().cast("map<string,string>").alias("metadata"),
            F.lit(ts).cast("timestamp").alias("created_at"),
            F.lit(ts).cast("timestamp").alias("updated_at"),
            "name",
        ),
    )
    db.add(
        "documents",
        spark.createDataFrame(
            [("d1", {}, None, None, "doc", "lib1")], SCHEMAS["documents"]
        ).select(
            "id",
            F.create_map().cast("map<string,string>").alias("metadata"),
            F.lit(ts).cast("timestamp").alias("created_at"),
            F.lit(ts).cast("timestamp").alias("updated_at"),
            "name",
            "library_id",
        ),
    )
    src = tmp_path / "incoming"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    for cid, doc in (("good", "d1"), ("orphan", "d-missing")):
        rec = {
            "id": cid,
            "metadata": {},
            "created_at": ts,
            "updated_at": ts,
            "content": f"content of {cid}",
            "embedding": None,
            "document_id": doc,
        }
        (src / f"{cid}.json").write_text(json.dumps(rec))
    table = run_chunk_upsert_stream_into_db(spark, str(src), db, ckpt)
    assert {r.id for r in table.select("id").collect()} == {"good"}
    rejects = spark.read.parquet(os.path.join(ckpt, "_rejects")).collect()
    assert [(r.id, r.reject_reason) for r in rejects] == [
        ("orphan", "missing_parent")
    ]


def test_dead_letter_sink_is_idempotent_per_batch(spark, tmp_path):
    """foreachBatch side effects are at-least-once: a RETRIED
    micro-batch re-runs the dead-letter write with the same batch_id.
    The sink overwrites that batch's own partition, so the retry
    replaces the first attempt's rows instead of appending duplicates
    (r10 ADVICE); a different batch_id lands beside it untouched."""
    import os

    from local_vectordb_spark.streaming.ingest import dead_letter

    rejects_dir = str(tmp_path / "_rejects")
    rejected = spark.createDataFrame(
        [("orphan", "missing_parent")], "id string, reject_reason string"
    )
    dead_letter(rejected, rejects_dir, batch_id=3, call="add")
    dead_letter(rejected, rejects_dir, batch_id=3, call="add")  # retry
    dead_letter(
        spark.createDataFrame(
            [("orphan2", "missing_parent")], "id string, reject_reason string"
        ),
        rejects_dir,
        batch_id=4,
        call="add",
    )
    rows = spark.read.parquet(rejects_dir).collect()
    assert sorted((r.id, int(r.batch_id)) for r in rows) == [
        ("orphan", 3),
        ("orphan2", 4),
    ]
    # empty reject sets write nothing — no zero-row partition litter
    dead_letter(rejected.limit(0), rejects_dir, batch_id=5, call="add")
    assert not os.path.isdir(os.path.join(rejects_dir, "batch_id=5"))


def test_dead_letter_retry_clears_stale_attempt(spark, tmp_path):
    """r11 ADVICE: per-call overwrite alone is NOT idempotent when a
    retry's reject set changes shape — a retry that rejects nothing
    (first attempt partially committed) or reclassifies add→update
    never rewrites the stale subdirectory. The sink clears the whole
    batch_id partition at the start of each attempt, so the partition
    always reflects exactly the LAST attempt."""
    import os

    from local_vectordb_spark.streaming.ingest import (
        clear_dead_letter_batch,
        dead_letter,
    )

    rejects_dir = str(tmp_path / "_rejects")
    rejected = spark.createDataFrame(
        [("orphan", "missing_parent")], "id string, reject_reason string"
    )
    # attempt 1 of batch 7 rejects a row under call=add; batch 8's
    # rows must survive batch 7's retry untouched
    clear_dead_letter_batch(rejects_dir, 7)
    dead_letter(rejected, rejects_dir, batch_id=7, call="add")
    clear_dead_letter_batch(rejects_dir, 8)
    dead_letter(rejected, rejects_dir, batch_id=8, call="add")

    # retry of batch 7 reclassifies: the row now rejects under
    # call=update — the stale call=add rows must NOT linger beside it
    clear_dead_letter_batch(rejects_dir, 7)
    dead_letter(rejected, rejects_dir, batch_id=7, call="update")
    rows = spark.read.parquet(rejects_dir).collect()
    assert sorted((r.id, int(r.batch_id), r.call) for r in rows) == [
        ("orphan", 7, "update"),
        ("orphan", 8, "add"),
    ]

    # second retry rejects NOTHING (the partial-commit case): the
    # partition must end empty, not frozen at the previous attempt
    clear_dead_letter_batch(rejects_dir, 7)
    dead_letter(rejected.limit(0), rejects_dir, batch_id=7, call="add")
    assert not os.path.isdir(os.path.join(rejects_dir, "batch_id=7"))
    rows = spark.read.parquet(rejects_dir).collect()
    assert [(r.id, int(r.batch_id)) for r in rows] == [("orphan", 8)]


def test_cdf_mirror_stream_drains_paginated_feed(spark, tmp_path):
    """r14 verdict #7: the streaming CDF consumer — a foreachBatch
    loop polling GET /{kind}/_changes over HTTP with X-More-Changes
    pagination into a maintained parquet mirror. Exercises the whole
    continuation contract end to end: bootstrap via the paginated
    LIST route (the initial bulk load records no delta by design),
    a 6-change feed drained at limit=2 (three pages + probe, every
    continuation page pinned to the first page's X-Table-Version),
    apply via the broadcast anti-join + union operator, and the
    mirror must equal the live table EXACTLY — full rows, timestamps
    included, a net remove and an in-range re-update represented.
    A third tick with nothing committed must no-op (cursor is the
    idempotency point), and the clock is checkpointed so each
    availableNow drain resumes instead of replaying old ticks."""
    import json as _json
    import threading

    from local_vectordb_spark.api import VectorDB
    from local_vectordb_spark.serving import make_server
    from local_vectordb_spark.streaming.cdf import (
        mirror_cursor,
        read_mirror,
        run_cdf_mirror_stream,
    )

    db = VectorDB(spark, str(tmp_path / "cdf_db"), keep_versions=8)
    srv = make_server(db)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    def req(method, path, body=None):
        import urllib.request
        data = None if body is None else _json.dumps(body).encode()
        r = urllib.request.Request(base + path, data=data, method=method)
        r.add_header("Content-Type", "application/json")
        with urllib.request.urlopen(r) as resp:
            raw = resp.read()
            return _json.loads(raw) if raw else None

    lib = req("POST", "/libraries", {"name": "m"})
    doc = req("POST", "/documents", {"name": "d", "library_id": lib["id"]})
    a = req("POST", "/chunks", {"content": "base row a",
                                "document_id": doc["id"]})

    clock_dir, ckpt = str(tmp_path / "clock"), str(tmp_path / "ckpt")
    mirror_dir = str(tmp_path / "mirror")
    import os
    os.makedirs(clock_dir)

    def tick(n):
        with open(os.path.join(clock_dir, f"t{n}.json"), "w") as f:
            f.write(_json.dumps({"tick": n}))

    def drain(sink):
        clock = (
            spark.readStream.schema("tick LONG")
            .option("maxFilesPerTrigger", "1").json(clock_dir)
        )
        run_cdf_mirror_stream(
            spark, base, "chunks", mirror_dir, clock, ckpt,
            limit=2, progress_sink=sink,
        )
        return sink

    # tick 1: bootstrap from the paginated list route (no delta for
    # the initial load exists — the feed path alone cannot start)
    tick(1)
    s1 = drain([])
    assert [r["action"] for r in s1] == ["bootstrapped"]
    assert mirror_cursor(mirror_dir) == 0
    assert read_mirror(spark, mirror_dir).count() == 1

    # seven commits: five adds, one content re-update (stays an
    # upsert, final values), one delete of the BASE row (a net
    # 'remove' — an id deleted after being added in-range would net
    # to nothing instead)
    ids = [
        req("POST", "/chunks",
            {"content": f"row {i}", "document_id": doc["id"]})["id"]
        for i in range(5)
    ]
    req("PUT", f"/chunks/{ids[0]}", {"content": "row 0 rewritten"})
    req("DELETE", f"/chunks/{a['id']}")

    # tick 2: one poll drains the 6-change feed in three limit=2
    # pages, all pinned to one generation
    tick(2)
    s2 = drain([])
    assert [r["action"] for r in s2] == ["applied"]
    assert s2[0]["n_changes"] == 6 and s2[0]["since"] == 0
    live_v = db._current_version("chunks")
    assert mirror_cursor(mirror_dir) == live_v == s2[0]["served_version"]

    # the mirror IS the live table — full rows, timestamps included
    mirror = read_mirror(spark, mirror_dir)
    live = db.table("chunks")
    key = sorted(mirror.columns)
    m_rows = sorted(tuple(r[c] for c in key) for r in mirror.collect())
    l_rows = sorted(tuple(r[c] for c in key) for r in live.collect())
    assert m_rows == l_rows and len(m_rows) == 5
    assert not any(r[key.index("id")] == a["id"] for r in m_rows)
    assert any("rewritten" in (r[key.index("content")] or "")
               for r in m_rows)

    # tick 3: nothing committed — the poll must no-op, not rewrite
    tick(3)
    s3 = drain([])
    assert [r["action"] for r in s3] == ["noop"]
    assert mirror_cursor(mirror_dir) == live_v

    # tick 4 (r15 — cost ∝ churn at the FILE level): one more commit,
    # a 1-id feed. The sync must rewrite ONLY that id's hash bucket;
    # every other bucket directory must be HARD-LINKED from the
    # previous generation (st_nlink > 1 — the same file-level reuse
    # the server's incremental index artifacts ride), never rewritten.
    from pyspark.sql import functions as F
    z = req("POST", "/chunks", {"content": "late row",
                                "document_id": doc["id"]})
    z_bucket = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(z["id"])), F.lit(16)).cast("int").alias("b")
    ).collect()[0].b
    tick(4)
    s4 = drain([])
    assert [r["action"] for r in s4] == ["applied"]
    assert s4[0]["n_changes"] == 1 and s4[0]["touched_buckets"] == 1
    gen_dir = os.path.join(mirror_dir, f"data_v{mirror_cursor(mirror_dir)}")
    buckets = [n for n in os.listdir(gen_dir) if n.startswith("bucket=")]
    assert f"bucket={z_bucket}" in buckets
    linked = rewritten = 0
    for name in buckets:
        files = [f for f in os.listdir(os.path.join(gen_dir, name))
                 if f.endswith(".parquet")]
        assert files, name
        nlinks = {os.stat(os.path.join(gen_dir, name, f)).st_nlink
                  for f in files}
        if name == f"bucket={z_bucket}":
            assert nlinks == {1}, f"touched bucket not rewritten: {nlinks}"
            rewritten += 1
        else:
            assert min(nlinks) > 1, f"untouched bucket {name} rewritten"
            linked += 1
    assert rewritten == 1 and linked >= 1, (rewritten, linked)
    # and the mirror still equals the live table exactly
    m = sorted(tuple(r[c] for c in key)
               for r in read_mirror(spark, mirror_dir).collect())
    l = sorted(tuple(r[c] for c in key)
               for r in db.table("chunks").collect())
    assert m == l and len(m) == 6
    srv.shutdown()


def test_cdf_mirror_recovers_from_410_by_snapshot_reread(spark, tmp_path):
    """The consumer's 410 path (r15): when retention GC (or a reset)
    breaks the delta chain between the mirror's cursor and the live
    head, the feed is PERMANENTLY unservable from that base — the
    poller must fall back to re-reading the full snapshot through the
    paginated list route and land on a mirror that equals the live
    table, never serve a partial feed. keep_versions=2 and four
    commits past the cursor guarantee the cursor's successor delta is
    GC'd by poll time."""
    import json as _json
    import threading
    import urllib.request

    from local_vectordb_spark.api import VectorDB
    from local_vectordb_spark.serving import make_server
    from local_vectordb_spark.streaming.cdf import (
        mirror_cursor,
        read_mirror,
        sync_mirror_once,
    )

    db = VectorDB(spark, str(tmp_path / "gc_db"), keep_versions=2)
    srv = make_server(db)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    def req(method, path, body=None):
        data = None if body is None else _json.dumps(body).encode()
        r = urllib.request.Request(base + path, data=data, method=method)
        r.add_header("Content-Type", "application/json")
        with urllib.request.urlopen(r) as resp:
            raw = resp.read()
            return _json.loads(raw) if raw else None

    lib = req("POST", "/libraries", {"name": "g"})
    doc = req("POST", "/documents", {"name": "d", "library_id": lib["id"]})
    req("POST", "/chunks", {"content": "row 0", "document_id": doc["id"]})

    mirror_dir = str(tmp_path / "mirror")
    s0 = sync_mirror_once(spark, base, "chunks", mirror_dir, limit=2)
    assert s0["action"] == "bootstrapped"
    cursor0 = mirror_cursor(mirror_dir)

    # four commits: keep_versions=2 retains only the newest two, so
    # the delta for cursor0+1 is GC'd — the feed from cursor0 is gone
    for i in range(1, 5):
        req("POST", "/chunks", {"content": f"row {i}",
                                "document_id": doc["id"]})

    s1 = sync_mirror_once(spark, base, "chunks", mirror_dir, limit=2)
    assert s1["action"] == "bootstrapped"  # 410 -> snapshot re-read
    assert s1["served_version"] > cursor0
    live = db.table("chunks")
    mirror = read_mirror(spark, mirror_dir)
    key = sorted(mirror.columns)
    assert sorted(tuple(r[c] for c in key) for r in mirror.collect()) == \
        sorted(tuple(r[c] for c in key) for r in live.collect())
    assert mirror.count() == 5

    # the mirror is a SERVING read replica: a brute-force cosine kNN
    # over the mirror's embedding column returns exactly what the
    # primary's search path returns — the embedding-cache /
    # feature-store consumer story made concrete
    from pyspark.sql import functions as F

    from local_vectordb_spark.operators.knn import knn_brute_force

    qv = [float(x) for x in live.orderBy("id").first().embedding]
    replica = [
        (r.id, round(r.score, 6))
        for r in knn_brute_force(mirror, qv, k=3, id_col="id").collect()
    ]
    primary = [
        (r.id, round(r.score, 6))
        for r in db.search(query_vec=qv, index_type="cosine", k=3)
        .select("id", "score").collect()
    ]
    assert replica == primary and len(replica) == 3
    srv.shutdown()


def test_cdf_mirror_default_rate_clock_polls_continuously(spark, tmp_path):
    """The production default (r15): clock=None builds a rate-source
    poll clock with a processingTime trigger — the consumer loop runs
    until stopped, each micro-batch one poll. Drive it for real: start
    against a live server, wait for the bootstrap poll to land in the
    progress sink, then stop and check the mirror."""
    import json as _json
    import threading
    import time as _time
    import urllib.request

    from local_vectordb_spark.api import VectorDB
    from local_vectordb_spark.serving import make_server
    from local_vectordb_spark.streaming.cdf import (
        read_mirror,
        run_cdf_mirror_stream,
    )

    db = VectorDB(spark, str(tmp_path / "rate_db"))
    srv = make_server(db)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"

    def req(method, path, body=None):
        data = None if body is None else _json.dumps(body).encode()
        r = urllib.request.Request(base + path, data=data, method=method)
        r.add_header("Content-Type", "application/json")
        with urllib.request.urlopen(r) as resp:
            raw = resp.read()
            return _json.loads(raw) if raw else None

    lib = req("POST", "/libraries", {"name": "rc"})
    doc = req("POST", "/documents", {"name": "d", "library_id": lib["id"]})
    req("POST", "/chunks", {"content": "tick tock", "document_id": doc["id"]})

    sink: list = []
    q = run_cdf_mirror_stream(
        spark, base, "chunks", str(tmp_path / "mirror"), None,
        str(tmp_path / "ckpt"), available_now=False, poll_interval_sec=1,
        progress_sink=sink,
    )
    try:
        deadline = _time.time() + 120
        while not sink and _time.time() < deadline:
            _time.sleep(0.5)
        assert sink, "rate-clocked consumer never polled"
        assert sink[0]["action"] == "bootstrapped"
    finally:
        q.stop()
    assert read_mirror(spark, str(tmp_path / "mirror")).count() == 1
    srv.shutdown()


def test_cdf_mirror_survives_server_reset(spark, tmp_path):
    """Timeline breaks are survived, not crashed on (r15). Two cases:
    (1) a REAL reset — the server truncates to a fresh EMPTY
    generation with no delta record, so the old cursor's feed answers
    410 and the consumer re-bootstraps onto the (empty) new timeline
    through the snapshot path; (2) a RECREATED table — the store is
    rebuilt from scratch so the live head sits BEHIND the old cursor
    (never-written: -1), the feed answers 404, and the consumer wipes
    the dead-timeline mirror (action 'reset') instead of serving
    pre-reset rows forever, then re-bootstraps once data exists."""
    import json as _json
    import threading
    import urllib.request

    from local_vectordb_spark.api import VectorDB
    from local_vectordb_spark.serving import make_server
    from local_vectordb_spark.streaming.cdf import (
        mirror_cursor,
        read_mirror,
        sync_mirror_once,
    )

    def start_server(root):
        db = VectorDB(spark, root)
        srv = make_server(db)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return db, srv, f"http://127.0.0.1:{srv.server_address[1]}"

    def req(base, method, path, body=None):
        data = None if body is None else _json.dumps(body).encode()
        r = urllib.request.Request(base + path, data=data, method=method)
        r.add_header("Content-Type", "application/json")
        with urllib.request.urlopen(r) as resp:
            raw = resp.read()
            return _json.loads(raw) if raw else None

    def seed(base, n=1):
        lib = req(base, "POST", "/libraries", {"name": "s"})
        doc = req(base, "POST", "/documents",
                  {"name": "d", "library_id": lib["id"]})
        for i in range(n):
            req(base, "POST", "/chunks", {"content": f"row {i}",
                                          "document_id": doc["id"]})

    db1, srv1, base1 = start_server(str(tmp_path / "db1"))
    seed(base1)
    mirror_dir = str(tmp_path / "mirror")
    s0 = sync_mirror_once(spark, base1, "chunks", mirror_dir)
    assert s0["action"] == "bootstrapped"
    assert read_mirror(spark, mirror_dir).count() == 1

    # case 1 — real reset: empty new generation, broken chain -> 410
    # -> the consumer re-bootstraps onto the EMPTY new timeline
    req(base1, "POST", "/reset")
    s1 = sync_mirror_once(spark, base1, "chunks", mirror_dir)
    assert s1["action"] == "bootstrapped" and s1["served_version"] >= 0
    assert read_mirror(spark, mirror_dir).count() == 0
    cursor = mirror_cursor(mirror_dir)
    assert cursor is not None
    srv1.shutdown()

    # case 2 — recreated store: fresh root, never written, head (-1)
    # BEHIND the cursor -> 404 -> dead timeline, mirror wiped
    db2, srv2, base2 = start_server(str(tmp_path / "db2"))
    s2 = sync_mirror_once(spark, base2, "chunks", mirror_dir)
    assert s2["action"] == "reset" and s2["served_version"] == -1
    assert mirror_cursor(mirror_dir) is None
    import pytest as _pytest
    with _pytest.raises(ValueError):
        read_mirror(spark, mirror_dir)

    # ...and once the recreated table has data, a clean re-bootstrap
    seed(base2, n=2)
    s3 = sync_mirror_once(spark, base2, "chunks", mirror_dir)
    assert s3["action"] == "bootstrapped"
    mirror = read_mirror(spark, mirror_dir)
    key = sorted(mirror.columns)
    assert sorted(tuple(r[c] for c in key) for r in mirror.collect()) == \
        sorted(tuple(r[c] for c in key)
               for r in db2.table("chunks").collect())
    assert mirror.count() == 2
    srv2.shutdown()


def _cdf_server(spark, root):
    import threading

    from local_vectordb_spark.api import VectorDB
    from local_vectordb_spark.serving import make_server

    db = VectorDB(spark, root)
    srv = make_server(db)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return db, srv, f"http://127.0.0.1:{srv.server_address[1]}"


def _cdf_req(base, method, path, body=None):
    import json as _json
    import urllib.request

    data = None if body is None else _json.dumps(body).encode()
    r = urllib.request.Request(base + path, data=data, method=method)
    r.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(r) as resp:
        raw = resp.read()
        return _json.loads(raw) if raw else None


def _cdf_seed(base, n=1, prefix="row"):
    lib = _cdf_req(base, "POST", "/libraries", {"name": "s"})
    doc = _cdf_req(base, "POST", "/documents",
                   {"name": "d", "library_id": lib["id"]})
    return doc["id"], [
        _cdf_req(base, "POST", "/chunks",
                 {"content": f"{prefix} {i}", "document_id": doc["id"]})["id"]
        for i in range(n)
    ]


def _same_rows(a, b):
    key = sorted(a.columns)
    assert sorted(a.columns) == sorted(b.columns)
    return sorted(tuple(r[c] for c in key) for r in a.collect()) == \
        sorted(tuple(r[c] for c in key) for r in b.collect())


def test_cdf_mirror_detects_recreated_store_timeline(spark, tmp_path):
    """r15 ADVICE (medium): version numbers alone cannot reveal a
    RECREATED/RESTORED store. Store B at the same address has MORE
    chunk commits than the consumer's cursor, so table_changes(
    since=cursor) answers 200 with a complete — new-timeline — delta
    chain; without the X-Timeline-Id check the consumer would apply
    B's deltas onto A's base and commit a permanently wrong mirror.
    The id mismatch must be treated exactly like 410: snapshot
    re-bootstrap onto B's timeline, mirror == B's live table."""
    from local_vectordb_spark.streaming.cdf import (
        _mirror_meta,
        mirror_cursor,
        read_mirror,
        sync_mirror_once,
    )

    _, srv1, base1 = _cdf_server(spark, str(tmp_path / "storeA"))
    _cdf_seed(base1, n=1, prefix="A")
    mirror_dir = str(tmp_path / "mirror")
    s0 = sync_mirror_once(spark, base1, "chunks", mirror_dir)
    assert s0["action"] == "bootstrapped"
    assert mirror_cursor(mirror_dir) == 0
    tl_a = _mirror_meta(mirror_dir)["timeline"]
    assert tl_a  # the bootstrap pinned A's timeline id
    srv1.shutdown()

    # same consumer, different store: B's chunk head (v2) is PAST the
    # cursor (0), so the feed is fully servable — the poisoned case
    db2, srv2, base2 = _cdf_server(spark, str(tmp_path / "storeB"))
    _cdf_seed(base2, n=3, prefix="B")
    assert db2._current_version("chunks") == 2
    s1 = sync_mirror_once(spark, base2, "chunks", mirror_dir)
    assert s1["action"] == "bootstrapped"  # NOT 'applied'
    assert _mirror_meta(mirror_dir)["timeline"] != tl_a
    assert _same_rows(read_mirror(spark, mirror_dir), db2.table("chunks"))
    assert read_mirror(spark, mirror_dir).count() == 3

    # and the new pin keeps working incrementally on B's timeline
    doc_b = db2.table("documents").collect()[0].id
    _cdf_req(base2, "POST", "/chunks",
             {"content": "B late", "document_id": doc_b})
    s2 = sync_mirror_once(spark, base2, "chunks", mirror_dir)
    assert s2["action"] == "applied"
    assert _same_rows(read_mirror(spark, mirror_dir), db2.table("chunks"))
    srv2.shutdown()


def test_cdf_mirror_bootstrap_via_snapshot_parquet(spark, tmp_path, monkeypatch):
    """r15 verdict #4: at 100 TB a bootstrap must not page the corpus
    through one socket as JSON. With a ``snapshot_path`` hook the
    consumer reads the pinned generation's parquet DIRECTLY (the HTTP
    read contributes only the version/timeline headers); the JSON
    pager is monkeypatched to fail so taking it would be loud. The
    mirror must equal the live table exactly — timestamps included,
    which the parquet path preserves byte-for-byte — span multiple
    hash buckets, and keep syncing INCREMENTALLY through the feed
    afterwards."""
    import os

    from local_vectordb_spark.streaming import cdf
    from local_vectordb_spark.streaming.cdf import (
        _mirror_meta,
        read_mirror,
        sync_mirror_once,
    )

    root = str(tmp_path / "store")
    db, srv, base = _cdf_server(spark, root)
    doc_id, ids = _cdf_seed(base, n=12)

    def no_pager(*a, **k):
        raise AssertionError(
            "bootstrap took the HTTP JSON pager despite snapshot_path"
        )

    monkeypatch.setattr(cdf, "_snapshot_pages", no_pager)
    mirror_dir = str(tmp_path / "mirror")
    snap_hook = lambda kind, v: os.path.join(root, kind, f"v{v}")  # noqa: E731
    s0 = sync_mirror_once(spark, base, "chunks", mirror_dir,
                          snapshot_path=snap_hook)
    assert s0["action"] == "bootstrapped"
    assert s0["bootstrap_source"] == "snapshot_parquet"
    assert s0["n_changes"] == 12
    assert _mirror_meta(mirror_dir)["timeline"] == db.timeline_id()
    mirror = read_mirror(spark, mirror_dir)
    assert _same_rows(mirror, db.table("chunks"))
    from local_vectordb_spark.streaming.cdf import mirror_cursor

    data_dir = os.path.join(mirror_dir, f"data_v{mirror_cursor(mirror_dir)}")
    n_buckets = len([n for n in os.listdir(data_dir)
                     if n.startswith("bucket=")])
    assert n_buckets > 1  # the layout really is multi-bucket

    # later polls ride the feed (the pager stays patched out — only
    # bootstrap ever needed it)
    _cdf_req(base, "POST", "/chunks",
             {"content": "late row", "document_id": doc_id})
    _cdf_req(base, "DELETE", f"/chunks/{ids[0]}")
    s1 = sync_mirror_once(spark, base, "chunks", mirror_dir,
                          snapshot_path=snap_hook)
    assert s1["action"] == "applied" and s1["n_changes"] == 2
    assert _same_rows(read_mirror(spark, mirror_dir), db.table("chunks"))
    srv.shutdown()


def test_cdf_mirror_empty_store_reports_empty(spark, tmp_path):
    """r15 ADVICE (low): bootstrapping against a never-written table
    creates nothing — no _SINCE, read_mirror still raises — so the
    progress record must say so ('empty', not 'bootstrapped')."""
    from local_vectordb_spark.streaming.cdf import (
        mirror_cursor,
        read_mirror,
        sync_mirror_once,
    )

    _, srv, base = _cdf_server(spark, str(tmp_path / "store"))
    mirror_dir = str(tmp_path / "mirror")
    s0 = sync_mirror_once(spark, base, "chunks", mirror_dir)
    assert s0["action"] == "empty" and s0["served_version"] == -1
    assert mirror_cursor(mirror_dir) is None
    with pytest.raises(ValueError):
        read_mirror(spark, mirror_dir)

    # ...and the first real data flips the same call to a bootstrap
    _cdf_seed(base, n=2)
    s1 = sync_mirror_once(spark, base, "chunks", mirror_dir)
    assert s1["action"] == "bootstrapped" and s1["n_changes"] == 2
    assert read_mirror(spark, mirror_dir).count() == 2
    srv.shutdown()
