"""Round-trip test against a synthetic copy of the reference's on-disk
layout: {data_dir}/{libraries,documents,chunks}/{uuid}.json written
exactly as json.dump(model_dump(), default=str) would
(/root/reference/src/models/collection.py:71-75)."""

from __future__ import annotations

import json
import uuid
from datetime import datetime

import pytest

from local_vectordb_spark import sources

TS = datetime(2025, 10, 31, 12, 34, 56, 789012)


def _write(path, obj):
    path.write_text(json.dumps(obj, default=str))


@pytest.fixture(scope="module")
def ref_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("refdata")
    for kind in ("libraries", "documents", "chunks"):
        (root / kind).mkdir()
    lib_id, doc_id = str(uuid.uuid4()), str(uuid.uuid4())
    base = {"created_at": str(TS), "updated_at": str(TS)}
    _write(
        root / "libraries" / f"{lib_id}.json",
        {"id": lib_id, "name": "lib0", "metadata": {"owner": "t", "rank": 3}, **base},
    )
    _write(
        root / "documents" / f"{doc_id}.json",
        {"id": doc_id, "name": "doc0", "library_id": lib_id, "metadata": {}, **base},
    )
    for i in range(3):
        cid = str(uuid.uuid4())
        _write(
            root / "chunks" / f"{cid}.json",
            {
                "id": cid,
                "content": f"chunk {i}",
                "embedding": [0.1 * i, 0.2, 0.3],
                "document_id": doc_id,
                "metadata": {"n": i},
                **base,
            },
        )
    # one corrupt file, which the reference silently skips
    (root / "chunks" / "broken.json").write_text("{not json")
    return root


def test_read_libraries_types(spark, ref_dir):
    df = sources.read_collection(spark, str(ref_dir), "libraries")
    row = df.collect()[0]
    assert row.name == "lib0"
    # int metadata value arrives as its string form (default=str parity)
    assert row.metadata == {"owner": "t", "rank": "3"}
    assert row.created_at == TS


def test_read_chunks_drops_corrupt(spark, ref_dir):
    df = sources.read_collection(spark, str(ref_dir), "chunks")
    assert df.count() == 3
    kept = sources.read_collection(spark, str(ref_dir), "chunks", keep_corrupt=True)
    assert kept.filter("_corrupt_record IS NOT NULL").count() == 1


def test_chunk_embedding_is_float_array(spark, ref_dir):
    df = sources.read_collection(spark, str(ref_dir), "chunks")
    assert dict(df.dtypes)["embedding"] == "array<float>"
    vec = df.filter("content = 'chunk 1'").collect()[0].embedding
    assert vec == pytest.approx([0.1, 0.2, 0.3])


def test_snapshot_to_parquet(spark, ref_dir, tmp_path):
    counts = sources.snapshot_to_parquet(spark, str(ref_dir), str(tmp_path / "pq"))
    assert counts == {"libraries": 1, "documents": 1, "chunks": 3}
    chunks = spark.read.parquet(str(tmp_path / "pq" / "chunks.parquet"))
    assert chunks.count() == 3


def test_unknown_kind_raises(spark, ref_dir):
    with pytest.raises(ValueError):
        sources.read_collection(spark, str(ref_dir), "nope")
