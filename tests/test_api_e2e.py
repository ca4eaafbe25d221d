"""End-to-end facade test mirroring the reference's e2e flow
(/root/reference/tests/e2e.py: reset -> create library -> one document
+ one chunk per question -> kNN query), with the deterministic hashed
embedder standing in for the Cohere call so no network is needed."""

from __future__ import annotations

import uuid

import pytest

from local_vectordb_spark.api import VectorDB
from local_vectordb_spark.sources.json_records import SCHEMAS

QUESTIONS = [
    "What is the capital of Germany ?",
    "How far is it from Denver to Aspen ?",
    "What county is Modesto , California in ?",
    "Who was Galileo ?",
    "What is an atom ?",
    "When did Hawaii become a state ?",
    "How tall is the Sears Building ?",
    "George Bush purchased a small interest in which baseball team ?",
    "What is Australia 's national flower ?",
    "Why does the moon turn orange ?",
]


@pytest.fixture(scope="module")
def db(spark, tmp_path_factory):
    d = VectorDB(spark, str(tmp_path_factory.mktemp("vdb")))
    d.reset()

    lib_id = str(uuid.uuid4())
    d.add(
        "libraries",
        spark.createDataFrame(
            [(lib_id, {"source": "trec"}, None, None, "questions")],
            SCHEMAS["libraries"],
        ),
    )
    doc_ids = [str(uuid.uuid4()) for _ in QUESTIONS]
    d.add(
        "documents",
        spark.createDataFrame(
            [
                (doc_id, {"row": str(i)}, None, None, f"q{i}", lib_id)
                for i, doc_id in enumerate(doc_ids)
            ],
            SCHEMAS["documents"],
        ),
    )
    chunk_ids = [str(uuid.uuid4()) for _ in QUESTIONS]
    d.add(
        "chunks",
        spark.createDataFrame(
            [
                (cid, {"label": "trec", "row": str(i)}, None, None, q, None, doc_id)
                for i, (cid, q, doc_id) in enumerate(
                    zip(chunk_ids, QUESTIONS, doc_ids)
                )
            ],
            SCHEMAS["chunks"],
        ),
    )
    return d, lib_id, doc_ids, chunk_ids


def test_seed_counts(db):
    d, *_ = db
    assert d.table("libraries").count() == 1
    assert d.table("documents").count() == 10
    assert d.table("chunks").count() == 10


def test_embeddings_filled_on_create(db):
    d, *_ = db
    assert d.table("chunks").filter("embedding IS NULL").count() == 0


@pytest.mark.parametrize("index_type", ["cosine", "ivf", "nsw"])
def test_query_each_strategy_finds_exact_match(db, index_type):
    d, *_ = db
    hits = d.search(QUESTIONS[0], index_type=index_type, k=3).collect()
    assert hits, index_type
    top = max(hits, key=lambda r: r.score)
    assert top.content == QUESTIONS[0]
    assert top.score == pytest.approx(1.0, abs=1e-5)


def test_unknown_index_raises(db):
    d, *_ = db
    with pytest.raises(ValueError):
        d.search("anything", index_type="hnsw")


def test_metadata_filter_restricts_results(db):
    d, *_ = db
    hits = d.search(QUESTIONS[0], k=10, metadata={"row": "4"}).collect()
    assert len(hits) == 1 and hits[0].content == QUESTIONS[4]


def test_duplicate_ids_rejected(db, spark):
    d, _, doc_ids, chunk_ids = db
    rejected = d.add(
        "chunks",
        spark.createDataFrame(
            [(chunk_ids[0], {}, None, None, "dup", None, doc_ids[0])],
            SCHEMAS["chunks"],
        ),
    )
    assert rejected.count() == 1
    assert d.table("chunks").count() == 10


def test_fk_violation_dropped(db, spark):
    d, *_ = db
    d.add(
        "chunks",
        spark.createDataFrame(
            [(str(uuid.uuid4()), {}, None, None, "orphan", None, str(uuid.uuid4()))],
            SCHEMAS["chunks"],
        ),
    )
    assert d.table("chunks").filter("content = 'orphan'").count() == 0


def test_update_reembeds_changed_content(db, spark):
    d, _, _, chunk_ids = db
    cid = chunk_ids[1]
    before = d.get("chunks", cid).collect()[0]
    d.update(
        "chunks",
        spark.createDataFrame(
            [(cid, None, None, None, "completely new content", None, None)],
            SCHEMAS["chunks"],
        ),
    )
    after = d.get("chunks", cid).collect()[0]
    assert after.content == "completely new content"
    assert list(after.embedding) != list(before.embedding)
    assert after.created_at == before.created_at
    assert after.updated_at >= before.updated_at
    # non-null fields preserved from base
    assert after.document_id == before.document_id


def test_cascade_delete_library_removes_all(db, spark):
    d, lib_id, *_ = db
    d.delete("libraries", spark.createDataFrame([(lib_id,)], "id string"))
    assert d.table("libraries").count() == 0
    assert d.table("documents").count() == 0
    assert d.table("chunks").count() == 0


def test_ivf_cache_not_poisoned_by_metadata_filter(db, spark):
    """ADVICE r1: a first ivf search WITH a metadata filter must not
    restrict later unfiltered ivf searches (index is built from the
    unfiltered table; the filter applies to candidates only).

    Seeds its own corpus — the cascade-delete test above empties the
    module-scoped store."""
    d, _, _, _ = db
    lib_id = str(uuid.uuid4())
    d.add(
        "libraries",
        spark.createDataFrame(
            [(lib_id, {}, None, None, "reseed")], SCHEMAS["libraries"]
        ),
    )
    doc_id = str(uuid.uuid4())
    d.add(
        "documents",
        spark.createDataFrame(
            [(doc_id, {}, None, None, "d", lib_id)], SCHEMAS["documents"]
        ),
    )
    d.add(
        "chunks",
        spark.createDataFrame(
            [
                (str(uuid.uuid4()), {"row": str(i)}, None, None, q, None, doc_id)
                for i, q in enumerate(QUESTIONS)
            ],
            SCHEMAS["chunks"],
        ),
    )
    d._ivf = None  # force a rebuild inside this test
    d.search(QUESTIONS[3], index_type="ivf", k=3, metadata={"row": "3"})
    hits = d.search(QUESTIONS[7], index_type="ivf", k=10).collect()
    assert any(r.content == QUESTIONS[7] for r in hits)


def test_crash_between_write_and_commit_preserves_table(db, spark):
    """r1 verdict #5: a crash after the new version's data is written
    but BEFORE the pointer commit must leave the old table fully
    readable (the old double-overwrite could destroy the live copy)."""
    d, *_ = db
    before = {r.id for r in d.table("libraries").select("id").collect()}
    assert before  # something to lose

    orig = d._commit_pointer

    def crash(kind, version):
        raise RuntimeError("simulated crash before commit")

    d._commit_pointer = crash
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            d.add(
                "libraries",
                spark.createDataFrame(
                    [(str(uuid.uuid4()), {}, None, None, "doomed")],
                    SCHEMAS["libraries"],
                ),
            )
    finally:
        d._commit_pointer = orig

    after = {r.id for r in d.table("libraries").select("id").collect()}
    assert after == before  # uncommitted write invisible, nothing lost

    # and the store still accepts writes afterwards
    new_id = str(uuid.uuid4())
    d.add(
        "libraries",
        spark.createDataFrame(
            [(new_id, {}, None, None, "post-crash")], SCHEMAS["libraries"]
        ),
    )
    assert new_id in {r.id for r in d.table("libraries").select("id").collect()}
