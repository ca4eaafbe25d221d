"""Chunking invariants: coverage (every token appears), overlap
(consecutive chunks share exactly `overlap` tokens), and bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_vectordb_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def chunked(spark, sf_dir):
    from local_vectordb_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs, chunk_documents(docs, chunk_size=20, overlap=5).cache()


def test_chunk_sizes_bounded(chunked):
    _, ch = chunked
    assert ch.filter((F.col("n_tokens") < 1) | (F.col("n_tokens") > 20)).count() == 0


def test_consecutive_chunks_overlap(chunked):
    _, ch = chunked
    rows = [r for r in ch.filter("doc_id = 0").orderBy("chunk_idx").collect()]
    for a, b in zip(rows, rows[1:]):
        ta, tb = a.chunk_text.split(" "), b.chunk_text.split(" ")
        if len(ta) == 20:  # full chunk: next starts stride=15 tokens later
            assert ta[15:] == tb[: len(ta[15:])]


def test_full_coverage_reconstructs_document(chunked, spark):
    docs, ch = chunked
    from local_vectordb_spark.functions.text import tokens

    want = {
        r.doc_id: r.n for r in docs.select(
            "doc_id", F.size(tokens(F.col("text"))).alias("n")
        ).collect()
    }
    # stride tokens are new per chunk except the first chunk (all new)
    got = {
        r.doc_id: r.n
        for r in ch.groupBy("doc_id")
        .agg(
            (F.sum("n_tokens") - (F.count("*") - 1) * 5).alias("n")
        )
        .collect()
    }
    assert got == want


def test_bad_params_raise(chunked, spark):
    docs, _ = chunked
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=10, overlap=10)
