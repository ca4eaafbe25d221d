"""BM25 and RRF semantics pinned against a pure-Python reference on a
tiny corpus (the registered queries prove fixture-scale oracle parity)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from local_vectordb_spark.operators import fulltext as FT

CORPUS = [
    (0, "hash join beats nested loop join"),
    (1, "merge sort then merge join"),
    (2, "scan filter project repeat"),
    (3, "hash hash hash everywhere hash"),
]


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for term in terms:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf:
                contrib = idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * len(v) / avgdl)
                )
                out[i] = out.get(i, 0.0) + contrib
    return {i: round(s, 6) for i, s in out.items()}


def test_bm25_matches_python_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r.doc_id: r.bm25
        for r in FT.bm25_scores(df, ["hash", "join", "merge"]).collect()
    }
    assert got == pytest.approx(_py_bm25(CORPUS, ["hash", "join", "merge"]))


def test_bm25_term_saturation(spark):
    # doc 3 repeats 'hash' 4x but must not score 4x doc 0's single hit
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in FT.bm25_scores(df, ["hash"]).collect()}
    assert got[3] > got[0]
    assert got[3] < 4 * got[0]


def test_bm25_no_match_empty(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, text string")
    assert FT.bm25_scores(df, ["zebra"]).count() == 0


def test_rrf_fuse_both_and_single_list(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    got = {r.doc_id: r.rrf for r in FT.rrf_fuse(a, b).collect()}
    assert got[1] == pytest.approx(round(1 / 61, 6))
    assert got[2] == pytest.approx(round(1 / 62 + 1 / 61, 6))
    assert got[3] == pytest.approx(round(1 / 62, 6))


def test_ranked_top_tiebreak_by_id(spark):
    s = spark.createDataFrame(
        [(5, 1.0), (3, 1.0), (9, 0.5)], "doc_id long, score double"
    )
    rows = FT.ranked_top(s, "score", "doc_id", 2).orderBy("rank").collect()
    assert [(r.doc_id, r.rank) for r in rows] == [(3, 1), (5, 2)]
