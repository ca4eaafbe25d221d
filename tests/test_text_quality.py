"""Unit tests for the repetition-scoring and PII-scrubbing text
functions on constructed edge cases (the registered queries verify
fixture-scale oracle parity; these pin the per-string semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_vectordb_spark.functions import text as T


def _one(spark, text: str, col):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(col(F.col("t")).alias("v")).first().v


# ---------------------------------------------------------------- n-grams


def test_word_ngrams_multiplicity_and_order(spark):
    grams = _one(spark, "a b a b c", lambda c: T.word_ngrams(c, 2))
    assert grams == ["a b", "b a", "a b", "b c"]


def test_word_ngrams_short_doc_empty(spark):
    assert _one(spark, "solo", lambda c: T.word_ngrams(c, 2)) == []
    assert _one(spark, "", lambda c: T.word_ngrams(c, 2)) == []


def test_dup_ngram_frac_bounds(spark):
    # all-distinct words -> 0; all-same words -> (n-1)/n
    assert _one(spark, "a b c d", lambda c: T.dup_ngram_frac(c, 1)) == 0.0
    assert _one(spark, "x x x x", lambda c: T.dup_ngram_frac(c, 1)) == 0.75
    # too short for a bigram -> 0, not null/error
    assert _one(spark, "solo", lambda c: T.dup_ngram_frac(c, 2)) == 0.0


def test_top_ngram_frac_mode_of_sorted_runs(spark):
    # bigrams of "a b a b a": [a b, b a, a b, b a] -> mode 2/4
    assert _one(spark, "a b a b a", lambda c: T.top_ngram_frac(c, 2)) == 0.5
    # uniform text: every bigram identical
    assert _one(spark, "x x x x x", lambda c: T.top_ngram_frac(c, 2)) == 1.0
    # all distinct: mode 1/n
    assert _one(spark, "a b c d e", lambda c: T.top_ngram_frac(c, 2)) == 0.25
    assert _one(spark, "", lambda c: T.top_ngram_frac(c, 2)) == 0.0


def test_repetition_normalizes_case_and_whitespace(spark):
    # "The  the" normalizes to two equal tokens
    assert _one(spark, "The  \t the", lambda c: T.dup_ngram_frac(c, 1)) == 0.5


# ---------------------------------------------------------------- PII


SAMPLE = "mail First.Last+tag@sub.example.co.uk ip 192.168.1.255 tel +442071838750 ok"


def test_scrub_pii_all_kinds(spark):
    assert (
        _one(spark, SAMPLE, T.scrub_pii)
        == "mail <EMAIL> ip <IP> tel <PHONE> ok"
    )


def test_scrub_pii_leaves_clean_text(spark):
    clean = "no pii here just words and numbers 12 34 v1.2 semver"
    assert _one(spark, clean, T.scrub_pii) == clean


def test_scrub_pii_version_not_an_ip(spark):
    # fewer than four octets must not match the IPv4 pattern
    assert _one(spark, "release 1.2.3 out", T.scrub_pii) == "release 1.2.3 out"


def test_scrub_pii_email_wins_over_ip_and_phone(spark):
    # digit-heavy local part consumed by the email pass, not nibbled
    out = _one(spark, "x 10.0.0.1@example.com y", T.scrub_pii)
    assert out == "x <EMAIL> y"


def test_pii_counts(spark):
    df = spark.createDataFrame([(SAMPLE,)], "t string")
    c = T.pii_counts(F.col("t"))
    row = df.select(
        c["emails"].alias("e"), c["ips"].alias("i"), c["phones"].alias("p")
    ).first()
    assert (row.e, row.i, row.p) == (1, 1, 1)


def test_phone_requires_plus_and_length(spark):
    # bare digit runs and short +-prefixed runs are not phones
    assert _one(spark, "order 123456789 and +12345 end", T.scrub_pii) == (
        "order 123456789 and +12345 end"
    )


def test_quality_score_batch_parity(spark, sf_dir):
    """The Arrow quality kernel is value-identical to the Column form
    on every fixture document plus the edge rows (NULL / empty /
    whitespace-only / punctuation-soup / stopword-only text) — the
    manifests FILTER on this score, so parity must be exact, not
    approximate."""
    from local_vectordb_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edges = spark.createDataFrame(
        [
            (9_000_001, None),
            (9_000_002, ""),
            (9_000_003, "   \t \n "),
            (9_000_004, "the a of and is in to it"),
            (9_000_005, "!!! ??? ;;; :::"),
            (9_000_006, "word " * 250),
        ],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(edges)
    fast = T.quality_score_batch()
    a = {
        r["doc_id"]: r["q"]
        for r in corpus.select("doc_id", fast(F.col("text")).alias("q")).collect()
    }
    b = {
        r["doc_id"]: r["q"]
        for r in corpus.select(
            "doc_id", T.quality_score(F.col("text")).alias("q")
        ).collect()
    }
    assert a == b
