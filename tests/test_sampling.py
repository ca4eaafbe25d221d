"""Tests for deterministic sampling / splitting / packing / decontam
(operators/sampling.py, operators/dedup.py::ngram_contamination)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_vectordb_spark.operators import dedup
from local_vectordb_spark.operators.sampling import (
    _hex4,
    hash_sample,
    hash_split,
    pack_sequences,
    stratified_sample,
)
from local_vectordb_spark.session import load_table


def test_hex4_thresholds():
    assert _hex4(0.0) == "0000"
    assert _hex4(1.0) == "ffff"
    assert _hex4(0.1) == "1999"
    assert _hex4(0.8) == "cccc"
    with pytest.raises(ValueError):
        _hex4(1.5)


def test_hash_sample_deterministic_and_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(7), "doc_id", 0.2)
        .select("doc_id")
        .collect()
    }
    assert a == b  # layout-independent
    n = docs.count()
    assert 0.05 * n < len(a) < 0.4 * n  # roughly the asked fraction


def test_hash_sample_nested_fractions(spark, sf_dir):
    """A smaller sample is a subset of a larger one (same key)."""
    docs = load_table(spark, sf_dir, "documents")
    small = {r.doc_id for r in hash_sample(docs, "doc_id", 0.1).collect()}
    big = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3).collect()}
    assert small <= big


def test_stratified_sample_per_stratum_fractions(spark, sf_dir):
    """Listed strata are downsampled to ~their fraction, unlisted strata
    are kept whole, the result is a subset of the input, and the en
    subset equals a plain hash_sample at the same fraction (same coin)."""
    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, "doc_id", "lang", {"en": 0.25, "fr": 0.5})
    base = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # unlisted strata pass through untouched
    for lang, n in base.items():
        if lang not in ("en", "fr"):
            assert kept.get(lang, 0) == n
    # listed strata roughly hit their fraction (loose bounds, small n)
    assert 0.05 * base["en"] < kept.get("en", 0) < 0.6 * base["en"]
    assert kept.get("fr", 0) < base["fr"]
    # per-stratum selection uses the same hash coin as hash_sample
    en_strat = {
        r.doc_id for r in out.filter(F.col("lang") == "en").select("doc_id").collect()
    }
    en_plain = {
        r.doc_id
        for r in hash_sample(docs.filter(F.col("lang") == "en"), "doc_id", 0.25)
        .select("doc_id")
        .collect()
    }
    assert en_strat == en_plain


def test_hash_split_partitions_everything(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)


def test_hash_split_train_superset_under_resplit(spark, sf_dir):
    """Shrinking val/test never moves rows OUT of train (cumulative
    thresholds)."""
    docs = load_table(spark, sf_dir, "documents")
    t80 = {
        r.doc_id
        for r in hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .filter(F.col("split") == "train")
        .collect()
    }
    t70 = {
        r.doc_id
        for r in hash_split(docs, "doc_id", {"train": 0.7, "val": 0.15, "test": 0.15})
        .filter(F.col("split") == "train")
        .collect()
    }
    assert t70 <= t80


def test_hash_split_rejects_bad_weights(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1})


def test_pack_sequences_invariants(spark, sf_dir):
    """Every doc lands in exactly one pack; pack token totals conserve
    the corpus; all-but-the-last pack per group starts under budget."""
    budget = 256
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias(
            "n_tokens"
        ),
    )
    packs = pack_sequences(docs, budget).collect()
    total_docs = sum(p.n_docs for p in packs)
    total_tokens = sum(p.pack_tokens for p in packs)
    base = docs.agg(
        F.count("*").alias("n"), F.sum("n_tokens").alias("t")
    ).first()
    assert total_docs == base.n
    assert total_tokens == base.t
    # pack ids per group are dense from 0 upward
    by_group: dict[str, list[int]] = {}
    for p in packs:
        by_group.setdefault(p.source, []).append(p.pack_id)
    for ids in by_group.values():
        assert min(ids) == 0


def test_ngram_contamination_flags_shared_docs(spark):
    """A corpus doc sharing an 8-gram with the benchmark is flagged;
    one with disjoint text is not; a benchmark doc itself never
    appears in the output (output ⊆ corpus ids)."""
    words = "alpha bravo charlie delta echo foxtrot golf hotel"
    bench = spark.createDataFrame(
        [(1000, f"{words} india juliett")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, f"prefix {words} suffix"),  # shares the 8-gram
            (2, "totally different words with no overlap at all here ok"),
        ],
        ["doc_id", "text"],
    )
    flagged = {r.doc_id for r in dedup.ngram_contamination(corpus, bench).collect()}
    assert flagged == {1}


def test_hash_sample_full_fraction_keeps_all(spark, sf_dir):
    """ADVICE r1: fraction=1.0 must keep every row — the 'ffff'
    threshold with strict < dropped ~1/65536 of keys."""
    import pytest as _pytest

    from local_vectordb_spark.operators.sampling import hash_sample
    from local_vectordb_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    assert hash_sample(docs, "doc_id", 1.0).count() == docs.count()
    with _pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1.5)


def test_temperature_fractions_math():
    """Keep-rates follow (n_min/n)^(1-α): smallest stratum keeps all,
    α=1 is proportional passthrough (all 1.0), α=0 fully flattens
    (kept sizes all equal n_min in expectation)."""
    import pytest as _pytest

    from local_vectordb_spark.operators.sampling import temperature_fractions

    counts = {"en": 400, "fr": 100}
    half = temperature_fractions(counts, alpha=0.5)
    assert half["fr"] == 1.0
    assert abs(half["en"] - 0.5) < 1e-12  # sqrt(100/400)
    assert temperature_fractions(counts, alpha=1.0) == {"en": 1.0, "fr": 1.0}
    flat = temperature_fractions(counts, alpha=0.0)
    assert abs(flat["en"] - 0.25) < 1e-12  # expected kept = 100 = n_min
    assert temperature_fractions({}, 0.5) == {}
    with _pytest.raises(ValueError):
        temperature_fractions(counts, alpha=1.5)


def test_temperature_sample_flattens_head(spark, sf_dir):
    """Applying temperature fractions via stratified_sample keeps the
    smallest language whole and strictly downsamples the largest."""
    from pyspark.sql import functions as F

    from local_vectordb_spark.operators.sampling import (
        stratified_sample,
        temperature_fractions,
    )
    from local_vectordb_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    counts = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    fr = temperature_fractions(counts, alpha=0.5)
    kept = {
        r["lang"]: r["n"]
        for r in stratified_sample(docs, "doc_id", "lang", fr)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    smallest = min(counts, key=counts.get)
    largest = max(counts, key=counts.get)
    assert kept[smallest] == counts[smallest]
    assert kept[largest] < counts[largest]


def test_split_group_aware_families_never_straddle_splits(spark, sf_dir):
    """The group-aware split's whole point: every near-dup family maps
    to exactly ONE split (a per-doc split would leak eval twins into
    train), and each doctored copy (+1000000 id) co-travels with its
    original."""
    from local_vectordb_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["split_group_aware"](spark, sf_dir).collect()
    by_family = {}
    by_doc = {}
    for r in rows:
        by_family.setdefault(r.family_id, set()).add(r.split)
        by_doc[r.doc_id] = r.split
    assert all(len(s) == 1 for s in by_family.values())
    copies = [d for d in by_doc if d >= 1_000_000]
    assert copies  # the doctored corpus must actually contain families
    assert all(by_doc[d] == by_doc[d - 1_000_000] for d in copies)
    assert {"train", "val", "test"} >= set(by_doc.values()) and "train" in by_doc.values()


def test_split_group_aware_lsh_families_never_straddle_and_cover_pair_form(spark, sf_dir):
    """The star-edge LSH split (the 100 TB pair source) holds the same
    leakage guarantee — every family in one split, each doctored copy
    co-traveling with its original — AND its families are a coarsening
    of the pair form's: any two docs the all-pairs composition put in
    one family must share an LSH family too (star edges over-merge on
    band collisions, never under-merge a bucketed pair)."""
    from local_vectordb_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["split_group_aware_lsh"](spark, sf_dir).collect()
    by_family = {}
    by_doc = {}
    fam_of = {}
    for r in rows:
        by_family.setdefault(r.family_id, set()).add(r.split)
        by_doc[r.doc_id] = r.split
        fam_of[r.doc_id] = r.family_id
    assert all(len(s) == 1 for s in by_family.values())
    copies = [d for d in by_doc if d >= 1_000_000]
    assert copies
    assert all(by_doc[d] == by_doc[d - 1_000_000] for d in copies)

    pair_fams = {}
    for r in SPARK_QUERIES["split_group_aware"](spark, sf_dir).collect():
        pair_fams.setdefault(r.family_id, []).append(r.doc_id)
    for members in pair_fams.values():
        assert len({fam_of[d] for d in members}) == 1, members
