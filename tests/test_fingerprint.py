"""Properties of the fingerprint family: determinism, and winnowing's
defining robustness — local edits leave most fingerprints intact,
unrelated documents share almost none."""

from __future__ import annotations

from pyspark.sql import functions as F

from local_vectordb_spark.functions import text as T


def _fps(spark, texts: list[str]) -> list[set[int]]:
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    rows = (
        df.select("i", T.winnow_fingerprints(F.col("t")).alias("fps"))
        .orderBy("i")
        .collect()
    )
    return [set(r.fps) for r in rows]


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b)


DOC = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


def test_rolling_hash_deterministic(spark):
    df = spark.createDataFrame([(DOC,), (DOC,), (DOC + " extra",)], "t string")
    fps = [r.fp for r in df.select(T.rolling_hash(F.col("t")).alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_winnow_survives_local_edit(spark):
    edited = DOC.replace("lazy dog", "sleepy dog")
    unrelated = (
        "completely different content about distributed query engines "
        "processing one hundred terabytes of training data every day"
    )
    orig, edit, other = _fps(spark, [DOC, edited, unrelated])
    assert _jaccard(orig, edit) > 0.6, "local edit should keep most fingerprints"
    assert _jaccard(orig, other) < 0.1, "unrelated docs should share few"


def test_winnow_case_and_whitespace_invariant(spark):
    noisy = "  THE quick   Brown fox JUMPS over the lazy dog while the cat watches from the warm windowsill and the birds sing in the garden outside "
    a, b = _fps(spark, [DOC, noisy])
    assert a == b


def test_winnow_batch_udf_matches_column_form(spark):
    """The Arrow-batched winnow (pandas UDF over normalized text) must
    emit byte-identical fingerprints to the pure-Column HOF form,
    including the edge cases: doc shorter than k (whole-string hash),
    doc with fewer than w windows (min over available), empty string,
    and non-ASCII stripping."""
    rows = [
        (DOC,),
        ("tiny",),            # < k chars → whole-string rolling hash
        ("exactly7",),        # 8 chars → 2 grams, 1 window
        ("",),                # empty → [0]
        ("héllo wörld this is mixed unicode content for the stripper",),
    ]
    df = spark.createDataFrame(rows, "t string")
    col_form = df.select(
        F.array_sort(T.winnow_fingerprints(F.col("t"))).alias("fps")
    ).collect()
    wn = T.winnow_fingerprints_batch()
    udf_form = df.select(
        wn(T.normalize_text(T.ascii_only(F.col("t")))).alias("fps")
    ).collect()
    assert [r.fps for r in col_form] == [r.fps for r in udf_form]
