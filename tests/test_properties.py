"""Property-based tests (hypothesis): merge semantics and fingerprint
invariances hold for arbitrary inputs, not just the fixtures."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from local_vectordb_spark.functions import text as T
from local_vectordb_spark.operators import crud

WORD = st.text(alphabet="abcdefg", min_size=1, max_size=6)

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@given(
    base=st.dictionaries(st.integers(0, 20), st.integers(0, 99), max_size=8),
    upd=st.dictionaries(
        st.integers(0, 20),
        st.one_of(st.none(), st.integers(100, 199)),
        max_size=8,
    ),
)
@SLOW
def test_upsert_merge_semantics(sp, base, upd):
    """Result keys = union; where both exist a non-null update wins and
    a null update preserves the base value; update-only keys insert."""
    bdf = sp.createDataFrame(
        [(k, v) for k, v in base.items()] or [], "id int, val int"
    )
    udf_ = sp.createDataFrame(
        [(k, v) for k, v in upd.items()] or [], "id int, val int"
    )
    got = {r.id: r.val for r in crud.upsert(bdf, udf_, "id").collect()}
    want = dict(base)
    for k, v in upd.items():
        want[k] = v if v is not None else base.get(k)
    assert got == want


@given(words=st.lists(WORD, min_size=1, max_size=30), seed=st.integers(0, 5))
@SLOW
def test_winnow_whitespace_and_case_invariant(sp, words, seed):
    import random

    text = " ".join(words)
    rng = random.Random(seed)
    noisy = "".join(
        (w.upper() if rng.random() < 0.5 else w) + " " * rng.randint(1, 3)
        for w in words
    )
    df = sp.createDataFrame([(text,), (noisy,)], "t string")
    fps = [
        set(r.f)
        for r in df.select(T.winnow_fingerprints(F.col("t")).alias("f")).collect()
    ]
    assert fps[0] == fps[1]


@given(
    a=st.lists(WORD, min_size=1, max_size=20),
    b=st.lists(WORD, min_size=1, max_size=20),
)
@SLOW
def test_rolling_hash_equality_iff_normalized_equality(sp, a, b):
    ta, tb = " ".join(a), " ".join(b)
    df = sp.createDataFrame([(ta,), (tb,)], "t string")
    h = [
        r.h
        for r in df.select(
            T.rolling_hash(T.normalize_text(F.col("t"))).alias("h")
        ).collect()
    ]
    if ta == tb:
        assert h[0] == h[1]
    else:
        # mod-2^31 collisions exist in principle; for these tiny inputs
        # a collision would indicate a real bug
        assert h[0] != h[1]


@given(
    texts=st.lists(
        st.text(
            alphabet="ab c.!é\t\n0",  # spaces/tabs/punct/non-ASCII/digits
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    )
)
@SLOW
def test_shingles_match_python_reference(sp, texts):
    """The zip_with-chain shingle builder equals the straightforward
    Python definition (normalize, tokenize, join every 3-token window,
    short docs -> one shorter gram, empty -> ['']) for arbitrary text."""
    import re

    def ref(t: str) -> list[str]:
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        toks = [w for w in norm.split(" ") if w != ""]
        if not toks:
            return [""]
        grams = [
            " ".join(toks[i : i + 3])
            for i in range(max(len(toks) - 3, 0) + 1)
        ]
        return sorted(set(grams), key=grams.index)  # distinct, first-seen

    df = sp.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r.i: sorted(r.s)
        for r in df.select("i", T.shingles(F.col("t")).alias("s")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == sorted(ref(t)), (t, got[i])


@given(
    texts=st.lists(
        st.text(alphabet="abc XYZ.!?é12\t", min_size=0, max_size=60),
        min_size=1,
        max_size=5,
    )
)
@SLOW
def test_winnow_udf_equals_column_form(sp, texts):
    """The Arrow-batched winnow UDF is byte-identical to the Column HOF
    form on arbitrary text (normalization, short docs, non-ASCII)."""
    df = sp.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    col_form = {
        r.i: r.fps
        for r in df.select(
            "i", F.array_sort(T.winnow_fingerprints(F.col("t"))).alias("fps")
        ).collect()
    }
    wn = T.winnow_fingerprints_batch()
    udf_form = {
        r.i: r.fps
        for r in df.select(
            "i", wn(T.normalize_text(T.ascii_only(F.col("t")))).alias("fps")
        ).collect()
    }
    assert col_form == udf_form


@given(
    micros=st.lists(
        st.integers(0, 4_102_444_800_000_000),  # 1970..2100 in µs
        min_size=1,
        max_size=8,
    )
)
@SLOW
def test_epoch_micros_roundtrip_ntz(sp, micros):
    """epoch_micros inverts timestamp construction exactly for NTZ
    columns across the full representable range (no tz dependence,
    no precision loss)."""
    from local_vectordb_spark.functions.timeutil import epoch_micros

    df = sp.createDataFrame([(m,) for m in micros], "us long").select(
        F.col("us"), F.timestamp_micros(F.col("us")).cast("timestamp_ntz").alias("ts")
    )
    out = df.select("us", epoch_micros(df, "ts").alias("back")).collect()
    assert all(r.us == r.back for r in out)


@given(
    nanos=st.lists(
        st.integers(-(10**15), 4 * 10**18),  # pre-1970 through ~2096 in ns
        min_size=1,
        max_size=8,
    )
)
@SLOW
def test_epoch_micros_long_branch_floors(sp, nanos):
    """The legacy nanos-as-long branch must FLOOR to microseconds —
    truncation would put pre-1970 values one microsecond high and
    disagree with the timestamp branches for the same instant."""
    from local_vectordb_spark.functions.timeutil import epoch_micros

    df = sp.createDataFrame([(n,) for n in nanos], "ts long")
    out = df.select(F.col("ts"), epoch_micros(df, "ts").alias("us")).collect()
    for r in out:
        assert r.us == r.ts // 1000  # python // is floor division


@given(
    vec=st.lists(
        st.floats(-10, 10, allow_nan=False, width=32), min_size=4, max_size=8
    )
)
@SLOW
def test_sign_bucket_probe_invariants(sp, vec):
    """sign_bucket lands in [0, 16) and matches the driver-side probe's
    own-bucket computation; the Hamming-1 probe set has 5 distinct
    buckets including the query's own."""
    from local_vectordb_spark.operators.ivf import sign_bucket, sign_probe

    df = sp.createDataFrame([(vec,)], "embedding array<float>")
    [row] = df.select(sign_bucket("embedding", 4).alias("b")).collect()
    probed = sign_probe(vec, 4)
    assert 0 <= row.b < 16
    assert row.b == probed[0]  # spark expr == driver-side computation
    assert len(set(probed)) == 5 and row.b in probed


@given(
    vecs=st.lists(
        st.lists(
            st.floats(-2.0, 2.0, allow_nan=False, width=32),
            min_size=16,
            max_size=16,
        ),
        min_size=1,
        max_size=6,
    )
)
@SLOW
def test_pq_encode_matches_sequential_python_fold(sp, vecs):
    """The oracle contract for PQ: Spark's encode must equal a pure
    sequential-fold Python replication bit for bit (same argmin, first
    index on ties) for arbitrary float vectors — this is the exact
    property the generated SQL relies on."""
    from local_vectordb_spark.operators import pq

    book = pq.pq_codebook(dim=16, m=4, k_codes=8)
    df = sp.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: list(r.codes)
        for r in df.select(
            "vec_id", pq.pq_encode("embedding", book).alias("codes")
        ).collect()
    }
    for i, v in enumerate(vecs):
        want = []
        for s in range(4):
            sub = [float(x) for x in v[s * 4 : (s + 1) * 4]]
            dists = []
            for cent in book[s]:
                acc = 0.0
                for x, y in zip(sub, cent):
                    acc += (x - y) * (x - y)
                dists.append(acc)
            want.append(dists.index(min(dists)))
        assert got[i] == want


@given(
    vec=st.lists(
        st.floats(-10, 10, allow_nan=False, width=32), min_size=4, max_size=8
    ),
    ham=st.integers(0, 3),
)
@SLOW
def test_sign_ball_expression_equals_driver_probe(sp, vec, ham):
    """The batch-sign oracle's foundation: the Column-side Hamming ball
    (sign_ball over the bucket expression) must enumerate exactly the
    driver-side sign_probe set, in the same order, for every radius."""
    from local_vectordb_spark.operators.ivf import (
        sign_ball,
        sign_bucket,
        sign_probe,
    )

    df = sp.createDataFrame([(vec,)], "embedding array<float>")
    [row] = df.select(
        sign_ball(sign_bucket("embedding", 4), 4, ham).alias("ball")
    ).collect()
    assert list(row.ball) == sign_probe(vec, 4, max_hamming=ham)


@given(n=st.integers(1, 10**9))
@settings(max_examples=60, deadline=None)
def test_graph_lsh_bits_bound_holds(n):
    """For every corpus size the chosen n_bits keeps the expected
    (table, bucket) group under the row bound, or hits the 16-bit cap;
    and the knob is monotone (bigger corpora never get fewer bits)."""
    from local_vectordb_spark.operators.ann import (
        GRAPH_LSH_MAX_ROWS,
        graph_lsh_bits,
    )

    b = graph_lsh_bits(n)
    assert 4 <= b <= 16
    assert b == 16 or n * (b + 1) / (1 << b) <= GRAPH_LSH_MAX_ROWS
    # no smaller bit count would satisfy the bound
    if b > 4:
        assert n * (b - 1 + 1) / (1 << (b - 1)) > GRAPH_LSH_MAX_ROWS
    assert graph_lsh_bits(2 * n) >= b


@given(
    docs=st.lists(
        st.lists(
            st.lists(WORD, min_size=1, max_size=4).map(" ".join),
            min_size=1,
            max_size=5,
        ).map("\n".join),
        min_size=1,
        max_size=8,
    ),
    min_docs=st.integers(2, 3),
)
@SLOW
def test_strip_boilerplate_matches_python_reference(sp, docs, min_docs):
    """strip_boilerplate agrees with a direct pure-Python model on
    arbitrary small corpora: a line is removed iff its normalized form
    is >= min_chars long AND recurs in >= min_docs distinct docs;
    survivors keep document order; all-boilerplate docs drop out."""
    import re

    from local_vectordb_spark.operators import dedup

    min_chars = 3

    def norm(line):
        return re.sub(r"\s+", " ", line.lower()).strip()

    per_doc_norms = [
        {norm(ln) for ln in text.split("\n")} for text in docs
    ]
    from collections import Counter

    df_count = Counter(n for s in per_doc_norms for n in s)
    bp = {
        n for n, c in df_count.items() if len(n) >= min_chars and c >= min_docs
    }
    want = {}
    for i, text in enumerate(docs):
        kept = [ln for ln in text.split("\n") if norm(ln) not in bp]
        if kept:
            want[i] = (len(kept), "\n".join(kept))

    sdf = sp.createDataFrame(
        list(enumerate(docs)), "doc_id int, text string"
    )
    got = {
        r.doc_id: (r.n_kept, r.clean_text)
        for r in dedup.strip_boilerplate(
            sdf, min_docs=min_docs, min_chars=min_chars
        ).collect()
    }
    assert got == want
