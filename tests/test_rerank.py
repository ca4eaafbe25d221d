"""MMR rerank semantics: reference implementation parity, the
diversity property it exists for, and the determinism contract."""

from __future__ import annotations

import numpy as np
import pytest

from local_vectordb_spark.operators.rerank import mmr_rerank


def _py_mmr(ids, vecs, rel, k=3, lam=0.7, mu=0.3):
    V = np.asarray(vecs, dtype=np.float64)
    n = np.linalg.norm(V, axis=1)
    n[n == 0] = 1.0
    Vn = V / n[:, None]
    S = np.round(Vn @ Vn.T, 6)
    rel = np.asarray(rel, dtype=np.float64)
    ids = np.asarray(ids)
    first = int(np.lexsort((ids, -rel))[0])
    picked, scores = [first], [float(np.round(lam * rel[first], 6))]
    maxsim = S[:, first].copy()
    for _ in range(1, min(k, len(ids))):
        ms = np.round(lam * rel - mu * maxsim, 6)
        ms[picked] = -np.inf
        ties = np.flatnonzero(ms == ms.max())
        nxt = int(ties[np.argmin(ids[ties])])
        picked.append(nxt)
        scores.append(float(ms[nxt]))
        maxsim = np.maximum(maxsim, S[:, nxt])
    return [int(ids[i]) for i in picked], scores


def _run(spark, rows, k=3):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, score double"
    )
    out = mmr_rerank(df, k=k).orderBy("mmr_rank").collect()
    return [r.vec_id for r in out], [r.mmr_score for r in out]


def test_mmr_matches_reference(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(8, 5))
    qv = rng.normal(size=5)
    rel = np.round(
        (vecs @ qv)
        / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(qv)),
        6,
    )
    rows = [(i, vecs[i].tolist(), float(rel[i])) for i in range(8)]
    got_ids, got_scores = _run(spark, rows, k=4)
    exp_ids, exp_scores = _py_mmr(range(8), vecs, rel, k=4)
    assert got_ids == exp_ids
    assert got_scores == pytest.approx(exp_scores)


def test_mmr_skips_near_duplicate(spark):
    # two near-identical top docs: plain top-2 takes both, MMR must
    # pick the orthogonal one second
    # MMR picks 2: 0.7*0.80 - 0.3*0 = 0.56 beats the near-dup's
    # 0.7*0.98 - 0.3*1.0 ~= 0.386; plain top-2 would take [0, 1]
    rows = [
        (0, [1.0, 0.0, 0.0], 0.99),
        (1, [0.999, 0.01, 0.0], 0.98),  # near-dup of 0
        (2, [0.0, 1.0, 0.0], 0.80),
    ]
    ids, _ = _run(spark, rows, k=2)
    assert ids == [0, 2]


def test_mmr_first_pick_tie_breaks_by_id(spark):
    rows = [
        (7, [1.0, 0.0], 0.9),
        (3, [0.0, 1.0], 0.9),
        (5, [1.0, 1.0], 0.1),
    ]
    ids, _ = _run(spark, rows, k=1)
    assert ids == [3]


def test_mmr_k_larger_than_candidates(spark):
    rows = [(0, [1.0, 0.0], 0.9), (1, [0.0, 1.0], 0.8)]
    ids, _ = _run(spark, rows, k=10)
    assert sorted(ids) == [0, 1]
