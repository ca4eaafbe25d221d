"""Diversified re-ranking: Maximal Marginal Relevance (MMR).

MMR greedily builds a result list that trades query relevance against
redundancy with what is already selected:

    pick argmax_d  lam * rel(d) - mu * max_{s in S} sim(d, s)

The selection is inherently sequential, but it only ever runs on a
BOUNDED candidate list (top-N from a distributed first stage), so the
whole rerank is one Arrow batch inside a single task — no driver
collect, no shuffle, and the expensive part (candidate generation)
stays fully distributed. This two-tier shape (distributed recall →
bounded rerank) is how every production retrieval stack runs MMR.

Determinism contract (what makes this oracle-checkable, unusual for a
greedy algorithm): relevance arrives already rounded to 6 dp, pairwise
similarities are rounded to 6 dp before use, every step's MMR score is
rounded to 6 dp, and argmax ties break by ascending id. Identical
rounded inputs + identical IEEE double arithmetic = an identical
selection sequence in any engine, which the recursive-CTE oracle
reproduces step by step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    mu: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rel_col: str = "score",
) -> DataFrame:
    """Greedy MMR over a small candidate frame (id, vector, relevance).

    ``mu`` is passed explicitly rather than computed as ``1 - lam``:
    1 - 0.7 is 0.30000000000000004 in binary doubles, and the oracle's
    literal 0.3 must multiply bit-identically.

    Returns (id_col, mmr_rank 1-based, mmr_score) in selection order.
    """

    def _mmr(batches):
        import numpy as np
        import pandas as pd

        pdf = pd.concat(list(batches), ignore_index=True)
        if pdf.empty:
            return
        ids = pdf[id_col].to_numpy()
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        V = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0.0] = 1.0
        Vn = V / norms[:, None]
        S = np.round(Vn @ Vn.T, 6)

        n = len(ids)
        take = min(k, n)
        # first pick: highest relevance, ties by ascending id (the
        # oracle's ORDER BY rel DESC, id ASC base case). Python min
        # keeps the tie-break dtype-agnostic (ids may be strings).
        top_rel = np.flatnonzero(rel == rel.max())
        first = int(min(top_rel, key=lambda i: ids[i]))
        picked = [first]
        scores = [float(np.round(lam * rel[first], 6))]
        maxsim = S[:, first].copy()
        for _ in range(1, take):
            ms = np.round(lam * rel - mu * maxsim, 6)
            ms[picked] = -np.inf
            best = ms.max()
            ties = np.flatnonzero(ms == best)
            nxt = int(min(ties, key=lambda i: ids[i]))
            picked.append(nxt)
            scores.append(float(best))
            np.maximum(maxsim, S[:, nxt], out=maxsim)
        yield pd.DataFrame(
            {
                id_col: ids[picked],
                "mmr_rank": np.arange(1, take + 1, dtype=np.int32),
                "mmr_score": scores,
            }
        )

    id_type = dict(candidates.dtypes)[id_col]
    schema = f"{id_col} {id_type}, mmr_rank int, mmr_score double"
    return candidates.coalesce(1).mapInPandas(_mmr, schema)
