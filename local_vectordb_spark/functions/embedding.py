"""Embedding surface (SURVEY §2.2, op E1).

The reference's only external service boundary is a blocking Cohere
embed-v4.0 call (/root/reference/src/embeddings.py:11-15). Here the
boundary is a pluggable *batch* embedder over an Arrow-vectorized
pandas UDF — the scan ships text batches to the embedder, never one
row at a time. Two deterministic offline backends are built in:

- ``letter_count_embedding`` — a pure Catalyst expression (letter
  histogram), exactly reproducible in any SQL engine, used for
  oracle-checked tests of the embed-then-search pipeline;
- ``hashed_embedding_udf`` — a seeded hash→vector pandas UDF with the
  statistical shape of a real embedding (unit-norm, pseudo-random),
  used where geometry matters but no network is available.

A production backend (Cohere/OpenAI/local model) plugs in by returning
its vectors from the same pandas-UDF contract; batching, retry, and
rate limiting live inside the UDF, amortized per Arrow batch.
"""

from __future__ import annotations

import hashlib
import string

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

LETTERS = string.ascii_lowercase[:16]  # dim-16 histogram space


def letter_count_embedding(text: Column) -> Column:
    """Deterministic text → vector as a JVM expression: component i is
    the count of LETTERS[i] in the lowercased text, L2-normalized.
    Semantically a cheap bag-of-characters embedding; its value is that
    a SQL oracle can reproduce it bit-for-bit."""
    low = F.lower(text)
    counts = [
        (F.length(low) - F.length(F.replace(low, F.lit(ch), F.lit("")))).cast(
            "double"
        )
        for ch in LETTERS
    ]
    vec = F.array(*counts)
    norm = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.when(norm == 0.0, vec).otherwise(
        F.transform(vec, lambda x: x / norm)
    )


def hashed_embedding_udf(dim: int = 64, seed: int = 42):
    """Seeded hash→vector embedder as an Arrow-batched pandas UDF.

    Each text's bytes are digested (sha256 + seed) into a per-text RNG
    seed; the vector is a unit-normalized standard normal draw. Fully
    deterministic across runs, partitionings, and cluster sizes —
    the offline stand-in for the reference's Cohere call.
    """

    @F.pandas_udf(ArrayType(DoubleType()))
    def embed(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            digest = hashlib.sha256(f"{seed}:{t}".encode()).digest()
            rng = np.random.default_rng(int.from_bytes(digest[:8], "little"))
            v = rng.standard_normal(dim)
            n = np.linalg.norm(v)
            out.append((v / n if n else v).tolist())
        return pd.Series(out)

    return embed


def api_embedding_udf(model: str = "embed-v4.0", batch_size: int = 96):
    """Production-shaped backend mirroring the reference's Cohere
    boundary (/root/reference/src/embeddings.py:3-15): texts go out in
    batches of ``batch_size`` per API call, vectors come back in order.

    The HTTP client is NOT shipped in this environment — calling the
    returned UDF raises NotImplementedError at the exact point a
    deployment would drop in its client. Everything around it
    (Arrow batching, Series→Series contract, call amortization) is the
    real production shape shared with the offline backends above.
    """

    @F.pandas_udf(ArrayType(DoubleType()))
    def embed(texts: pd.Series) -> pd.Series:
        try:
            import cohere  # noqa: F401  (not installed here)
        except ImportError as e:
            raise NotImplementedError(
                f"install an embedding client and call model={model!r} "
                f"in batches of {batch_size} here"
            ) from e
        raise NotImplementedError("wire the client call here")

    return embed


def embed_if_missing(df, text_col: str, vec_col: str, embedder=None) -> "pd.DataFrame":
    """E1 ingest semantics: rows with a vector keep it; rows without get
    embedded (reference: embed on create when absent,
    /root/reference/src/main.py:234-238). The conditional keeps already-
    embedded rows out of the UDF entirely."""
    embedder = embedder or hashed_embedding_udf()
    return df.withColumn(
        vec_col,
        F.when(F.col(vec_col).isNotNull(), F.col(vec_col)).otherwise(
            embedder(F.col(text_col))
        ),
    )
