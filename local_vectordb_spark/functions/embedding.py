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

The production backend (``api_embedding_udf``) implements the real
client semantics — batch_size-chunked calls, exponential-backoff retry
on 429/5xx/timeout, order-preserving reassembly — over an injectable
transport (stdlib REST client by default, a fake in tests), all inside
the same pandas-UDF contract, amortized per Arrow batch.
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
    return _l2_normalized(F.array(*counts))


def _l2_normalized(vec: Column) -> Column:
    """L2-normalize an array column with ONE sum-of-squares pass.

    The naive ``transform(vec, x -> x / norm)`` CAPTURES ``norm`` in
    the lambda, so the full norm aggregate — and the vector expression
    under it — re-evaluates once PER ELEMENT (the dim² trap that made
    embed_letter_knn ~5× slower at sf0.1). Here the sum of squares is
    the aggregate's accumulator and the divide lives in its finish
    lambda, where referencing the accumulator and the (argument-bound)
    array costs nothing extra. Zero vectors pass through unscaled,
    matching the oracle's CASE guard.
    """
    return F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: acc + x * x,
        lambda s: F.when(s == 0.0, vec).otherwise(
            F.transform(vec, lambda x: x / F.sqrt(s))
        ),
    )


def md5_embedding(text: Column, dim: int = 8) -> Column:
    """Deterministic text → vector with an ENGINE-PORTABLE hash family,
    fully JVM-side: component j is the first 60 bits of
    md5(text || '#' || j) mapped affinely into [-1, 1), then the vector
    is L2-normalized. The same md5-twin trick the MinHash/SimHash
    portable variants use (identical strings hash identically in any
    engine with md5), so — unlike ``hashed_embedding_udf``, whose
    sha256+numpy-RNG draw has no SQL equivalent and is checked
    rows-only — every component here is value-reproducible in plain
    SQL and the whole E1→Q1→Q2 pipeline gets an exact oracle.
    Reference boundary: /root/reference/src/embeddings.py:11-15 (the
    Cohere call this deterministic stand-in replaces for testing).

    60 bits = 15 hex chars keeps the value inside a BIGINT in every
    engine; /2^59 − 1 is exact IEEE scaling (power-of-two divide), so
    doubles agree bit-for-bit across engines.
    """
    comps = [
        (
            F.conv(
                F.substring(F.md5(F.concat(text, F.lit(f"#{j}"))), 1, 15),
                16,
                10,
            ).cast("long")
            / F.lit(float(1 << 59))
            - F.lit(1.0)
        )
        for j in range(dim)
    ]
    return _l2_normalized(F.array(*comps))


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


class TransientEmbeddingError(Exception):
    """Retryable transport failure (rate limit / server hiccup)."""

    def __init__(self, status: int, message: str = ""):
        super().__init__(f"transient embedding error {status}: {message}")
        self.status = status


class EmbeddingClientError(RuntimeError):
    """Non-retryable client failure (retries exhausted, bad response)."""


def cohere_rest_transport(
    api_key: str,
    model: str = "embed-v4.0",
    url: str = "https://api.cohere.com/v2/embed",
    timeout_s: float = 30.0,
):
    """stdlib transport for the reference's service boundary — the
    Cohere v2 embed REST endpoint (/root/reference/src/embeddings.py:3-15
    calls the same API through the SDK). Returns
    ``call(texts) -> list[vector]``; raises TransientEmbeddingError on
    429/5xx (so the batched embedder retries) and lets other HTTP
    errors propagate as permanent failures."""
    import json
    import urllib.error
    import urllib.request

    def call(texts):
        body = json.dumps(
            {
                "model": model,
                "texts": list(texts),
                "input_type": "search_document",
                "embedding_types": ["float"],
            }
        ).encode()
        req = urllib.request.Request(
            url,
            data=body,
            headers={
                "Authorization": f"Bearer {api_key}",
                "Content-Type": "application/json",
            },
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                payload = json.load(resp)
        except urllib.error.HTTPError as e:
            if e.code == 429 or e.code >= 500:
                raise TransientEmbeddingError(e.code, str(e.reason)) from e
            raise
        return payload["embeddings"]["float"]

    return call


def batched_embedder(
    transport,
    batch_size: int = 96,
    max_retries: int = 5,
    backoff_base_s: float = 0.1,
    sleep=None,
):
    """E1 client core: ``batch_size``-chunked transport calls with
    exponential backoff on transient failures and order-preserving
    reassembly. Pure Python (transport injected) so retry/batching
    semantics are unit-testable without a network or a SparkSession.

    Retries TransientEmbeddingError and TimeoutError up to
    ``max_retries`` per chunk, sleeping backoff_base_s · 2^attempt
    between attempts; anything else — and a transport returning the
    wrong vector count — fails the job loudly rather than silently
    misaligning texts with vectors."""
    import time

    do_sleep = sleep if sleep is not None else time.sleep

    def embed_all(texts):
        out = []
        for i in range(0, len(texts), batch_size):
            chunk = list(texts[i : i + batch_size])
            attempt = 0
            while True:
                try:
                    vecs = transport(chunk)
                    break
                except (TransientEmbeddingError, TimeoutError) as e:
                    if attempt >= max_retries:
                        raise EmbeddingClientError(
                            f"chunk at offset {i}: gave up after "
                            f"{max_retries} retries"
                        ) from e
                    do_sleep(backoff_base_s * (2**attempt))
                    attempt += 1
            if len(vecs) != len(chunk):
                raise EmbeddingClientError(
                    f"transport returned {len(vecs)} vectors for "
                    f"{len(chunk)} texts"
                )
            out.extend([float(x) for x in v] for v in vecs)
        return out

    return embed_all


def api_embedding_udf(
    transport=None,
    model: str = "embed-v4.0",
    batch_size: int = 96,
    max_retries: int = 5,
    backoff_base_s: float = 0.1,
    api_key: str | None = None,
):
    """Production backend mirroring the reference's Cohere boundary
    (/root/reference/src/embeddings.py:3-15): texts go out in batches
    of ``batch_size`` per API call, vectors come back in order, 429s
    and 5xxs are retried with exponential backoff.

    The transport is injectable (tests pass a fake; a deployment may
    swap httpx/SDK for the stdlib default). Retry state lives inside
    the pandas UDF, so backoff is per-executor-task and the call count
    is amortized per Arrow batch — the same Series→Series contract as
    the offline backends above."""
    if transport is None:
        import os

        key = api_key if api_key is not None else os.environ.get("COHERE_API_KEY")
        if not key:
            raise EmbeddingClientError(
                "no transport injected and no api_key/COHERE_API_KEY set"
            )
        transport = cohere_rest_transport(key, model=model)
    embed_all = batched_embedder(
        transport,
        batch_size=batch_size,
        max_retries=max_retries,
        backoff_base_s=backoff_base_s,
    )

    @F.pandas_udf(ArrayType(DoubleType()))
    def embed(texts: pd.Series) -> pd.Series:
        return pd.Series(embed_all(texts.tolist()))

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
