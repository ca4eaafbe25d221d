"""Full-text relevance (BM25) and hybrid lexical+vector search (RRF).

The reference engine searches by vector only; any real retrieval stack
pairs that with lexical scoring and fuses the two rankings. Both
operators here are deterministic arithmetic over counts, so — unlike
most search engines — the entire hybrid path is oracle-checkable in
plain SQL.

Scale design:
- Document lengths come from ``size(tokens(...))`` — a per-row
  expression, NO explode and no shuffle for the length stats.
- Only tokens MATCHING A QUERY TERM are exploded and shuffled: the
  term filter runs map-side before the (doc, term) aggregation, so the
  shuffled stream is a few rows per matching document, not the corpus
  token stream. Per-term document frequencies and the corpus stats
  (two tiny frames) broadcast back onto the matches.
- Fusion ranks candidate LISTS (top-N from each side), not full
  corpora: each side is a TakeOrderedAndProject and the fuse is an
  outer join of two ≤N-row frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from local_vectordb_spark.functions import text as T

RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 score of every document matching ≥1 query term.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the Lucene/ES form, always
    positive), tf normalized by document length against the corpus
    average. Returns (id_col, bm25) rounded to 6 dp.
    """
    toks = T.tokens(T.normalize_text(F.col(text_col)))
    # corpus stats without exploding: dl is an array size per row
    dl = docs.select(F.col(id_col), F.size(toks).alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )  # 1 row -> broadcast
    # explode, keep ONLY query-term hits (map-side filter), then tf
    hits = docs.select(F.col(id_col), F.explode(toks).alias("term")).filter(
        F.col("term").isin(list(query_terms))
    )
    tf = hits.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))  # docs containing term
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm_tf = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        scored.withColumn("contrib", idf * norm_tf)
        .groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
    )


def ranked_top(
    scores: DataFrame, score_col: str, id_col: str, n: int
) -> DataFrame:
    """Top-n candidates with a dense 1-based rank, ties broken by id.
    The limit runs as TakeOrderedAndProject; the rank window then sees
    at most n rows."""
    top = scores.orderBy(F.desc(score_col), F.asc(id_col)).limit(n)
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return top.select(id_col, F.row_number().over(w).alias("rank"))


def rrf_fuse(
    ranks_a: DataFrame,
    ranks_b: DataFrame,
    *,
    id_col: str = "doc_id",
    k: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion of two candidate rank lists:
    score(d) = Σ 1/(k + rank_i(d)), a side contributing 0 where d is
    unranked. Outer join of two small frames; returns (id_col, rrf)
    rounded to 6 dp."""
    a = ranks_a.withColumnRenamed("rank", "rank_a")
    b = ranks_b.withColumnRenamed("rank", "rank_b")
    joined = a.join(b, id_col, "full_outer")
    contrib = lambda c: F.coalesce(1.0 / (F.lit(k) + F.col(c)), F.lit(0.0))  # noqa: E731
    return joined.select(
        id_col,
        F.round(contrib("rank_a") + contrib("rank_b"), 6).alias("rrf"),
    )
