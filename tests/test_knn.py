from pyspark.sql import functions as F

from local_vectordb_spark.operators import knn
from local_vectordb_spark.session import load_table


def test_brute_force_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    out = knn.knn_brute_force(emb, q, k=5).collect()
    assert len(out) == 5
    # the query vector itself must be rank 1 with score 1.0
    assert out[0]["vec_id"] == 0
    assert out[0]["score"] == 1.0
    # scores monotonically non-increasing
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_brute_force_uses_take_ordered(spark, sf_dir):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (distributed
    per-partition top-k), not a global sort."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = list(emb.first()["embedding"])
    plan = knn.knn_brute_force(emb, q, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_batch_matches_single(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qrows = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").isin(3, 7)).collect()
    ]
    batch = {
        (r["query_id"], r["vec_id"]): r["score"]
        for r in knn.knn_batch(emb, qrows, k=4).collect()
    }
    for qid in (3, 7):
        qv = list(emb.filter(F.col("vec_id") == qid).first()["embedding"])
        single = knn.knn_brute_force(emb, qv, k=4).collect()
        for r in single:
            assert batch[(qid, r["vec_id"])] == r["score"]


def test_hydrate_inner_join_drops_missing(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") != 0)
    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    topk = knn.knn_brute_force(emb, q, k=5)
    out = knn.hydrate(topk, docs).collect()
    ids = {r["vec_id"] for r in out}
    assert 0 not in ids  # missing record dropped, reference semantics
    assert len(out) == 4


def test_metadata_filter(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    filtered = knn.metadata_filter(emb, label=2)
    assert filtered.filter(F.col("label") != 2).count() == 0


def test_range_search_threshold_and_order(spark, sf_dir):
    """Range search returns exactly the rows scoring ≥ τ on the full
    scan, ordered (score desc, id asc), and τ=-1 returns the whole
    corpus (minus nothing: scores lie in [-1, 1])."""
    from pyspark.sql import functions as F

    from local_vectordb_spark.operators import knn
    from local_vectordb_spark.queries import _query_vecs
    from local_vectordb_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vecs(sf_dir)[0][1]
    tau = 0.2
    got = knn.range_search(emb, qv, min_score=tau).collect()
    all_scores = knn.score_all(emb, qv).collect()
    want = sorted(
        [(r.vec_id, r.score) for r in all_scores if r.score >= tau],
        key=lambda t: (-t[1], t[0]),
    )
    assert [(r.vec_id, r.score) for r in got] == want
    assert knn.range_search(emb, qv, min_score=-1.0).count() == emb.count()
