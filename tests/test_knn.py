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
