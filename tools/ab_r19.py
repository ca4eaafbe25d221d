"""Paired in-session A/B for r19 optimizations (guide §1; the r18
protocol: variants interleaved in ONE Spark session, best-of-N, with
knn_brute_force as the host fast/slow-phase canary).

Usage: python tools/ab_r19.py <group> [rounds]
Groups: simhash quality beam pq
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from local_vectordb_spark.session import get_spark, load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def beam_old(edges, scored, k, beam, hops, id_col="vec_id", seeds=None):
    """The pre-r19 all-DataFrame traversal, inlined for the A/B."""
    edges = edges.localCheckpoint(eager=True)
    if seeds is None:
        entry = scored.select(F.min(id_col).alias(id_col))
    else:
        entry = seeds.select(F.col(seeds.columns[0]).alias(id_col)).distinct()
    visited = scored.join(F.broadcast(entry), id_col)
    frontier = visited
    for _ in range(hops):
        nbrs = (
            edges.join(
                F.broadcast(frontier.select(F.col(id_col).alias("src"))), "src"
            )
            .select(F.col("dst").alias(id_col))
            .distinct()
            .join(scored, id_col)
        )
        visited = (
            visited.unionByName(nbrs)
            .dropDuplicates([id_col])
            .localCheckpoint(eager=True)
        )
        frontier = visited.orderBy(F.desc("score"), F.asc(id_col)).limit(beam)
    return visited.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def main() -> None:
    group = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab_r19")
    spark.sparkContext.setLogLevel("ERROR")

    from local_vectordb_spark import queries as q
    from local_vectordb_spark.operators import ann, dedup, knn

    variants: dict = {}
    variants["canary"] = lambda: noop(
        q.SPARK_QUERIES["knn_brute_force"](spark, SF_DIR)
    )

    if group == "simhash":
        docs = q._docs_with_exact_dupes(spark, SF_DIR)

        def simhash_pipe(use_arrow: bool):
            from local_vectordb_spark.session import ensure_min_parallelism

            sigs = dedup.simhash_signatures_portable(
                ensure_min_parallelism(docs), use_arrow=use_arrow
            )
            return dedup._simhash_band_pairs(sigs, 3, "doc_id", bits_per_band=15)

        variants["simhash_arrow"] = lambda: noop(simhash_pipe(True))
        variants["simhash_expr"] = lambda: noop(simhash_pipe(False))
    elif group == "quality":
        from local_vectordb_spark.functions import text as T

        docs = load_table(spark, SF_DIR, "documents")
        fast = T.quality_score_batch()
        variants["quality_arrow"] = lambda: noop(
            docs.select("doc_id", fast(F.col("text")).alias("q"))
        )
        variants["quality_expr"] = lambda: noop(
            docs.select("doc_id", T.quality_score(F.col("text")).alias("q"))
        )
    elif group == "beam":
        emb = load_table(spark, SF_DIR, "embeddings")
        qv = q._query_vecs(SF_DIR)[0][1]
        edges = q._lsh_graph_for(spark, SF_DIR)
        scored = knn.score_all(emb, qv)
        variants["beam_new_nockpt"] = lambda: noop(
            ann.graph_beam_search(
                edges, scored, k=10, beam=8, hops=3, checkpoint_edges=False
            )
        )
        variants["beam_new_ckpt"] = lambda: noop(
            ann.graph_beam_search(edges, scored, k=10, beam=8, hops=3)
        )
        variants["beam_old"] = lambda: noop(
            beam_old(edges, scored, k=10, beam=8, hops=3)
        )
        variants["nsw_query"] = lambda: noop(
            q.SPARK_QUERIES["api_search_nsw"](spark, SF_DIR)
        )
    elif group == "pq":
        variants["pq_batch_query"] = lambda: noop(
            q.SPARK_QUERIES["knn_pq_batch"](spark, SF_DIR)
        )
        variants["pq_resid_query"] = lambda: noop(
            q.SPARK_QUERIES["knn_pq_residual_batch_stored"](spark, SF_DIR)
        )
    else:
        raise SystemExit(f"unknown group {group}")

    readings: dict[str, list[float]] = {n: [] for n in variants}
    for fn in variants.values():  # warm-up round, not recorded
        fn()
    for _ in range(rounds):
        for n, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            readings[n].append(round(time.perf_counter() - t0, 3))
    for n, r in readings.items():
        print(f"{n}: best={min(r):.3f} all={r}")


if __name__ == "__main__":
    main()
