"""sf1.0 stress run of the capped dedup + ANN family (VERDICT r5 #6).

The caps (hot-shingle max_df, LSH max_bucket_size) and the blocked/
partition-pruned ANN paths exist for degenerate 100 TB corpora; sf0.1
never stresses them. This runs the family against the synthetic 10x
corpus from tools/make_scale_corpus.py (50k docs all in near-dup
families of 10, 20k vectors with 10-deep exact-duplicate buckets) and
writes BENCH_scale.json. Budget: every query must finish < 120 s on
local[32] with no OOM — the pass criterion, since a cap that does not
bound work would go quadratic on this corpus, not +10x.

Usage: python tools/bench_scale.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import queries  # noqa: E402
from local_vectordb_spark.session import get_spark  # noqa: E402

STRESS = [
    "dedup_minhash_lsh_md5_capped",
    "dedup_ngram_jaccard_capped",
    "dedup_lsh_bucket_audit",
    "knn_graph",  # r6: registry default is now the block-matrix path
    "knn_graph_lsh",  # r7: bucket-local build must beat the blocked one here
    "ivf_sign_pruned",
    "lsh_search_md5",
    "knn_pq_adc",  # r6: ADC scan under massive duplicate-code skew
    "ivf_pq_search",  # r6: pruning x compression composition at 10x
    # r7 (verdict #6): the token-exploding text family — 10x-deep
    # posting lists and repeated shingles are where a degenerate corpus
    # can blow up a shuffle, which sf0.1 never exercises
    "fts_bm25",
    "hybrid_rrf",
    "text_repetition_stats",
    "docs_training_manifest",
]
BUDGET_S = 120.0


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(root, ".scale", "sf1.0")
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(root, "BENCH_scale.json")
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        print(f"no corpus at {sf_dir}; run tools/make_scale_corpus.py first")
        return 2
    spark = get_spark("bench_scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    ok = True
    for name in STRESS:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        dt = round(time.time() - t0, 4)
        timings[name] = dt
        rows[name] = n
        status = "ok" if dt < BUDGET_S else "OVER BUDGET"
        print(f"{name}: {dt:.2f}s, {n} rows [{status}]", flush=True)
        ok = ok and dt < BUDGET_S
    result = {
        "metric": "scale_stress_wall_clock",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "sf": "sf1.0-synthetic-10x-degenerate",
        "corpus": {"documents": 50_000, "embeddings": 20_000},
        "budget_per_query_sec": BUDGET_S,
        "all_within_budget": ok,
        "queries": timings,
        "rows": rows,
    }
    with open(out_json, "w") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    main()
