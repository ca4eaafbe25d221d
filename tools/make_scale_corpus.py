"""Synthesize the sf1.0 stress corpus (10x sf0.1) for the capped
dedup/ANN scale run.

The driver ships sf0.001/0.01/0.1 only, and the caps' whole point is
degenerate corpora — so the stress corpus is DELIBERATELY degenerate,
not statistically faithful TPC-H: every sf0.1 document is replicated
10x (replica 0 verbatim; replicas 1-9 carry a tiny `r{n} ` prefix, so
each source doc becomes a family of 10 near-duplicates with ~identical
shingle sets — 50k docs whose posting lists and MinHash buckets are
all 10x deeper than anything sf0.1 produces), and every embedding is
replicated 10x VERBATIM (20k vectors, every sign/LSH bucket exactly
10x deeper, massive cosine-1.0 ties). Ids offset by 10M per replica;
vec_id 0 stays a corpus member so the registered queries' driver-side
query-vector lookup works unchanged.

r8 (verdict #4): a second, 100x tier (.scale/sf10 — 500k docs / 200k
vectors, REPLICAS=100) pushes the embeddings corpus past the
graph_lsh_bits knee: graph_lsh_bits(200_000) = 12, so the auto-bits
LSH graph build finally runs OFF the oracle's 4-bit setting and its
sub-quadratic claim is measured, not asserted.

Usage: python tools/make_scale_corpus.py [out_dir] [replicas]
       (defaults .scale/sf1.0, 10; pass `.scale/sf10 100` for the XL tier)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
OFFSET = 10_000_000


def main() -> None:
    global REPLICAS
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", "sf1.0",
    )
    if len(sys.argv) > 2:
        REPLICAS = int(sys.argv[2])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + r.r * {OFFSET} AS doc_id,
                 CASE WHEN r.r = 0 THEN d.text
                      ELSE 'r' || r.r || ' ' || d.text END AS text,
                 d.lang, d.source,
                 length(CASE WHEN r.r = 0 THEN d.text
                             ELSE 'r' || r.r || ' ' || d.text END) AS n_chars
          FROM read_parquet('{SRC}/documents.parquet') d,
               (SELECT unnest(range(0, {REPLICAS})) AS r) r
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + r.r * {OFFSET} AS vec_id, e.embedding, e.label
          FROM read_parquet('{SRC}/embeddings.parquet') e,
               (SELECT unnest(range(0, {REPLICAS})) AS r) r
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    for t in ("documents", "embeddings"):
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows -> {out}/{t}.parquet")


if __name__ == "__main__":
    main()
