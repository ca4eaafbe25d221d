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
    # Events scale along the TIME axis (r9 verdict #5): replica r is the
    # whole sf0.1 feed shifted r x (span + 1h) later, new event_ids, same
    # users. 10x the rows over 10x the clock is the honest stream-stress
    # shape — a watermarked stream-stream join's live state must track
    # the watermark horizon (KBs), not the feed length, and verbatim
    # replication would instead explode per-timestamp join fan-out
    # (10 views x 10 purchases per pair), which tests skew, not state.
    # Capped at 10 replicas in every tier: past 10x the drain only adds
    # identical micro-batches, not new state behavior.
    ev_reps = min(REPLICAS, 10)
    con.execute(
        f"""
        COPY (
          WITH span AS (
            SELECT max(ts) - min(ts) + INTERVAL 1 HOUR AS w
            FROM read_parquet('{SRC}/events.parquet')
          )
          SELECT e.event_id + r.r * {OFFSET} AS event_id,
                 e.ts + r.r * span.w AS ts,
                 e.user_id, e.event_type, e.value, e.props
          FROM read_parquet('{SRC}/events.parquet') e,
               (SELECT unnest(range(0, {ev_reps})) AS r) r, span
        ) TO '{out}/events.parquet' (FORMAT PARQUET)
        """
    )
    for t in ("documents", "embeddings", "events"):
        n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows -> {out}/{t}.parquet")


if __name__ == "__main__":
    main()
