"""Deterministic sampling, dataset splitting, and sequence packing for
training-data pipelines (north-star ops beyond the reference surface;
the reference has no sampling at all — SURVEY §2.5 gap map).

Design constraints these operators satisfy at 100 TB:

- **Determinism without coordination.** Every operator keys off a
  *content hash of the row key* (md5 hex prefix), never off
  `rand()`/partition ids/row order. The same row lands in the same
  sample/split on every run, on any cluster size, after any
  repartition — which is what makes training-data lineage auditable
  and incremental re-runs append-consistent.
- **Narrow plans.** Sampling and split assignment are pure map-side
  column expressions (codegen'd, no shuffle, no UDF). They compose
  with any downstream operator and the filter pushes into the scan
  when the input is a raw parquet read of a hash-derived column.
- **Cross-engine agreement.** md5 hex is specified byte-for-byte, so
  a lexicographic threshold on the hex prefix (`substr(md5(k),1,4) <
  '1999'` ≈ 10%) reproduces identically in Spark, DuckDB, or any SQL
  engine — the property the oracle checks exploit.

The hex-prefix math: a 4-hex-digit prefix is uniform over [0, 65536);
a threshold string T selects int(T, 16) / 65536 of keys. `_hex4`
converts a fraction to that threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex4(fraction: float) -> str:
    """4-hex-digit threshold selecting ~`fraction` of uniform keys."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return format(min(int(fraction * 65536), 65535), "04x")


def hash_bucket(key: Column) -> Column:
    """Lowercase 4-hex-char md5 prefix of the stringified key — the
    shared deterministic 'coin flip' of every operator in this module."""
    return F.substring(F.md5(key.cast("string")), 1, 4)


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Deterministic ~`fraction` sample: keep rows whose hash bucket
    falls below the threshold.  Unlike `df.sample()` this is stable
    across runs/cluster layouts and is a pure narrow filter.

    fraction >= 1.0 keeps every row (mirrors stratified_sample's
    keep()): the hex threshold caps at 'ffff' and a strict < would
    silently drop the ~1/65536 of keys hashing exactly to it."""
    if fraction >= 1.0:
        _hex4(fraction)  # still validate range (>1.0 raises)
        return df
    return df.filter(hash_bucket(F.col(key_col)) < _hex4(fraction))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-rebalancing op
    (e.g. downsample an over-represented language to 25% while keeping
    low-resource strata whole).  Each stratum gets its own hash
    threshold; strata absent from `fractions` use `default_fraction`.

    Like `hash_sample` this is a pure map-side codegen'd expression
    (CASE over the stratum value, one md5 per row): no shuffle, no
    sampling state, stable under any cluster layout — unlike
    `df.sampleBy()`, whose per-row `rand()` draws differ run to run.
    A fraction >= 1.0 keeps the stratum unfiltered (no hash computed
    semantically; the branch is a constant TRUE).
    """
    bucket = hash_bucket(F.col(key_col))

    def keep(fraction: float) -> Column:
        if fraction >= 1.0:
            return F.lit(True)
        return bucket < F.lit(_hex4(fraction))

    expr = keep(default_fraction)
    for stratum, fraction in reversed(list(fractions.items())):
        expr = F.when(F.col(stratum_col) == F.lit(stratum), keep(fraction)).otherwise(
            expr
        )
    return df.filter(expr)


def temperature_fractions(
    counts: dict[str, int], alpha: float = 0.5
) -> dict[str, float]:
    """Per-stratum keep-rates implementing temperature-based mixture
    rebalancing (multilingual-pretraining style: sampling probability
    ∝ n^α flattens the size distribution; α=1 is proportional, α→0 is
    uniform).  Keeping stratum ℓ with rate (n_min/n_ℓ)^(1-α) yields
    kept sizes ∝ n_ℓ^α while the smallest stratum keeps everything —
    i.e. rebalancing is done purely by *downsampling* the head, never
    by duplicating the tail.

    The counts map is per-stratum (languages, sources) — bounded by
    stratum cardinality, not corpus size, so computing it via a
    groupBy-collect is driver-safe at any scale.  Compose the result
    with :func:`stratified_sample` for the deterministic, shuffle-free
    row filter.
    """
    import math

    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0,1], got {alpha}")
    if not counts:
        return {}
    n_min = min(counts.values())
    exp = 1.0 - alpha
    if exp == 0.5:
        # the oracle twin computes sqrt(); pow(x, 0.5) is not
        # guaranteed bit-identical to sqrt(x) by libm, and a 1-ulp
        # divergence at a floor(rate·2^16) boundary would flip a
        # stratum threshold — call sqrt explicitly so cross-engine
        # parity rests on IEEE-754 correctly-rounded sqrt, not on a
        # pow==sqrt coincidence
        return {s: math.sqrt(n_min / n) for s, n in counts.items()}
    return {s: (n_min / n) ** exp for s, n in counts.items()}


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (e.g. train/val/test) by hash
    bucket.  `weights` are fractions summing to ~1.0; boundaries are
    cumulative thresholds, so the train set of an 80/10/10 split is a
    superset of the train set of a 70/15/15 split — shrinking val/test
    never leaks rows *out* of train (the property that keeps eval sets
    clean across re-splits)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1.0, got {total}")
    bucket = hash_bucket(F.col(key_col))
    names = list(weights)
    expr: Column = F.lit(names[-1])  # last split takes the remainder
    cum = 0.0
    # build CASE from the right so earlier splits take lexicographic
    # precedence: bucket < t1 -> s1; bucket < t2 -> s2; else s3
    cases: list[tuple[str, str]] = []
    for name in names[:-1]:
        cum += weights[name]
        cases.append((_hex4(cum), name))
    for threshold, name in reversed(cases):
        expr = F.when(bucket < F.lit(threshold), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Concatenate-then-chop sequence packing: within each group,
    documents are laid end-to-end in `order_col` order and the token
    stream is cut every `budget` tokens; a document belongs to the pack
    its first token falls in.

    Output: (group, pack_id, n_docs, pack_tokens) — the pack manifest a
    training loader consumes.

    This is the window-function form of packing: one shuffle on the
    group key, then a running sum — O(n) total, no driver loop.  True
    first-fit-decreasing packing is inherently sequential; the
    chop-at-offset relaxation wastes at most one document's tokens per
    boundary and is what large pre-training pipelines actually run,
    because it needs no cross-row iteration.  At 100 TB the group key
    (shard/source) bounds each window partition; a skewed group can be
    pre-split by adding a salt component to `group_col` upstream.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start_offset = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return (
        docs.select(group_col, order_col, tokens_col)
        .withColumn("pack_id", F.floor(start_offset / F.lit(budget)))
        .groupBy(group_col, "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(tokens_col).alias("pack_tokens"),
        )
    )
