"""Training-data-pipeline queries: chunking, embedding pooling,
distribution statistics, inter-arrival analytics. All oracle-matched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from local_vectordb_spark.operators.chunking import chunk_documents
from local_vectordb_spark.queries import register
from local_vectordb_spark.session import ensure_min_parallelism, load_table

CHUNK_SIZE, OVERLAP = 50, 10
STRIDE = CHUNK_SIZE - OVERLAP


@register(
    "chunk_documents",
    rf"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x != '') AS toks
      FROM documents WHERE doc_id < 200
    ),
    s AS (
      SELECT doc_id, toks,
             unnest(generate_series(1, greatest(len(toks) - {OVERLAP}, 1), {STRIDE})) AS start
      FROM t
    )
    SELECT doc_id,
           CAST((start - 1) / {STRIDE} AS INT) AS chunk_idx,
           array_to_string(toks[start:start+{CHUNK_SIZE - 1}], ' ') AS chunk_text,
           CAST(len(toks[start:start+{CHUNK_SIZE - 1}]) AS INT) AS n_tokens
    FROM s
    """,
)
def chunk_documents_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document → overlapping token-window chunks (the batch form of
    the reference's Document→Chunk unit). Narrow map, no shuffle."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return chunk_documents(docs, chunk_size=CHUNK_SIZE, overlap=OVERLAP)


@register(
    "embed_pool_by_label",
    """
    SELECT label, pos, ROUND(avg(v), 6) AS avg_val
    FROM (
      SELECT label,
             unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    )
    GROUP BY label, pos
    """,
)
def embed_pool_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise average-pooling of embeddings per label — the
    chunk-embeddings→document-embedding (or class-centroid) primitive.
    posexplode + groupBy(label, pos): one shuffle of (label, pos, val)
    triples; at scale this beats any array-typed aggregation because
    partial averages combine map-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .select("label", (F.col("pos0") + 1).alias("pos"), F.col("v").cast("double"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("v"), 6).alias("avg_val"))
    )


@register(
    "quantiles_order_value",
    """
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders GROUP BY o_orderstatus
    """,
)
def quantiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (Spark `percentile` ==
    DuckDB `quantile_cont` semantics). At 100 TB swap to
    approx_percentile: the exact form needs per-group sorted values,
    the sketch needs O(1/eps) memory and one pass."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        *[
            F.round(F.percentile("o_totalprice", F.lit(q)), 4).alias(name)
            for q, name in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75"), (0.95, "p95")]
        ]
    )


@register(
    "skew_salted_event_counts",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def skew_salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted count (hot keys spread over 16 reducers before
    the final tiny combine) — result-identical to the plain GROUP BY
    the oracle runs; only the shuffle key differs."""
    from local_vectordb_spark.operators.skew import salted_count

    return salted_count(load_table(spark, sf_dir, "events"), ["event_type"])


@register(
    "text_bpe_token_stats",
    r"""
    WITH t AS (
      SELECT source,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe,
             len(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS n_ws
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
           ROUND(avg(n_bpe), 4) AS avg_bpe_tokens,
           ROUND(avg(CAST(n_bpe AS DOUBLE) / n_ws), 4) AS bpe_per_word
    FROM t GROUP BY source
    """,
)
def text_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting with BPE-style pre-tokens (letter/digit
    runs + punctuation singles) next to whitespace words — the
    pre-training 'how many tokens is this corpus' scan, one codegen'd
    pass, identical regex in the oracle."""
    from local_vectordb_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "source",
            T.bpe_token_count(F.col("text")).alias("n_bpe"),
            T.token_count(F.col("text")).alias("n_ws"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.round(F.avg("n_bpe"), 4).alias("avg_bpe_tokens"),
            F.round(F.avg(F.col("n_bpe").cast("double") / F.col("n_ws")), 4).alias(
                "bpe_per_word"
            ),
        )
    )


@register("sketch_distinct_users_daily")
def sketch_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily unique users: HyperLogLog++ sketch next to the exact
    count (rows-only: the sketch estimate is engine-specific; the <2%
    relative-error invariant is asserted in tests/test_sketch.py).
    At 100 TB the sketch is the only viable form — exact distinct
    needs a full shuffle of user ids per day; the sketch merges
    fixed-size registers map-side."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "approx_users",
            "exact_users",
        )
    )


@register(
    "events_interarrival",
    """
    WITH g AS (
      SELECT event_type,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             )) / 1000000.0 AS gap_s
      FROM events
    )
    SELECT event_type,
           CAST(count(gap_s) AS BIGINT) AS n_gaps,
           ROUND(avg(gap_s), 4) AS avg_gap_s,
           ROUND(max(gap_s), 4) AS max_gap_s
    FROM g WHERE gap_s IS NOT NULL
    GROUP BY event_type
    """,
)
def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gaps per (user, event_type) via lag(), aggregated
    per type — the sequential-pattern primitive (session gap tuning,
    rate anomaly detection). One shuffle on the window partition key."""
    from pyspark.sql import Window

    from local_vectordb_spark.functions.timeutil import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = epoch_micros(ev, "ts")
    gap = (us - F.lag(us).over(w)) / 1_000_000.0
    return (
        ev.select("event_type", gap.alias("gap_s"))
        .filter(F.col("gap_s").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.round(F.avg("gap_s"), 4).alias("avg_gap_s"),
            F.round(F.max("gap_s"), 4).alias("max_gap_s"),
        )
    )


@register(
    "text_repetition_stats",
    r"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                         x -> x != '') AS toks
      FROM documents
    ), grams AS (
      SELECT doc_id, toks,
             list_transform(list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
                            s -> s[1] || ' ' || s[2]) AS bigrams
      FROM base
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_words,
           CASE WHEN len(toks) = 0 THEN 0.0
                ELSE ROUND(1.0 - len(list_distinct(toks)) * 1.0 / len(toks), 6)
           END AS dup_word_frac,
           CASE WHEN len(bigrams) = 0 THEN 0.0
                ELSE ROUND(1.0 - len(list_distinct(bigrams)) * 1.0 / len(bigrams), 6)
           END AS dup_bigram_frac,
           CASE WHEN len(bigrams) = 0 THEN 0.0
                ELSE ROUND((SELECT max(c) FROM (SELECT count(*) AS c
                             FROM unnest(grams.bigrams) AS u(g) GROUP BY g)) * 1.0
                           / len(bigrams), 6)
           END AS top_bigram_frac
    FROM grams
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters, one codegen'd scan and
    ZERO shuffles: duplicate-word / duplicate-bigram fraction via
    array_distinct, and the top-bigram occupancy via a sorted-array
    run-length fold (mode frequency without exploding grams). The
    explode→groupBy(doc, gram) formulation would shuffle the full gram
    stream at 100 TB; per-row array expressions keep repetition scoring
    embarrassingly parallel."""
    from local_vectordb_spark.functions import text as T

    # CPU-bound per-row scoring on a 2-split fixture file would pin to
    # 2 cores; no-op at real scale
    docs = ensure_min_parallelism(load_table(spark, sf_dir, "documents"))
    # Staged projections: tokenize once, build bigrams once, THEN score.
    # Feeding text straight into all four metrics would re-tokenize the
    # document per metric — CollapseProject keeps expensive multiply-
    # referenced aliases as separate project stages, so toks/bigrams are
    # materialized once per row here.
    toks = docs.select(
        "doc_id", T.tokens(T.normalize_text(F.col("text"))).alias("toks")
    )
    grams = toks.select("doc_id", "toks", T.ngrams_of(F.col("toks"), 2).alias("bigrams"))
    return grams.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_words"),
        T.dup_frac_of(F.col("toks")).alias("dup_word_frac"),
        T.dup_frac_of(F.col("bigrams")).alias("dup_bigram_frac"),
        T.top_frac_of(F.col("bigrams")).alias("top_bigram_frac"),
    )


@register(
    "text_pii_scrub_audit",
    r"""
    WITH aug AS (
      SELECT source,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com from 10.' || CAST(doc_id % 200 AS VARCHAR)
                  || '.0.1 call +' || CAST(15550100000 + doc_id AS VARCHAR) AS text
      FROM documents
    ), scrubbed AS (
      SELECT source,
             len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS emails,
             len(regexp_extract_all(text, '\b\d{1,3}(\.\d{1,3}){3}\b')) AS ips,
             len(regexp_extract_all(text, '\+\d{7,15}')) AS phones,
             regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g'),
               '\+\d{7,15}', '<PHONE>', 'g') AS clean
      FROM aug
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(emails) AS BIGINT) AS emails,
           CAST(sum(ips) AS BIGINT) AS ips,
           CAST(sum(phones) AS BIGINT) AS phones,
           CAST(sum(len(clean)) AS BIGINT) AS scrubbed_chars
    FROM scrubbed GROUP BY source
    """,
)
def text_pii_scrub_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails / IPv4 / intl phone numbers) with a
    per-source audit. The fixture corpus is synthetic and PII-free, so
    each document is augmented with one deterministic instance of each
    kind — identically in the oracle — making the scrub regexes and
    replacement semantics value-checked, not just count-checked
    (scrubbed_chars hashes the post-replacement lengths). The scrub
    itself is a 3-deep regexp_replace chain: one codegen'd scan, no
    Python, no shuffle before the tiny per-source aggregate."""
    from local_vectordb_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "source",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com from 10."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".0.1 call +"),
            (F.lit(15550100000) + F.col("doc_id")).cast("string"),
        ).alias("text"),
    )
    counts = T.pii_counts(F.col("text"))
    return (
        aug.select(
            "source",
            counts["emails"].alias("emails"),
            counts["ips"].alias("ips"),
            counts["phones"].alias("phones"),
            F.length(T.scrub_pii(F.col("text"))).cast("long").alias("clean_len"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("emails").alias("emails"),
            F.sum("ips").alias("ips"),
            F.sum("phones").alias("phones"),
            F.sum("clean_len").alias("scrubbed_chars"),
        )
    )


@register(
    "events_partition_pruned_scan",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           ROUND(sum(value), 2) AS sum_value
    FROM events
    WHERE event_type = 'click'
    GROUP BY 1
    """,
)
def events_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily click totals read from a hive-partitioned copy of events
    (partitioned by event_type): the event_type predicate prunes whole
    partition DIRECTORIES at planning time — PartitionFilters, not just
    row-group pushdown — so the scan never opens the other types'
    files. This is the layout tier a 100 TB events table runs on; the
    oracle computes the same aggregate from the unpartitioned table,
    proving layout changes nothing about results."""
    import os

    from local_vectordb_spark.sources import partitioned as P

    from local_vectordb_spark.session import fixture_cache_dir, materialize_once

    out = os.path.join(fixture_cache_dir(sf_dir, "events"), "events_by_type")
    materialize_once(
        out,
        lambda p: P.write_partitioned(
            load_table(spark, sf_dir, "events"), p, ["event_type"]
        ),
    )
    ev = P.read_partitioned(spark, out).filter(F.col("event_type") == "click")
    return (
        ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "events_retention_cohorts",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    cohorts AS (
      SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
    )
    SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', c.cohort_day, d.day) AS INT) AS day_offset,
           CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
    FROM days d JOIN cohorts c USING (user_id)
    WHERE date_diff('day', c.cohort_day, d.day) BETWEEN 0 AND 7
    GROUP BY c.cohort_day, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, activity
    counted per day-offset 0..7 — the standard engagement matrix. Two
    shuffles (distinct user-days, then the cohort join aggregates);
    the cohort table is per-user and broadcastable at any corpus size
    where users fit a dim table, and the offset bound keeps the
    output O(days x 8)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    cohorts = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    off = F.datediff(F.col("day"), F.col("cohort_day"))
    return (
        days.join(cohorts, "user_id")
        .filter((off >= 0) & (off <= 7))
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            off.cast("int").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@register(
    "docs_zipf_token_freq",
    r"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')) AS token
      FROM documents
    ),
    freq AS (SELECT token, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY token)
    SELECT token, freq, CAST(rank AS INT) AS rank FROM (
      SELECT token, freq,
             row_number() OVER (ORDER BY freq DESC, token ASC) AS rank
      FROM freq
    ) WHERE rank <= 50
    """,
)
def docs_zipf_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-frequency head (the Zipf curve's top 50): explode →
    count → global rank. The groupBy is map-side-combined (hot tokens
    collapse before the shuffle) and the final rank runs over the
    already-tiny distinct-token aggregate, so the single-partition
    window never sees raw tokens — the corpus-stats primitive behind
    vocabulary builds and stopword lists."""
    from local_vectordb_spark.functions.text import tokens as toks_fn

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(toks_fn(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("freq"), F.asc("token"))
    return (
        freq.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 50)
        .select("token", "freq", "rank")
    )


@register(
    "events_session_funnel",
    """
    WITH firsts AS (
      SELECT user_id,
             min(ts) FILTER (event_type = 'view') AS t_view,
             min(ts) FILTER (event_type = 'click') AS t_click,
             min(ts) FILTER (event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(t_view) AS BIGINT) AS n_view,
           CAST(count(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT) AS n_view_click,
           CAST(count(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END) AS BIGINT)
             AS n_view_click_purchase
    FROM firsts
    """,
)
def events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): per user, the first
    occurrence of each stage, counted only when stages happen IN ORDER
    — the product-analytics sequence-matching primitive. One
    conditional-aggregation shuffle on user_id; no self-joins, no
    per-stage scans, so the plan is a single pass however many stages
    the funnel has."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    ordered_click = F.col("t_click") > F.col("t_view")
    ordered_purchase = ordered_click & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count(F.when(ordered_click, 1)).alias("n_view_click"),
        F.count(F.when(ordered_purchase, 1)).alias("n_view_click_purchase"),
    )


@register(
    "events_error_burst_windows",
    """
    WITH b AS (
      SELECT CAST(floor(epoch_us(ts) / 21600000000) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_errors
      FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT strftime(make_timestamp(bucket * 21600000000), '%Y-%m-%d %H:%M:%S') AS window_start,
           n_errors,
           ROUND(n_errors / avg(n_errors) OVER (), 4) AS vs_avg
    FROM b QUALIFY n_errors > 1.15 * avg(n_errors) OVER ()
    """,
)
def events_error_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-burst detection: 6-hour tumbling buckets whose error count
    exceeds 1.15x the corpus-wide bucket average — a RELATIVE threshold,
    so the query is scale-free (the same plan flags the same bursts at
    any sf). Buckets come from epoch arithmetic (timeutil.epoch_micros,
    identical in both engines); the global average is an empty-frame
    window over the already-aggregated buckets (120 rows), not the raw
    events."""
    from pyspark.sql import Window

    from local_vectordb_spark.functions.timeutil import epoch_micros

    ev = load_table(spark, sf_dir, "events")
    b = (
        ev.filter(F.col("event_type") == "error")
        .select(F.floor(epoch_micros(ev, "ts") / 21_600_000_000).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_errors"))
    )
    avg_all = F.avg("n_errors").over(Window.partitionBy())
    return (
        b.withColumn("_avg", avg_all)
        .filter(F.col("n_errors") > 1.15 * F.col("_avg"))
        .select(
            F.date_format(
                F.timestamp_seconds(F.col("bucket") * 21600), "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
            "n_errors",
            F.round(F.col("n_errors") / F.col("_avg"), 4).alias("vs_avg"),
        )
    )


@register(
    "docs_quality_quantiles",
    r"""
    WITH q AS (
      SELECT source,
             ROUND((
               least(len(list_filter(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'), x -> x != '')) / 100.0, 1.0)
               + least(5.0 * (len(list_filter(string_split_regex(lower(text), '\s+'), x -> list_contains(['the','a','of','and','is','in','to','it'], x)))
                       * 1.0 / greatest(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')), 1)), 1.0)
               + greatest(0.0, 1.0 - 5.0 * (length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) * 1.0 / length(text)))
             ) / 3.0, 6) AS quality
      FROM documents WHERE length(text) > 0
    )
    SELECT source,
           ROUND(quantile_cont(quality, 0.1), 6) AS p10,
           ROUND(quantile_cont(quality, 0.5), 6) AS p50,
           ROUND(quantile_cont(quality, 0.9), 6) AS p90
    FROM q GROUP BY source
    """,
)
def docs_quality_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score distribution per source (p10/p50/p90 of the
    composite heuristic) — the filter-threshold-tuning scan run before
    choosing a corpus quality cutoff. Quality is rounded to 6dp BEFORE
    the quantile on both engines, so interpolation happens over
    identical inputs."""
    from local_vectordb_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    # Arrow quality kernel (r19): value-identical, parity-pinned
    q = docs.select(
        "source", T.quality_score_batch()(F.col("text")).alias("quality")
    )
    return q.groupBy("source").agg(
        F.round(F.percentile("quality", F.lit(0.1)), 6).alias("p10"),
        F.round(F.percentile("quality", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("quality", F.lit(0.9)), 6).alias("p90"),
    )
