r"""Training-data curation surface: deterministic sampling and
train/val/test splitting, sequence packing, denylist scrubbing, and
benchmark decontamination — plus the TPC-H Q15 argmax-over-aggregate
shape. All oracle-matched.

These extend the reference's capability set the way a 100 TB
pre-training pipeline needs (SURVEY §2.5 north-star ops): the reference
stores documents and chunks; curating them into a training set needs
reproducible sampling, leakage-free splits, packing into fixed token
budgets, and removal of eval-set contamination. Determinism everywhere
comes from content hashes (md5 hex prefixes), never from `rand()` —
see operators/sampling.py for the full rationale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from local_vectordb_spark.functions import text as T
from local_vectordb_spark.operators import dedup
from local_vectordb_spark.operators.sampling import (
    hash_sample,
    hash_split,
    pack_sequences,
    stratified_sample,
    temperature_fractions,
)
from local_vectordb_spark.queries import ORACLE_SQL, register
from local_vectordb_spark.session import load_table


# --------------------------------------------------------------------------
# Deterministic ~10% sample of the fact table (narrow, shuffle-free)
# --------------------------------------------------------------------------


@register(
    "sample_hash_10pct",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
           ROUND(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                     CAST(l_linenumber AS VARCHAR)), 1, 4) < '1999'
    """,
)
def sample_hash_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic row sample of lineitem keyed on the composite
    primary key, then aggregated (the sample→estimate pattern). The
    filter is a pure map-side expression: same rows selected on every
    run and every engine, unlike `df.sample()`. 0x1999/0x10000 ≈ 9.99%.
    """
    l = load_table(spark, sf_dir, "lineitem").withColumn(
        "_k", F.concat_ws("-", "l_orderkey", "l_linenumber")
    )
    return hash_sample(l, "_k", 0.1).agg(
        F.count("*").alias("n_rows"),
        F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


# --------------------------------------------------------------------------
# Deterministic training-order shuffle (seeded hash rank, layout-free)
# --------------------------------------------------------------------------


@register(
    "docs_shuffle_order",
    """
    SELECT doc_id,
           CAST(row_number() OVER (
             ORDER BY md5('shuffle-v1:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS shuffle_pos
    FROM documents
    WHERE doc_id < 200
    """,
)
def docs_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: position = rank of
    md5(seed || doc_id) — the epoch-shuffle every training launch
    needs, as a pure expression. Unlike `df.orderBy(rand())` the
    permutation is (a) identical across runs, engines, and physical
    layouts (resumable training, reproducible ablations), (b)
    re-seedable per epoch by changing the seed string, and (c) a
    single range-partitioned sort at scale — no driver state. The id
    tiebreak guards the (improbable) md5 collision so the rank is
    total. Capped at 200 docs here only to keep the fixture output
    small; the plan is corpus-size-independent."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    w = Window.orderBy(
        F.md5(F.concat(F.lit("shuffle-v1:"), F.col("doc_id").cast("string"))),
        F.col("doc_id"),
    )
    return docs.select(
        "doc_id", F.row_number().over(w).cast("bigint").alias("shuffle_pos")
    )


# --------------------------------------------------------------------------
# Stratified rebalancing sample (per-stratum hash thresholds, no shuffle)
# --------------------------------------------------------------------------


@register(
    "sample_stratified_by_lang",
    """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE CASE
            WHEN lang = 'en'
              THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
            WHEN lang = 'fr'
              THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
            ELSE TRUE
          END
    GROUP BY lang
    """,
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rebalancing: deterministically downsample over-represented
    languages (en→25%, fr→50%) while keeping low-resource strata whole,
    then report the resulting per-language mix. The stratum CASE plus
    md5 threshold is one codegen'd map-side filter — no shuffle, no
    sampling state, identical selection on every run/engine (unlike
    `df.sampleBy()` whose rand() draws are layout-dependent)."""
    docs = load_table(spark, sf_dir, "documents")
    sampled = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.25, "fr": 0.5}, default_fraction=1.0
    )
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# Temperature-based mixture rebalancing (keep-rate ∝ n^(α-1), head-only
# downsampling — the multilingual-pretraining mixing op)
# --------------------------------------------------------------------------


@register(
    "sample_temperature_by_lang",
    """
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT min(n) AS n_min FROM c),
    thr AS (
      SELECT lang, n,
             ROUND(sqrt(CAST(n_min AS DOUBLE) / n), 6) AS keep_rate,
             printf('%04x',
                    CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n) * 65536) AS INT)
             ) AS t,
             n = n_min AS keep_all
      FROM c, m
    ),
    kept AS (
      SELECT d.lang
      FROM documents d JOIN thr ON d.lang = thr.lang
      WHERE keep_all
         OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < t
    )
    SELECT thr.lang, CAST(thr.n AS BIGINT) AS n_docs, thr.keep_rate,
           CAST(count(k.lang) AS BIGINT) AS n_kept
    FROM thr LEFT JOIN kept k ON thr.lang = k.lang
    GROUP BY thr.lang, thr.n, thr.keep_rate
    """,
)
def sample_temperature_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixing (α=0.5): per-language keep-rate (n_min/n)^0.5
    flattens the language distribution the way multilingual
    pre-training mixes sources — kept sizes ∝ n^α, the smallest
    language keeps everything, and rebalancing only ever DOWNSAMPLES
    the head (no duplication). Two scans total: a per-stratum count
    (stratum-cardinality driver collect, bounded by #languages at any
    corpus scale) and one shuffle-free md5-threshold filter; the final
    report aggregates kept rows per language.

    Oracle note: keep-rate is sqrt(n_min/n) on both engines; both
    libms round sqrt correctly, and a rate of exactly 1.0 keeps the
    stratum unfiltered on both sides (no 'ffff'-threshold edge loss).
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    fractions = temperature_fractions(counts, alpha=0.5)
    sampled = stratified_sample(docs, "doc_id", "lang", fractions)
    kept = sampled.groupBy("lang").agg(F.count("*").alias("n_kept"))
    from local_vectordb_spark.session import local_rows_df

    meta = local_rows_df(
        spark,
        [
            (lang, int(n), round(fractions[lang], 6))
            for lang, n in counts.items()
        ],
        "lang string, n_docs long, keep_rate double",
    )
    return (
        F.broadcast(meta)
        .join(kept, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "keep_rate",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
    )


# --------------------------------------------------------------------------
# Leakage-free train/val/test split (hash-threshold CASE, no shuffle)
# --------------------------------------------------------------------------


@register(
    "split_train_val_test",
    """
    WITH s AS (
      SELECT n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
                    THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY split
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 document split by content-hash threshold. Cumulative
    thresholds (0xcccc≈80%, 0xe666≈90%) mean shrinking val/test never
    moves a row out of train — re-splits can't leak eval docs into
    training. Assignment is a codegen'd CASE, one tiny final agg."""
    docs = load_table(spark, sf_dir, "documents")
    split = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    return split.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


def _register_split_group_aware() -> None:
    """Oracle = the (already oracle-matched) recursive-CTE components
    query nested as a CTE, left-joined back to the doctored corpus,
    with the identical md5-threshold CASE keyed on the FAMILY id."""
    from local_vectordb_spark.queries import _NEAR_DUPES_SQL

    comp_sql = ORACLE_SQL["dedup_components"]
    case = """CASE WHEN substr(md5(CAST(family_id AS VARCHAR)), 1, 4) < 'cccc'
                    THEN 'train'
                  WHEN substr(md5(CAST(family_id AS VARCHAR)), 1, 4) < 'e666'
                    THEN 'val'
                  ELSE 'test' END"""
    sql = f"""
    WITH all_docs AS ({_NEAR_DUPES_SQL}),
    comp AS ({comp_sql}),
    fam AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS family_id
      FROM all_docs d LEFT JOIN comp c ON c.node = d.doc_id
    )
    SELECT doc_id, family_id, {case} AS split FROM fam
    """

    @register("split_group_aware", sql)
    def split_group_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
        """GROUP-AWARE train/val/test split: the hash coin is flipped on
        the near-dup FAMILY id (the component's canonical id; singletons
        are their own family), so every member of a duplicate family
        lands in the same split. A per-document split over a corpus with
        near-duplicates leaks eval content into training — the model
        'memorizes' the test set through its train-side twins — which is
        exactly the failure the document-level split above cannot rule
        out. Runs over the doctored near-dup corpus so real families
        exist to co-travel. Plan: the pair→component propagation (one
        bounded join round per graph diameter), a left join of the tiny
        component map onto the corpus (AQE broadcasts it), then the
        same codegen'd CASE as hash_split — no extra shuffle beyond the
        components build. Fully value-oracled per document."""
        from local_vectordb_spark.queries import SPARK_QUERIES, _docs_with_near_dupes

        comps = SPARK_QUERIES["dedup_components"](spark, sf_dir)
        docs = _docs_with_near_dupes(spark, sf_dir).select("doc_id")
        fam = docs.join(
            comps.withColumnRenamed("node", "doc_id"), "doc_id", "left"
        ).select(
            "doc_id", F.coalesce("component", "doc_id").alias("family_id")
        )
        return hash_split(
            fam, "family_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).select("doc_id", "family_id", "split")


_register_split_group_aware()


def _register_split_group_aware_lsh() -> None:
    """Oracle: the md5-portable banding CTEs (shared verbatim with
    dedup_minhash_lsh_md5_capped's oracle), bucket-min STAR edges, a
    recursive-CTE closure, then the identical family-keyed md5 CASE."""
    from local_vectordb_spark.queries import _MINHASH_MD5_SIG_SQL, _NEAR_DUPES_SQL

    case = """CASE WHEN substr(md5(CAST(family_id AS VARCHAR)), 1, 4) < 'cccc'
                    THEN 'train'
                  WHEN substr(md5(CAST(family_id AS VARCHAR)), 1, 4) < 'e666'
                    THEN 'val'
                  ELSE 'test' END"""
    sql = rf"""
    WITH RECURSIVE all_docs AS ({_NEAR_DUPES_SQL}),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'),
                         x -> x != '') AS t
      FROM all_docs
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
                           i -> array_to_string(list_slice(t, i + 1, i + 3), ' '))) AS s
      FROM toks
    ),
    sig AS (SELECT doc_id, [{_MINHASH_MD5_SIG_SQL}] AS sig FROM sh),
    banded AS (
      SELECT doc_id, b.band,
             md5(array_to_string(sig[b.band * 4 + 1 : b.band * 4 + 4], '|')) AS bh
      FROM sig, (SELECT unnest(range(0, 4)) AS band) b
    ),
    hubs AS (SELECT band, bh, min(doc_id) AS hub FROM banded GROUP BY band, bh),
    edges0 AS (
      SELECT b.doc_id AS s, h.hub AS d
      FROM banded b JOIN hubs h USING (band, bh)
      WHERE b.doc_id != h.hub
    ),
    edges AS (SELECT s, d FROM edges0 UNION SELECT d, s FROM edges0),
    nodes AS (SELECT doc_id AS node FROM all_docs),
    reach(node, anc) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.d, r.anc FROM reach r JOIN edges e ON e.s = r.node
    ),
    fam AS (SELECT node AS doc_id, min(anc) AS family_id FROM reach GROUP BY node)
    SELECT doc_id, family_id, {case} AS split FROM fam
    """

    @register("split_group_aware_lsh", sql)
    def split_group_aware_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
        """GROUP-AWARE split, 100 TB PAIR SOURCE (r9 verdict #5): the
        all-pairs n-gram composition behind `split_group_aware` is
        quadratic in family depth (a 100-deep family is C(100,2)=4950
        pairs — measured OOM at the 500k-doc/100-deep stress tier), so
        the scale path links each LSH bucket member to the bucket's
        MINIMUM id instead: O(size) STAR edges per (band, band-hash)
        bucket, n_docs x n_bands edges total, corpus-LINEAR with no
        bucket cap and therefore no dropped family members (the cap
        the pair form needs for skew is exactly what would leak a
        split). Any two docs sharing a bucket stay connected through
        the hub, so components — and the splits keyed on them — match
        the pair form's wherever both connect, and over-merge (never
        under-merge) on band collisions: the conservative direction
        for leakage. Same min-label propagation (O(diameter) shuffles;
        hubs halve the diameter vs pair chains), same family-keyed md5
        CASE; fully value-oracled per document via the md5-portable
        banding."""
        from pyspark.sql.window import Window

        from local_vectordb_spark.queries import _docs_with_near_dupes

        docs = _docs_with_near_dupes(spark, sf_dir)
        banded = dedup.minhash_banded_portable(docs)
        hub = F.min("doc_id").over(Window.partitionBy("band", "bh"))
        edges = (
            banded.select("doc_id", hub.alias("hub"))
            .filter(F.col("doc_id") != F.col("hub"))
            .select(F.col("doc_id").alias("a_id"), F.col("hub").alias("b_id"))
            .distinct()
        )
        comps = dedup.connected_components(edges, nodes=docs.select("doc_id"))
        fam = docs.select("doc_id").join(
            comps.withColumnRenamed("node", "doc_id"), "doc_id", "left"
        ).select(
            "doc_id", F.coalesce("component", "doc_id").alias("family_id")
        )
        return hash_split(
            fam, "family_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).select("doc_id", "family_id", "split")


_register_split_group_aware_lsh()


def _register_manifest_leakage_safe() -> None:
    """Oracle: the LSH-family CTEs (verbatim from split_group_aware_lsh,
    computed over the FULL doctored corpus — families must be assigned
    before any filtering or a filtered-out twin would silently decouple
    its survivor), the text_quality 3-term formula inlined over the
    same corpus, exact-dedup keep-lowest, family-keyed md5 split, and
    the per-(split, lang) accounting; lang rides the base document id
    (a doctored copy inherits its original's language)."""
    from local_vectordb_spark.queries import _MINHASH_MD5_SIG_SQL, _NEAR_DUPES_SQL

    sql = rf"""
    WITH RECURSIVE all_docs AS ({_NEAR_DUPES_SQL}),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'),
                         x -> x != '') AS t
      FROM all_docs
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(0, greatest(len(t) - 3, 0) + 1),
                           i -> array_to_string(list_slice(t, i + 1, i + 3), ' '))) AS s
      FROM toks
    ),
    sig AS (SELECT doc_id, [{_MINHASH_MD5_SIG_SQL}] AS sig FROM sh),
    banded AS (
      SELECT doc_id, b.band,
             md5(array_to_string(sig[b.band * 4 + 1 : b.band * 4 + 4], '|')) AS bh
      FROM sig, (SELECT unnest(range(0, 4)) AS band) b
    ),
    hubs AS (SELECT band, bh, min(doc_id) AS hub FROM banded GROUP BY band, bh),
    edges0 AS (
      SELECT b.doc_id AS s, h.hub AS d
      FROM banded b JOIN hubs h USING (band, bh)
      WHERE b.doc_id != h.hub
    ),
    edges AS (SELECT s, d FROM edges0 UNION SELECT d, s FROM edges0),
    nodes AS (SELECT doc_id AS node FROM all_docs),
    reach(node, anc) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.d, r.anc FROM reach r JOIN edges e ON e.s = r.node
    ),
    fam AS (SELECT node AS doc_id, min(anc) AS family_id FROM reach GROUP BY node),
    tq AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS qtoks,
             CAST(length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) AS DOUBLE)
               / length(text) AS punct_ratio
      FROM all_docs
    ),
    qs AS (
      SELECT doc_id,
             ROUND((least(CAST(len(qtoks) AS DOUBLE) / 100.0, 1.0)
               + least(CAST(len(list_filter(qtoks, x -> list_contains(
                     ['the','a','of','and','is','in','to','it'], x))) AS DOUBLE)
                   / len(qtoks) * 5.0, 1.0)
               + greatest(0.0, 1.0 - punct_ratio * 5.0)) / 3.0, 6) AS quality
      FROM tq
    ),
    filt AS (
      SELECT a.doc_id, a.text, d.lang
      FROM all_docs a
      JOIN documents d
        ON d.doc_id = CASE WHEN a.doc_id >= 1000000
                           THEN a.doc_id - 1000000 ELSE a.doc_id END
      JOIN qs ON qs.doc_id = a.doc_id
      WHERE qs.quality >= 0.5
    ),
    kept AS (
      SELECT doc_id, lang, text FROM (
        SELECT *, row_number() OVER (
          PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
          ORDER BY doc_id
        ) AS rn
        FROM filt
      ) WHERE rn = 1
    ),
    s AS (
      SELECT k.lang,
             len(list_filter(string_split_regex(k.text, '\s+'), x -> x != ''))
               AS n_tokens,
             CASE WHEN substr(md5(CAST(f.family_id AS VARCHAR)), 1, 4) < 'cccc'
                    THEN 'train'
                  WHEN substr(md5(CAST(f.family_id AS VARCHAR)), 1, 4) < 'e666'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM kept k JOIN fam f ON f.doc_id = k.doc_id
    )
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM s GROUP BY split, lang
    """

    @register("docs_training_manifest_leakage_safe", sql)
    def docs_training_manifest_leakage_safe(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """The curation funnel with the leakage hole CLOSED: the plain
        manifest splits per-DOCUMENT, so a near-dup family can straddle
        train and eval — eval members get memorized through their
        train-side twins. This funnel assigns the split on the LSH
        FAMILY id (star-edge components over the FULL corpus, computed
        BEFORE quality filtering and exact dedup — a family must keep
        one identity even when some members are filtered away), then
        quality-filters, exact-dedups keeping the lowest id, and
        accounts per (split, lang). Every stage is the scale path:
        corpus-linear star edges, O(diameter) propagation, one dedup
        shuffle, map-side split. Fully value-oracled."""
        from pyspark.sql import Window

        from local_vectordb_spark.queries import SPARK_QUERIES, _docs_with_near_dupes

        fam = (
            SPARK_QUERIES["split_group_aware_lsh"](spark, sf_dir)
            .select("doc_id", "family_id")
        )
        docs = _docs_with_near_dupes(spark, sf_dir)
        lang = load_table(spark, sf_dir, "documents").select(
            F.col("doc_id").alias("base_id"), "lang"
        )
        corpus = docs.withColumn(
            "base_id",
            F.when(
                F.col("doc_id") >= 1_000_000, F.col("doc_id") - 1_000_000
            ).otherwise(F.col("doc_id")),
        ).join(lang, "base_id")
        # Arrow quality kernel (r19), applied directly in the filter —
        # quality is not referenced downstream, and a withColumn +
        # filter pair would evaluate the (now opaque) kernel twice
        # when the optimizer pushes the filter below the projection
        # (guide §4.4)
        filt = corpus.filter(
            T.quality_score_batch()(F.col("text")) >= 0.5
        )
        fp = filt.withColumn("f", T.fingerprint(F.col("text")))
        w = Window.partitionBy("f").orderBy("doc_id")
        kept = fp.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") == 1
        )
        split = hash_split(
            kept.join(fam, "doc_id"),
            "family_id",
            {"train": 0.8, "val": 0.1, "test": 0.1},
        )
        return split.groupBy("split", "lang").agg(
            F.count("*").alias("n_docs"),
            F.sum(T.token_count(F.col("text"))).alias("total_tokens"),
        )


_register_manifest_leakage_safe()


# --------------------------------------------------------------------------
# Sequence packing into fixed token budgets (window cumsum, one shuffle)
# --------------------------------------------------------------------------

PACK_BUDGET = 512


@register(
    "pack_token_budget",
    rf"""
    WITH t AS (
      SELECT source, doc_id,
             len(list_filter(string_split_regex(text, '\s+'), x -> x != ''))
               AS n_tokens
      FROM documents
    ),
    s AS (
      SELECT source, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
               AS start_offset
      FROM t
    )
    SELECT source,
           CAST(floor(start_offset / {PACK_BUDGET}) AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
    FROM s GROUP BY source, pack_id
    """,
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-then-chop packing of documents into 512-token packs
    per source (the manifest a training loader consumes). One shuffle
    on the group key + a running-sum window; see
    operators/sampling.py::pack_sequences for the scale rationale."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", T.token_count(F.col("text")).alias("n_tokens")
    )
    return pack_sequences(docs, PACK_BUDGET)


# --------------------------------------------------------------------------
# Denylist / PII scrubbing (pure regex map, pushdown-friendly)
# --------------------------------------------------------------------------

DENYLIST_PATTERN = r"\b(customer|key)\b"
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


@register(
    "text_scrub_denylist",
    rf"""
    WITH t AS (
      SELECT source,
             len(regexp_extract_all(text, '{DENYLIST_PATTERN}')) AS n_hits,
             len(regexp_extract_all(text, '{EMAIL_PATTERN}')) AS n_email,
             length(regexp_replace(text, '{DENYLIST_PATTERN}', '[REDACTED]', 'g'))
               AS scrubbed_len
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_hits) AS BIGINT) AS total_hits,
           CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_hits,
           CAST(sum(n_email) AS BIGINT) AS total_email_hits,
           CAST(sum(scrubbed_len) AS BIGINT) AS total_scrubbed_chars
    FROM t GROUP BY source
    """,
)
def text_scrub_denylist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitive-term redaction accounting: denylist-term hits, the
    post-redaction character volume, and an email-PII detector (regex
    chosen from the RE2∩Java-regex portable subset so the oracle
    tokenizes identically). Pure codegen'd scan — the shape of every
    PII pass over a 100 TB corpus; swap the pattern for the real
    PII regexes in production."""
    docs = load_table(spark, sf_dir, "documents")
    n_hits = F.size(F.regexp_extract_all(F.col("text"), F.lit(DENYLIST_PATTERN), 0))
    n_email = F.size(F.regexp_extract_all(F.col("text"), F.lit(EMAIL_PATTERN), 0))
    scrubbed_len = F.length(
        F.regexp_replace(F.col("text"), DENYLIST_PATTERN, "[REDACTED]")
    )
    return (
        docs.select(
            "source",
            n_hits.alias("n_hits"),
            n_email.alias("n_email"),
            scrubbed_len.alias("scrubbed_len"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_hits").cast("bigint").alias("total_hits"),
            F.sum((F.col("n_hits") > 0).cast("int"))
            .cast("bigint")
            .alias("docs_with_hits"),
            F.sum("n_email").cast("bigint").alias("total_email_hits"),
            F.sum("scrubbed_len").cast("bigint").alias("total_scrubbed_chars"),
        )
    )


# --------------------------------------------------------------------------
# Benchmark decontamination (broadcast n-gram semi-join)
# --------------------------------------------------------------------------

DECONTAM_N = 8


@register(
    "decontam_ngram_overlap",
    rf"""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+'),
               x -> x != '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               range(0, greatest(len(t) - {DECONTAM_N}, 0) + 1),
               i -> array_to_string(list_slice(t, i + 1, i + {DECONTAM_N}), ' '))))
               AS gram
      FROM toks
    ),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
    corpus AS (
      SELECT DISTINCT doc_id, source FROM grams WHERE doc_id % 97 != 0
    ),
    contaminated AS (
      SELECT DISTINCT g.doc_id
      FROM grams g JOIN bench b USING (gram)
      WHERE g.doc_id % 97 != 0
    )
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN ct.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated
    FROM corpus c LEFT JOIN contaminated ct ON c.doc_id = ct.doc_id
    GROUP BY c.source
    """,
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: docs with doc_id % 97 == 0 stand in
    for a benchmark suite; any other doc sharing a word 8-gram with
    them is flagged. The benchmark gram set broadcasts (eval suites
    are tiny next to the corpus), so the corpus side never shuffles —
    see operators/dedup.py::ngram_contamination."""
    docs = load_table(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    flagged = dedup.ngram_contamination(corpus, benchmark, n=DECONTAM_N).withColumn(
        "flag", F.lit(1)
    )
    return (
        corpus.select("doc_id", "source")
        .join(flagged, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce(F.col("flag"), F.lit(0)))
            .cast("bigint")
            .alias("n_contaminated"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q15 shape: argmax over an aggregate (scalar-subquery max)
# --------------------------------------------------------------------------


@register(
    "tpch_q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, ROUND(total_rev, 2) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue (TPC-H Q15 shape, inlined
    view). Plan: one groupBy shuffle builds the per-supplier revenue;
    the max is a single-row agg broadcast back for the filter; the
    winner set (≈1 row after the max filter) joins the supplier dim —
    no hard hint on supplier (SF-linear); AQE broadcasts the tiny
    winner side at runtime. The fact table is scanned
    once — the revenue aggregate is reused for both the max and the
    final filter via a cached single-pass DataFrame."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_rev"
            )
        )
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev == mx._mx)
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Time-series joins: as-of and banded range join (operators/asof.py)
# --------------------------------------------------------------------------


@register(
    "events_asof_last_view",
    """
    SELECT p.event_id, p.user_id,
           ROUND(p.value, 2) AS purchase_value,
           ROUND(v.value, 2) AS last_view_value,
           v.ts AS last_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT user_id, ts, value FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def events_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase picks up the value and time
    of the same user's most recent prior view (the attribution
    primitive). Implemented as union + carry-forward window — one
    shuffle on user_id, no range-condition nested loop; the oracle is
    DuckDB's native ASOF JOIN."""
    from local_vectordb_spark.operators.asof import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 2).alias("purchase_value")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    out = asof_join_backward(
        purchases, views, "ts", ["user_id"], ["value", "ts"]
    )
    return out.select(
        "event_id",
        "user_id",
        "purchase_value",
        F.round("value_asof", 2).alias("last_view_value"),
        F.col("ts_asof").alias("last_view_ts"),
    )


@register(
    "events_band_clicks_near_errors",
    """
    SELECT e.event_id, e.user_id,
           CAST(count(c.ts) AS BIGINT) AS n_clicks_60s
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id
     AND abs(epoch_us(e.ts) - epoch_us(c.ts)) <= 60000000
    GROUP BY e.event_id, e.user_id
    """,
)
def events_band_clicks_near_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded time-range join: clicks within ±60 s of each error for
    the same user. The oracle states the naive inequality join; the
    Spark plan is the scalable bucket rewrite (explode into 3
    tolerance-sized cells → equi-join → exact band filter), which
    shuffles hash-partitioned instead of nested-looping."""
    from local_vectordb_spark.operators.asof import band_join_count

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    return band_join_count(
        errors, clicks, "ts", ["user_id"], 60, "n_clicks_60s",
        unique_key="event_id",
    ).select("event_id", "user_id", "n_clicks_60s")


# --------------------------------------------------------------------------
# End-to-end curation manifest: quality-filter → exact-dedup → split →
# per-(split, lang) corpus accounting, as ONE declarative plan
# --------------------------------------------------------------------------


def _register_training_manifest() -> None:
    quality_sql = ORACLE_SQL["text_quality"]
    sql = rf"""
    WITH q AS ({quality_sql}),
    filt AS (
      SELECT d.doc_id, d.lang, d.text
      FROM documents d JOIN q ON q.doc_id = d.doc_id
      WHERE q.quality >= 0.5
    ),
    fp AS (
      SELECT doc_id, lang, text,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
      FROM filt
    ),
    kept AS (
      SELECT doc_id, lang, text FROM (
        SELECT *, row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn
        FROM fp
      ) WHERE rn = 1
    ),
    s AS (
      SELECT lang,
             len(list_filter(string_split_regex(text, '\s+'), x -> x != ''))
               AS n_tokens,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
                    THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM kept
    )
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM s GROUP BY split, lang
    """

    @register("docs_training_manifest", sql)
    def docs_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The whole curation funnel as one Catalyst plan: quality
        scoring (JVM expression scan) → threshold filter → exact dedup
        keeping the lowest doc_id per content fingerprint (one shuffle
        on the well-distributed md5 key) → leakage-free hash split
        (pure map) → per-(split, language) doc/token accounting (one
        final agg). This is the manifest a training launch reads; every
        stage reuses an independently-oracled operator, and expressing
        the funnel as a single plan lets Catalyst collapse the quality
        filter and split assignment into the dedup shuffle's map side —
        three logical passes, two physical shuffles."""
        from pyspark.sql import Window

        docs = load_table(spark, sf_dir, "documents")
        # Arrow quality kernel (r19) directly in the filter — see the
        # leakage-safe twin for the duplicate-evaluation rationale
        filt = docs.filter(T.quality_score_batch()(F.col("text")) >= 0.5)
        fp = filt.withColumn("f", T.fingerprint(F.col("text")))
        w = Window.partitionBy("f").orderBy("doc_id")
        kept = fp.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
        split = hash_split(kept, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        return split.groupBy("split", "lang").agg(
            F.count("*").alias("n_docs"),
            F.sum(T.token_count(F.col("text"))).alias("total_tokens"),
        )


_register_training_manifest()
