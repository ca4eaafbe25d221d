"""Extended relational coverage: semi/anti joins, set operations,
grouping sets, conditional aggregation, scalar subqueries, pivot, and
the string/date/numeric function surface (SURVEY §2.5 gap map).

The reference has no SQL layer at all (SURVEY §2.5), so these queries
define the engine's relational surface directly in idiomatic Spark.
Every query here is oracle-matched (DuckDB twin registered alongside).

Scale notes (100 TB thinking, applies throughout):
- dimension tables (region/nation/customer/supplier/part) broadcast —
  the lineitem/orders fact tables are never shuffled for a dim join;
- filters are expressed on base columns before joins so Catalyst pushes
  them into the parquet scan (verified via PushedFilters in tests);
- aggregates use map-side partial aggregation (hash agg) by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from local_vectordb_spark.queries import register
from local_vectordb_spark.session import load_table


# --------------------------------------------------------------------------
# Filter + single-row aggregate (TPC-H Q6 shape: the pushdown showcase)
# --------------------------------------------------------------------------


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT ROUND(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-side query: all four predicates push to the parquet
    reader, projection prunes to 4 columns, one partial+final agg."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q10 shape: fact-dim join + agg + top-k by measure
# --------------------------------------------------------------------------


@register(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lost-revenue report: lineitem filtered scan-side on returnflag,
    nation (25 rows, SF-invariant) broadcast by hint, single groupBy
    shuffle then TakeOrderedAndProject for the top 20.
    orders/customer get NO hint — they grow with SF, and a hard hint
    would override autoBroadcastJoinThreshold at 100x; the planner
    still broadcasts them at small SF on its own."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS surface)
# --------------------------------------------------------------------------


@register(
    "semi_join_deep_discount_orders",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.09
    )
    GROUP BY o_orderpriority
    """,
)
def semi_join_deep_discount_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join (SURVEY C3/C8 batched form). The
    lineitem side is pre-filtered scan-side, so the semi join probes a
    much smaller build set."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") >= 0.09)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "anti_join_never_bulk_ordered_parts",
    """
    SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_parts
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49
    )
    GROUP BY p.p_brand
    """,
)
def anti_join_never_bulk_ordered_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join (SURVEY C6/C7's delete-rewrite
    primitive used as a query): parts that never appear in a
    near-max-quantity (>=49) line item. The filtered build side is
    small → broadcast anti join, no fact-table shuffle."""
    p = load_table(spark, sf_dir, "part")
    bulk = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 49)
        .select("l_partkey")
    )
    return (
        p.join(bulk, p.p_partkey == bulk.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"))
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


@register(
    "setops_wealthy_nations",
    """
    WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000),
         s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000)
    SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM c UNION SELECT nationkey FROM s)
    UNION ALL
    SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
    UNION ALL
    SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
    """,
)
def setops_wealthy_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT in one result, tagged by op. Each set
    op is a shuffle on the (tiny) distinct key set — dominated by the
    two base scans, which each push their acctbal filter down."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "nationkey")  # noqa: E731
    return (
        tag(c.union(s).distinct(), "union")
        .unionAll(tag(c.intersect(s), "intersect"))
        .unionAll(tag(c.exceptAll(s).distinct(), "except"))
    )


# --------------------------------------------------------------------------
# Grouping sets (non-hierarchical — complements rollup_revenue's ROLLUP)
# --------------------------------------------------------------------------


@register(
    "grouping_sets_flag_status",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           ROUND(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def grouping_sets_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two independent single-column aggregates in ONE pass over the
    fact table (Spark expands the sets map-side; one shuffle instead of
    two scans)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupingSets(
            [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
        )
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_items"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_items",
        )
    )


# --------------------------------------------------------------------------
# Conditional aggregation (TPC-H Q14 shape)
# --------------------------------------------------------------------------


@register(
    "tpch_q14_promo_revenue",
    """
    SELECT ROUND(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-02-01'
    """,
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share: CASE inside two sums over one join —
    no second pass; the final agg is a single row. part is SF-linear
    (SF x 200k) so it carries no broadcast hint; the planner
    broadcasts it while small and shuffles at 100x."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(disc_price), 6).alias("promo_pct")
        )
    )


# --------------------------------------------------------------------------
# Scalar/correlated subqueries via aggregate join (TPC-H Q17/Q18 shapes)
# --------------------------------------------------------------------------


@register(
    "tpch_q17_small_quantity_revenue",
    """
    WITH part_avg AS (
      SELECT l_partkey, avg(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part_avg a ON l.l_partkey = a.l_partkey
    WHERE l.l_quantity < 0.5 * a.avg_qty
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-part average) decorrelated into
    an aggregate + self-join — the classic Q17 rewrite. At 100 TB the
    per-key aggregate and the probe side share the same hash
    partitioning on l_partkey, so AQE plans one co-partitioned join."""
    l = load_table(spark, sf_dir, "lineitem")
    part_avg = l.groupBy("l_partkey").agg(F.avg("l_quantity").alias("avg_qty"))
    probe = l.select("l_partkey", "l_quantity", "l_extendedprice").withColumnRenamed(
        "l_partkey", "pk"
    )
    return (
        probe.join(part_avg, probe.pk == part_avg.l_partkey)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "tpch_q18_large_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(o.o_totalprice, 2) AS totalprice,
           ROUND(sum(l.l_quantity), 2) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY totalprice DESC, o.o_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: HAVING subquery as a semi join. The big
    orderkey set is small after the HAVING filter but still SF-linear,
    so no hard broadcast hint anywhere — AQE converts the semi join to
    broadcast at runtime when the filtered set actually fits, and
    falls back to a shuffled semi join at 100x. lineitem shuffles for
    its groupBy, never for the IN when the set is small."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    return (
        l.join(big.withColumnRenamed("l_orderkey", "bk"),
               F.col("l_orderkey") == F.col("bk"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "scalar_subquery_premium_parts",
    """
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_premium,
           ROUND(max(p_retailprice), 2) AS max_price
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
    GROUP BY p_brand
    """,
)
def scalar_subquery_premium_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: Spark evaluates the avg as a
    separate tiny job and folds it into the filter (no join needed) —
    expressed here with a cross-join of a 1-row aggregate, which
    Catalyst turns into a broadcast nested loop of size 1."""
    p = load_table(spark, sf_dir, "part")
    avg_price = p.agg(F.avg("p_retailprice").alias("avg_price"))
    return (
        p.join(F.broadcast(avg_price))
        .filter(F.col("p_retailprice") > F.col("avg_price"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_premium"),
            F.round(F.max("p_retailprice"), 2).alias("max_price"),
        )
    )


# --------------------------------------------------------------------------
# Pivot
# --------------------------------------------------------------------------


@register(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
           CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
           CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (never let Spark infer pivot
    values at scale — that's an extra distinct scan)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
        )
    )


# --------------------------------------------------------------------------
# Function-surface showcases (string / date / numeric-stats)
# --------------------------------------------------------------------------


@register(
    "string_funcs_parts",
    """
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substr(p_name, 1, 5) AS name_prefix,
           CAST(length(p_name) AS INT) AS name_len,
           concat_ws('-', p_brand, p_type) AS brand_type,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           replace(p_type, 'A', '_') AS type_repl
    FROM part
    WHERE p_partkey < 100
    """,
)
def string_funcs_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface: all JVM-side codegen'd expressions in a
    single projected scan (key-range predicate pushed down)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.col("p_type"), F.lit("A"), F.lit("_")).alias("type_repl"),
    )


@register(
    "date_funcs_monthly_revenue",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           CAST(month(o_orderdate) AS INT) AS mo,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           ROUND(sum(o_totalprice), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3, 4
    """,
)
def date_funcs_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date function surface + time-bucketed aggregation. At scale this
    is the query that motivates partitioning the orders table by
    month(o_orderdate) — the filter then prunes whole partitions."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.quarter("o_orderdate").cast("int").alias("qtr"),
            F.month("o_orderdate").cast("int").alias("mo"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "numeric_stats_lineitem",
    """
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 2) AS sd_price,
           ROUND(var_samp(l_discount), 8) AS var_disc,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 1) AS covar_qty_price,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           ROUND(min(l_extendedprice), 2) AS min_price,
           ROUND(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def numeric_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface (stddev/var/corr/covar + exact
    distinct count). count(DISTINCT) is the expensive one at scale —
    Spark plans it as a two-phase expand+agg; swap to
    approx_count_distinct when 2% error is acceptable."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 1).alias(
            "covar_qty_price"
        ),
        F.count_distinct(F.col("l_partkey")).alias("n_parts"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


# --------------------------------------------------------------------------
# More TPC-H shapes (adapted to this star schema: no partsupp table,
# no commit/receipt dates — predicates use the columns that exist)
# --------------------------------------------------------------------------


@register(
    "tpch_q7_nation_volume",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS yr,
           ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_name != n2.n_name
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations by year.
    Six-way join; only nation (25 rows, twice under different aliases)
    is hint-broadcast. orders/customer/supplier are SF-linear, so they
    get no hint — planner/AQE broadcasts them while small, shuffles at
    100x instead of OOMing the driver."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin(*pair))
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin(*pair))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q8_market_share",
    """
    WITH volumes AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
    )
    SELECT yr,
           ROUND(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM volumes GROUP BY yr
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of a region's ECONOMY-part import
    volume per year — conditional-sum ratio over a seven-way star
    join. Hints only on the SF-invariant sides (nation x2, region);
    orders/customer/supplier and the filtered-but-SF-linear part get
    none, so the plan degrades to shuffled joins at 100x instead of
    forcing a driver-side broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), "n_regionkey")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", volume).otherwise(0.0)
                )
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q13_order_count_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        AND o.o_orderpriority != '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of non-urgent order counts per customer,
    zeros included (LEFT join + count of the nullable side — the
    null-preserving aggregate every engine must get right)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q19_disjunctive_revenue",
    """
    SELECT ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: three-way disjunctive join+filter. The
    quantity-range halves of each disjunct reference only lineitem, so
    Catalyst pushes `l_quantity BETWEEN 1 AND 50` (the OR-hull) into
    the scan while the mixed predicate evaluates post-join."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    j = l.join(p, l.l_partkey == p.p_partkey)
    d1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    d2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 35)
    )
    d3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return j.filter(d1 | d2 | d3).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "tpch_q22_dormant_rich_customers",
    """
    WITH cutoff AS (
      SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0
    )
    SELECT substr(c.c_name, 1, 9) AS name_prefix,
           CAST(count(*) AS BIGINT) AS n_cust,
           ROUND(sum(c.c_acctbal), 2) AS total_bal
    FROM customer c, cutoff
    WHERE c.c_acctbal > cutoff.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY 1
    """,
)
def tpch_q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no recent
    orders — scalar subquery (broadcast 1-row aggregate) + anti join."""
    c = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            recent.select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
        .groupBy(F.substring("c_name", 1, 9).alias("name_prefix"))
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "window_running_totals",
    """
    WITH t AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders WHERE o_custkey < 200
    )
    SELECT o_custkey, o_orderkey,
           ROUND(sum(cents) OVER w / 100.0, 2) AS running_total,
           (sum(cents) OVER w // count(*) OVER w) / 100.0 AS running_avg,
           ROUND(lag(cents) OVER w / 100.0, 2) AS prev_price,
           CAST(ntile(4) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS INT) AS qtile
    FROM t
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING)
    """,
)
def window_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function variety over one shuffle: running sum/avg,
    lag, and ntile share a single (partition, order) spec, so Spark
    computes all four in one Window exec pass."""
    from pyspark.sql import Window

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        # exact integer cents: running sums then accumulate exactly in
        # BOTH engines (double window-sums associate differently across
        # engines and flap on rounding boundaries)
        .withColumn("cents", F.round(F.col("o_totalprice") * 100, 0).cast("long"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("cents").over(w) / 100.0, 2).alias("running_total"),
        # floor-to-cent average via exact integer division: double
        # rounding of x.xx5 boundaries differs across engines
        (
            F.floor(F.sum("cents").over(w) / F.count("*").over(w)) / 100.0
        ).alias("running_avg"),
        F.round(F.lag("cents").over(wo) / 100.0, 2).alias("prev_price"),
        F.ntile(4).over(wo).cast("int").alias("qtile"),
    )


# --------------------------------------------------------------------------
# TPC-H Q4 / Q12 / Q21 shapes (lateness adapted: the fixture lineitem has
# no commit/receipt dates, so "late" means shipped > N days after the
# order date — the join/EXISTS shapes are unchanged)
# --------------------------------------------------------------------------


@register(
    "tpch_q4_priority_late_orders",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): EXISTS with an extra
    non-equi term becomes a left-semi hash join on l_orderkey whose
    join condition carries the lateness predicate. The date filter on
    orders is pushed to its scan; at scale both sides shuffle once on
    the join key and the semi join emits each order at most once, so
    no post-join dedup is needed."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "tpch_q12_latency_priority",
    """
    SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
                THEN 'SLOW' ELSE 'FAST' END AS ship_bucket,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def tpch_q12_latency_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / priority): fact-fact join on
    the order key, then conditional aggregation via CASE sums. The
    ship-year filter prunes the lineitem scan; the two-row result
    comes from one partial+final hash aggregate after the join."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .withColumn(
            "ship_bucket",
            F.when(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"),
                "SLOW",
            ).otherwise("FAST"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q21_waiting_suppliers",
    """
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS is_late
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM li l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.is_late
      AND EXISTS (
        SELECT 1 FROM li l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM li l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.is_late
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC
    LIMIT 10
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the sole
    late supplier on a multi-supplier finished order.

    The oracle states it with the classic EXISTS / NOT EXISTS pair of
    correlated self-joins; here both collapse into per-order distinct-
    supplier counts — EXISTS(other supplier) == n_supp > 1 and NOT
    EXISTS(other LATE supplier) == n_late_supp = 1 (the late row's own
    supplier) — and the oracle match proves the rewrite exact.
    Supplier is broadcast; the final top-10 is a
    TakeOrderedAndProject."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = load_table(spark, sf_dir, "supplier")
    li = l.join(o.select("o_orderkey", "o_orderdate"), l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias(
            "is_late"
        ),
    )
    # Per-order supplier counts as WINDOW aggregates over the same
    # l_orderkey partitioning — one shuffle, ONE scan of the fact join
    # (a groupBy twin would re-scan lineitem+orders to build the
    # per-order frame and join it back). collect_set per order is
    # bounded by suppliers-per-order (single digits), not order size.
    w = Window.partitionBy("l_orderkey")
    annotated = li.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(
            F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
        ).alias("n_late_supp"),
    )
    return (
        annotated.filter(
            F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# TPC-H Q2/Q9/Q11/Q16/Q20 shapes, fixture-adapted. The fixture has no
# partsupp table, so the part↔supplier relationship and its costs are
# derived from lineitem: the observed (l_partkey, l_suppkey) pairs are
# the bridge, and min(l_extendedprice / l_quantity) per pair stands in
# for ps_supplycost (min — not avg — because min over IEEE doubles is
# order-independent, so the derived "cost" is bit-identical in any
# engine regardless of aggregation order). Reference parity: the
# reference has no SQL layer (SURVEY §2.5); these complete the 22/22
# TPC-H query-shape surface of this engine.
# --------------------------------------------------------------------------


@register(
    "tpch_q2_min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS cost
      FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    cand AS (
      SELECT p.p_partkey, eu.s_name, eu.s_acctbal, eu.n_name, ps.cost,
             min(ps.cost) OVER (PARTITION BY p.p_partkey) AS min_cost
      FROM ps
      JOIN part p ON ps.l_partkey = p.p_partkey
      JOIN eu ON ps.l_suppkey = eu.s_suppkey
      WHERE p.p_size <= 10 AND p.p_type = 'LARGE'
    )
    SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
           floor(cost * 100 + 0.5) / 100 AS supply_cost
    FROM cand WHERE cost = min_cost
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (min-cost supplier per part): the correlated-min
    subquery becomes a window min over the part key — one shuffle on
    p_partkey instead of a self-join. The derived cost table aggregates
    lineitem once (map-side partial min), and the EUROPE supplier dim
    is broadcast so the bridge never shuffles for it."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    from pyspark.sql import Window

    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = p.filter((F.col("p_size") <= 10) & (F.col("p_type") == "LARGE"))
    cand = (
        ps.join(parts, ps.l_partkey == parts.p_partkey)
        .join(eu, ps.l_suppkey == F.col("s_suppkey"))
        .withColumn("min_cost", F.min("cost").over(Window.partitionBy("p_partkey")))
    )
    return cand.filter(F.col("cost") == F.col("min_cost")).select(
        F.round("s_acctbal", 2).alias("s_acctbal"),
        "s_name",
        "n_name",
        "p_partkey",
        # half-up on the BINARY double value (floor(x·100+0.5)) on both
        # engines: native round() diverges cross-engine exactly at
        # x.xx5 boundaries (Spark rounds the shortest decimal repr,
        # DuckDB the binary value) — a price/quantity ratio landed on
        # 972.695 at sf0.1 and split the two
        (F.floor(F.col("cost") * 100 + F.lit(0.5)) / 100.0).alias(
            "supply_cost"
        ),
    )


@register(
    "tpch_q9_product_type_profit",
    """
    SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(sum(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (profit by supplier nation × order year): ps_supplycost
    becomes 0.6 × p_retailprice (deterministic unit-cost proxy). Only
    nation (25 rows) is hint-broadcast; part/supplier are SF-linear so
    the planner decides for them. The heavy shuffle joins the two fact
    tables on l_orderkey = o_orderkey — at scale that is the
    co-partitioned join you would bucket both tables on."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("long").alias("o_year")
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@register(
    "tpch_q11_important_parts",
    """
    WITH asia AS (
      SELECT s.s_suppkey
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
    ),
    val AS (
      SELECT l.l_partkey,
             sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                      AS BIGINT)) AS cents
      FROM lineitem l
      WHERE l.l_suppkey IN (SELECT s_suppkey FROM asia)
      GROUP BY 1
    ),
    total AS (SELECT sum(cents) AS total_cents, count(*) AS n_parts FROM val)
    SELECT v.l_partkey AS p_partkey, ROUND(v.cents / 100.0, 2) AS part_value
    FROM val v, total t
    WHERE v.cents > 2.0 * (t.total_cents / t.n_parts)
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (parts above a fraction of a nation-group's total
    stock value): ps_supplycost*ps_availqty becomes region-supplier
    revenue per part, in exact integer cents so the per-part sums, the
    grand total, and the threshold comparison are bit-identical across
    engines (double sums associate differently under distribution).
    The threshold is 2x the mean part value rather than a fixed
    fraction of the total, so the selectivity is scale-free.
    The grand total is a broadcast 1-row scalar, not a second scan."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    val = (
        l.join(asia, l.l_suppkey == F.col("s_suppkey"), "left_semi")
        .withColumn(
            "cents",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
            ).cast("long"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("cents").alias("cents"))
    )
    total = val.agg(
        F.sum("cents").alias("total_cents"), F.count("*").alias("n_parts")
    )
    return (
        val.join(F.broadcast(total))
        .filter(F.col("cents") > 2.0 * (F.col("total_cents") / F.col("n_parts")))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("cents") / 100.0, 2).alias("part_value"),
        )
    )


@register(
    "tpch_q16_part_supplier_counts",
    """
    WITH bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT b.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM bridge b
    JOIN part p ON p.p_partkey = b.l_partkey
    WHERE p.p_brand <> 'Brand#4'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 49)
      AND b.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape (distinct supplier counts per part attribute group,
    excluding flagged suppliers): the partsupp bridge is the DISTINCT
    (l_partkey, l_suppkey) projection of lineitem — one shuffle that
    also serves the count-distinct; negative-balance suppliers stand in
    for the complaints NOT IN, as an anti join (no hard hint — the
    flagged-supplier set is SF-linear; AQE broadcasts it while it
    fits)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    bridge = l.select("l_partkey", "l_suppkey").distinct()
    return (
        bridge.join(bad, bridge.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_promotion_suppliers",
    """
    WITH shipped AS (
      SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS qty
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
        AND l.l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
      GROUP BY 1, 2
    ),
    part_avg AS (
      SELECT l_partkey, avg(qty) AS avg_qty FROM shipped GROUP BY 1
    ),
    qual AS (
      SELECT DISTINCT sh.l_suppkey
      FROM shipped sh JOIN part_avg a ON sh.l_partkey = a.l_partkey
      WHERE sh.qty > 1.2 * a.avg_qty
    )
    SELECT s.s_name, n.n_name, ROUND(s.s_acctbal, 2) AS acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'AMERICA'
      AND s.s_suppkey IN (SELECT l_suppkey FROM qual)
    """,
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (suppliers with above-threshold stock of candidate
    parts): availqty > half-of-shipped becomes shipped-qty > 1.2× the
    part's mean across suppliers — the same nested-aggregation
    semi-join chain. Candidate part keys semi-join the lineitem scan
    and the qualifying-supplier set semi-joins the supplier dim — both
    SF-linear, so neither carries a hard broadcast hint (AQE converts
    to broadcast while they fit). l_quantity values are small integers stored as doubles, so the
    sums and the mean are exact in both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    shipped = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            p.select("p_partkey"),
            l.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    part_avg = shipped.groupBy("l_partkey").agg(F.avg("qty").alias("avg_qty"))
    qual = (
        shipped.join(part_avg, "l_partkey")
        .filter(F.col("qty") > 1.2 * F.col("avg_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "AMERICA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .join(qual, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


# --------------------------------------------------------------------------
# Exact per-group percentiles (the interpolated-quantile surface)
# --------------------------------------------------------------------------


@register(
    "orders_percentile_by_priority",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 2) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def orders_percentile_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (one hash-agg shuffle;
    Spark's `percentile` sorts within each group's aggregation buffer).
    Continuous interpolation matches DuckDB's quantile_cont exactly, so
    unlike approx_percentile sketches this is value-reproducible. At
    100 TB the same plan holds: percentile state is per-group, and the
    cardinality of the group key (5 priorities) bounds the reduce side."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 2).alias("p99"),
    )


# --------------------------------------------------------------------------
# CUBE (completes the grouping surface: GROUP BY / ROLLUP / SETS / CUBE)
# --------------------------------------------------------------------------


@register(
    "part_cube_brand_size",
    """
    SELECT coalesce(p_brand, 'ALL') AS brand,
           coalesce(CAST(p_size AS VARCHAR), 'ALL') AS size,
           CAST(count(*) AS BIGINT) AS n_parts,
           ROUND(sum(p_retailprice), 2) AS sum_retail
    FROM part
    GROUP BY CUBE (p_brand, p_size)
    """,
)
def part_cube_brand_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (brand, size): all four grouping combinations in
    ONE pass (Spark expands the cube map-side — one shuffle, not four
    scans). Completes the grouping-operator surface next to
    rollup_revenue (ROLLUP) and grouping_sets_flag_status (SETS)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.cube("p_brand", "p_size")
        .agg(
            F.count("*").alias("n_parts"),
            # sum, not avg: retail prices are 2dp quantities, so the
            # rounded sum is stable under float add-order differences;
            # a rounded AVG can land exactly on a half-cent boundary
            # and flip between engines
            F.round(F.sum("p_retailprice"), 2).alias("sum_retail"),
        )
        .select(
            F.coalesce("p_brand", F.lit("ALL")).alias("brand"),
            F.coalesce(F.col("p_size").cast("string"), F.lit("ALL")).alias("size"),
            "n_parts",
            "sum_retail",
        )
    )


@register(
    "supplier_balance_ntile",
    """
    SELECT quartile,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           ROUND(min(s_acctbal), 2) AS min_bal,
           ROUND(max(s_acctbal), 2) AS max_bal
    FROM (
      SELECT s_acctbal,
             CAST(ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS INT)
               AS quartile
      FROM supplier
    )
    GROUP BY quartile
    """,
)
def supplier_balance_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartiles over account balance (deterministic tie-break by
    key) aggregated per bucket — the bucketed-ranking window function
    the surface was missing next to row_number/rank/lag. The global
    window sorts only the supplier dim table; per-bucket aggregation
    combines map-side."""
    s = load_table(spark, sf_dir, "supplier")
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        s.select("s_acctbal", F.ntile(4).over(w).cast("int").alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.min("s_acctbal"), 2).alias("min_bal"),
            F.round(F.max("s_acctbal"), 2).alias("max_bal"),
        )
    )
