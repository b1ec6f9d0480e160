"""Projection / filter / predicate operators (SURVEY.md §2.B).

In the reference architecture these are inline Python expressions in the
Lambda handler body (per-record, interpreted). Here each is a Catalyst
expression that participates in predicate pushdown and column pruning — at
100 TB the filters reach the parquet row-group stats and never deserialize
non-matching data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table


@query(
    "q_proj_rename",
    oracle="""
    SELECT c_custkey AS custkey,
           c_name AS customer_name,
           c_mktsegment AS segment
    FROM customer
    """,
    category="2.B",
)
def q_proj_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select + rename + reorder. Column pruning: the scan reads 3 of 5
    columns (visible as ReadSchema in .explain)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "q_proj_computed",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    """,
    category="2.B",
)
def q_proj_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived column. Per-row IEEE arithmetic is bit-identical across
    engines — no rounding needed (parity.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@query(
    "q_filter_cmp",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_shipdate
    FROM lineitem
    WHERE l_quantity > 45
      AND l_discount <= 0.05
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_tax >= 0.01
      AND l_returnflag <> 'A'
    """,
    category="2.B",
)
def q_filter_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six comparison operators over numbers, strings, timestamps.
    Every predicate here pushes to the parquet scan (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") > 45)
        & (F.col("l_discount") <= 0.05)
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_tax") >= 0.01)
        & (F.col("l_returnflag") != "A")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate")


@query(
    "q_filter_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderstatus IN ('F', 'O')
    """,
    category="2.B",
)
def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list membership (pushed down as parquet `in` filter)."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_orderstatus").isin("F", "O")
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus")


@query(
    "q_filter_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1996-12-31 00:00:00'
    """,
    category="2.B",
)
def q_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate — maps to min/max row-group pruning on a
    date-partitioned layout at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    ).select("l_orderkey", "l_linenumber", "l_shipdate")


@query(
    "q_filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_brand LIKE 'Brand#1%'
      AND p_name NOT LIKE '%widget%'
    """,
    category="2.B",
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / NOT LIKE (prefix LIKE pushes down as string-range filter)."""
    p = load_table(spark, sf_dir, "part")
    return p.where(
        F.col("p_brand").like("Brand#1%") & ~F.col("p_name").like("%widget%")
    ).select("p_partkey", "p_name", "p_brand")


@query(
    "q_filter_null",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_orderkey IS NULL
    """,
    category="2.B",
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL over manufactured nulls (the corpus has none — FIXTURES.md §2):
    customers with no orders via left-join miss."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(o, c.c_custkey == o.o_custkey, "left")
    return joined.where(F.col("o_orderkey").isNull()).select("c_custkey", "c_name")


@query(
    "q_filter_bool",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE (event_type = 'purchase' OR event_type = 'signup')
      AND NOT (value < 50)
      AND user_id <> 7
    """,
    category="2.B",
)
def q_filter_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT composition."""
    e = load_table(spark, sf_dir, "events")
    return e.where(
        ((F.col("event_type") == "purchase") | (F.col("event_type") == "signup"))
        & ~(F.col("value") < 50)
        & (F.col("user_id") != 7)
    ).select("event_id", "user_id", "event_type", "value")


@query(
    "q_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 'hot'
                WHEN o_orderpriority = '2-HIGH' THEN 'warm'
                WHEN o_totalprice > 300000 THEN 'big'
                ELSE 'normal' END AS priority_class
    FROM orders
    """,
    category="2.B",
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-branch CASE WHEN with fall-through else."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", "hot")
        .when(F.col("o_orderpriority") == "2-HIGH", "warm")
        .when(F.col("o_totalprice") > 300000, "big")
        .otherwise("normal")
        .alias("priority_class"),
    )


@query(
    "q_distinct",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    category="2.B",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DISTINCT = hash aggregate on all columns (partial distinct
    before the shuffle keeps exchange volume at cardinality, not row count)."""
    e = load_table(spark, sf_dir, "events")
    return e.select("user_id", "event_type").distinct()


@query(
    "q_sample_systematic",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey % 20 = 7
    """,
    category="2.B",
)
def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 5% sample: every key with o_orderkey ≡ 7 (mod 20).
    The row-deterministic counterpart of q_sample_seeded (engine-RNG
    rows, certificate-checked): membership is a pure per-row predicate, so it pushes to the
    parquet scan, re-runs identically at any scale, and a second engine
    verifies it exactly — the properties that make hash/systematic
    sampling the only sampling used in reproducible 100 TB pipelines."""
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 20 == 7).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "q_filter_ts_pushdown",
    oracle="""
    SELECT event_id, ts, event_type
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-12 00:00:00'
      AND event_type <> 'error'
    ORDER BY event_id
    """,
    category="2.B",
)
def q_filter_ts_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-range predicate on the event stream — the filter shape
    EVERY time-partitioned 100 TB table lives or dies by (with a date-
    partitioned layout this same predicate prunes partitions; here it
    must at least reach the parquet row-group statistics). The engine
    reads naive parquet micros as LTZ verbatim (session pins UTC +
    inferTimestampNTZ off — §9 law 17), so the literal bounds mean the
    same instant on both engines. A plan gate asserts the pushdown."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.where(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-12 00:00:00").cast("timestamp"))
            & (F.col("event_type") != "error")
        )
        .select("event_id", "ts", "event_type")
        .orderBy("event_id")
    )


@query(
    "q_proj_masking",
    oracle="""
    SELECT c_custkey,
           CASE WHEN length(c_name) > 4
                THEN repeat('*', length(c_name) - 4)
                     || substring(c_name, length(c_name) - 3, 4)
                ELSE c_name END AS masked_name,
           CAST(c_acctbal > 0 AS INTEGER) AS has_balance,
           c_mktsegment
    FROM customer ORDER BY c_custkey
    """,
    category="2.B",
)
def q_proj_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-masking projection — the PII-safe view every warehouse
    publishes: names keep only their last 4 characters behind '*'
    padding, balances collapse to a sign flag, segment passes through.
    Masking as a PROJECTION (not a UDF) stays in whole-stage codegen
    and costs nothing at scale; the same expressions drop into a
    column-level access policy. Exact string/int outputs."""
    c = load_table(spark, sf_dir, "customer")
    n = F.length("c_name")
    return c.select(
        "c_custkey",
        F.when(
            n > 4,
            F.concat(
                F.expr("repeat('*', length(c_name) - 4)"),
                F.substring(F.col("c_name"), -4, 4),
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("masked_name"),
        (F.col("c_acctbal") > 0).cast("int").alias("has_balance"),
        "c_mktsegment",
    ).orderBy("c_custkey")


@query(
    "q_stat_crosstab",
    oracle="""
    SELECT event_type AS event_type_dow,
           CAST(SUM(CASE WHEN dayofweek(ts) + 1 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS "1",
           CAST(SUM(CASE WHEN dayofweek(ts) + 1 = 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS "2",
           CAST(SUM(CASE WHEN dayofweek(ts) + 1 = 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS "3",
           CAST(SUM(CASE WHEN dayofweek(ts) + 1 = 4 THEN 1 ELSE 0 END)
                AS BIGINT) AS "4",
           CAST(SUM(CASE WHEN dayofweek(ts) + 1 = 5 THEN 1 ELSE 0 END)
                AS BIGINT) AS "5",
           CAST(SUM(CASE WHEN dayofweek(ts) + 1 = 6 THEN 1 ELSE 0 END)
                AS BIGINT) AS "6",
           CAST(SUM(CASE WHEN dayofweek(ts) + 1 = 7 THEN 1 ELSE 0 END)
                AS BIGINT) AS "7"
    FROM events GROUP BY event_type
    """,
    category="2.D",
)
def q_stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.stat.crosstab — the first exercise of the df.stat
    mathematical-statistics surface (its other members are either
    approximate (approxQuantile, freqItems — the exact twins
    q_agg_percentile / q_agg_freq_items already cover those
    semantics) or float-accumulation-ordered (cov/corr — the repo
    deliberately computes correlations from exact integer moments
    instead, q_agg_corr_exact)): the event_type × day-of-week
    contingency table, the same marginals q_agg_chi2_indep tests
    but as the RAW exact-count matrix an analyst eyeballs first.
    API semantics certified: the pivot column names are the
    stringified VALUES of the second column ("1".."7"), the first
    column is named "{col1}_{col2}", counts are exact longs.
    Calendar hazard pinned as in q_ts_heatmap_hod_dow: Spark
    dayofweek is 1=Sunday, DuckDB's is 0=Sunday, so the oracle adds
    1. Scale: crosstab is one map-side-combining agg over (c1, c2)
    + a driver pivot of the BOUNDED distinct matrix — never call it
    when col2's cardinality is data-scaled (the column count would
    be the row count); the 5×7 panel here is the intended shape."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_type", F.dayofweek("ts").alias("dow")
    ).stat.crosstab("event_type", "dow")
