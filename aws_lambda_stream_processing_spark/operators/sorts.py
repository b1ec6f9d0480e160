"""Sort / limit / top-k (SURVEY.md §2.F)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table


@query(
    "q_sort_multi",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
    FROM lineitem
    WHERE l_quantity >= 48
    ORDER BY l_returnflag ASC, l_quantity DESC, l_orderkey, l_linenumber
    """,
    category="2.F",
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort (range-partitioned exchange + per-partition
    sort). The hash compare is order-insensitive; the value is exercising the
    range exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_quantity") >= 48)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .orderBy(
            F.asc("l_returnflag"),
            F.desc("l_quantity"),
            F.asc("l_orderkey"),
            F.asc("l_linenumber"),
        )
    )


@query(
    "q_sort_nulls",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 450000
    ORDER BY o.o_orderkey ASC NULLS LAST, c.c_custkey
    """,
    category="2.F",
)
def q_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS LAST ordering over manufactured nulls (selective left join)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000), "left"
    )
    return joined.select("c_custkey", "o_orderkey").orderBy(
        F.asc_nulls_last("o_orderkey"), F.asc("c_custkey")
    )


@query(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    category="2.F",
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT compiles to TakeOrderedAndProject —
    each task keeps a k-heap, the driver merges k·partitions rows; no global
    sort ever materializes. Deterministic tiebreak on o_orderkey."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )
