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


@query(
    "q_limit_offset",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders
    ORDER BY cents DESC, o_orderkey
    LIMIT 20 OFFSET 40
    """,
    category="2.F",
)
def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination (page 3 of 20 by price): only
    deterministic under a TOTAL order, so the sort key carries the
    unique orderkey tie-break — pagination without it returns
    different pages on different partitionings, the classic API bug.
    Spark executes this as a global sort + offset-limit; at depth
    OFFSET+LIMIT the driver merge holds only 60 rows (deep pagination
    at 100 TB should switch to keyset/seek predicates instead — the
    offset cost grows linearly with page depth)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .orderBy(F.desc("cents"), "o_orderkey")
        .offset(40)
        .limit(20)
    )


@query(
    "q_sort_within_partitions",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(0 AS BIGINT) AS order_violations
    FROM lineitem
    """,
    category="2.F",
)
def q_sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sortWithinPartitions — the NO-EXCHANGE local sort (what a
    write-sorted-parquet / merge-join preparation step uses: each
    partition sorts independently, no range shuffle, no global order).
    The contract is verified IN the query: a mapInPandas pass counts
    adjacent out-of-order pairs per partition (Arrow batches arrive in
    partition order) — the oracle pins that count to ZERO plus the
    row-count, so a silently dropped local sort fails the hash. The
    plan gate (test_plans) separately asserts no Exchange is present."""
    import pandas as pd

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    local = li.sortWithinPartitions("l_orderkey", "l_linenumber")

    def check(batches):
        n = 0
        bad = 0
        prev = None
        for pdf in batches:
            keys = list(
                zip(pdf["l_orderkey"].tolist(), pdf["l_linenumber"].tolist())
            )
            n += len(keys)
            for k in keys:
                if prev is not None and k < prev:
                    bad += 1
                prev = k
        yield pd.DataFrame({"n_rows": [n], "order_violations": [bad]})

    per_part = local.mapInPandas(
        check, "n_rows long, order_violations long"
    )
    return per_part.agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("order_violations").alias("order_violations"),
    )


def _keyset_page(o: DataFrame, bound, n: int) -> DataFrame:
    """One keyset page: rows strictly after `bound` = (cents, orderkey)
    in the (cents DESC, o_orderkey ASC) total order, top-n. The seek
    predicate makes every page a plain filter + TakeOrderedAndProject
    (per-partition top-n, driver merges n·partitions rows) — no offset,
    so page depth never enters the cost. bound=None is page 1."""
    if bound is not None:
        last_cents, last_key = bound
        o = o.where(
            (F.col("cents") < last_cents)
            | (
                (F.col("cents") == last_cents)
                & (F.col("o_orderkey") > last_key)
            )
        )
    return o.orderBy(F.desc("cents"), "o_orderkey").limit(n)


@query(
    "q_limit_keyset",
    oracle="""
    WITH r AS (
      SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT CAST(1 AS INTEGER) AS page, * FROM
      (SELECT * FROM r ORDER BY cents DESC, o_orderkey LIMIT 20)
    UNION ALL
    SELECT CAST(2 AS INTEGER) AS page, * FROM
      (SELECT * FROM r ORDER BY cents DESC, o_orderkey LIMIT 20 OFFSET 20)
    UNION ALL
    SELECT CAST(3 AS INTEGER) AS page, * FROM
      (SELECT * FROM r ORDER BY cents DESC, o_orderkey LIMIT 20 OFFSET 40)
    """,
    category="2.F",
)
def q_limit_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset/seek pagination — the plan q_limit_offset's docstring
    prescribes for deep pages, promoted to a first-class rung: three
    chained 20-row pages of orders by (cents DESC, o_orderkey), where
    each page's cursor is the LAST (cents, orderkey) of the previous
    page and the next page is `WHERE (cents, key) after cursor ORDER BY
    … LIMIT 20`. Every page therefore executes as filter +
    TakeOrderedAndProject(limit=20) — per-partition top-20 and a
    60-row driver merge — while the OFFSET formulation (the oracle,
    same rows by construction over the unique total order) pays a
    top-(20·page) scan that grows linearly with depth. The seek
    predicate also reaches the scan as a DataFilter, so a layout sorted
    or Z-ordered by the sort key skips non-qualifying row groups
    entirely — at 100 TB page 1000 costs the same as page 1, the whole
    point of keyset pagination. Eager by necessity (the client carries
    the cursor between requests: 2 boundary collects of 20 rows);
    tests/test_plans.py gates pages 2-3 as offset-free
    TakeOrderedAndProject with the OFFSET plan as positive control."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    out = []
    bound = None
    for page in (1, 2, 3):
        rows = _keyset_page(o, bound, 20).collect()
        bound = (rows[-1]["cents"], rows[-1]["o_orderkey"])
        out += [
            (page, r["o_orderkey"], r["o_custkey"], r["cents"])
            for r in rows
        ]
    return spark.createDataFrame(
        out, "page int, o_orderkey long, o_custkey long, cents long"
    )


@query(
    "q_sort_skyline",
    oracle="""
    WITH pts AS (
      SELECT p_retailprice AS price, p_size AS size,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part GROUP BY 1, 2
    ),
    sky AS (
      SELECT *,
             MAX(size) OVER (
               ORDER BY price ASC, size DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cm
      FROM pts
    )
    SELECT price, size, n_parts
    FROM sky WHERE cm IS NULL OR size > cm
    """,
    category="2.F",
)
def q_sort_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query (Borzsony et al., ICDE 2001):
    the parts no other part beats on BOTH dimensions — cheaper-or-equal
    price AND larger-or-equal size with one strict. The classic
    formulation is an O(n^2) dominance anti-join; sorted by (price ASC,
    size DESC) it collapses to "keep a point iff its size exceeds the
    running max of size over all strictly-earlier points" — O(n log n),
    and the running max is the two-phase distributed cummax
    (operators/dprefix.py two_phase_cummax): range-shuffle on the sort
    key, per-partition local window, triangular broadcast prefix-max
    over the 8-row per-partition maxima — no partition-less WindowExec
    anywhere (plan-gated). Duplicate (price, size) points are collapsed
    first (GROUP BY with a count), which both removes the tie ambiguity
    of the sorted scan and bounds the frontier input to distinct points.
    At 100 TB the dominance join is impossible and this shape is the
    only one that survives: one range shuffle + one broadcast."""
    from aws_lambda_stream_processing_spark.operators.dprefix import (
        two_phase_cummax,
    )

    pts = (
        load_table(spark, sf_dir, "part")
        .groupBy(
            F.col("p_retailprice").alias("price"),
            F.col("p_size").alias("size"),
        )
        .agg(F.count("*").alias("n_parts"))
    )
    sky = two_phase_cummax(
        pts, [("price", True), ("size", False)], "size", out="cm"
    )
    return sky.where(
        F.col("cm").isNull() | (F.col("size") > F.col("cm"))
    ).select("price", "size", "n_parts")
