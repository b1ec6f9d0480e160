"""SQL-text front door + reshaping operators: the engine is not only a
DataFrame API — `spark.sql` over registered views is a first-class entry
point (Catalyst path is identical, §3.2), and pivot/unpivot cover the
wide↔long reshaping a reporting layer needs.

Parity notes: the TPC-H-Q3-shaped query and the correlated subquery run
as SQL TEXT on the Spark side too, proving parser+analyzer coverage, not
just the DataFrame builder. Spark pivot emits grouping key + one column
per pivot value; the oracle mirrors with conditional aggregation (DuckDB
PIVOT's column naming differs — the values are what's checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def _register(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@query(
    "q_sql_tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                          AS BIGINT)) / 100.0, 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c, orders o, lineitem l
    WHERE c.c_mktsegment = 'BUILDING'
      AND c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
    category="2.A",
)
def q_sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping-priority) submitted as SQL TEXT — the parser/
    analyzer front door over registered views, same Catalyst pipeline as
    the DataFrame API from the unresolved plan onward. Revenue sums exact
    integer hundredths-of-cents so the top-10 cut is engine-stable."""
    _register(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT l.l_orderkey,
               -- divide by a DOUBLE: bigint / decimal-literal yields
               -- DECIMAL in Spark, which type-mismatches the oracle
               ROUND(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                    * 100) AS BIGINT))
                     / CAST(100 AS DOUBLE), 2) AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c, orders o, lineitem l
        WHERE c.c_mktsegment = 'BUILDING'
          AND c.c_custkey = o.o_custkey
          AND l.l_orderkey = o.o_orderkey
          AND o.o_orderdate < TIMESTAMP '1995-03-15'
          AND l.l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
        LIMIT 10
        """
    )


@query(
    "q_sql_correlated_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_nationkey
    FROM customer c
    WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    """,
    category="2.C",
)
def q_sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (customers above their nation's average
    balance), as SQL text. Catalyst decorrelates this into an aggregate +
    join (§4) — no per-row re-execution; the plan is a broadcast join
    against the 25-row per-nation average."""
    _register(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_nationkey
        FROM customer c
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


_PIVOT_ORACLE_COLS = ",\n           ".join(
    f"CAST(count_if(event_type = '{t}') AS BIGINT) AS {t}"
    for t in EVENT_TYPES
)


@query(
    "q_pivot",
    oracle=f"""
    SELECT user_id,
           {_PIVOT_ORACLE_COLS}
    FROM events GROUP BY user_id
    """,
    category="2.D",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): per-user event counts, one column per event
    type. Pivot values are declared explicitly — at 100 TB you never let
    the engine scan for the distinct value set first."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )


@query(
    "q_unpivot",
    oracle="""
    WITH wide AS (
      SELECT user_id,
             CAST(count_if(event_type = 'click') AS BIGINT) AS click,
             CAST(count_if(event_type = 'view') AS BIGINT) AS view
      FROM events GROUP BY user_id
    )
    SELECT user_id, metric, n
    FROM wide UNPIVOT (n FOR metric IN (click, view))
    """,
    category="2.D",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (wide → long): the inverse reshaping, via the native
    unpivot operator (a projection + explode under the hood — no shuffle
    beyond the feeding aggregate)."""
    e = load_table(spark, sf_dir, "events")
    wide = (
        e.groupBy("user_id")
        .agg(
            F.count_if(F.col("event_type") == "click").alias("click"),
            F.count_if(F.col("event_type") == "view").alias("view"),
        )
    )
    return wide.unpivot(
        ids=["user_id"],
        values=["click", "view"],
        variableColumnName="metric",
        valueColumnName="n",
    )


@query("q_sample_seeded", oracle=None, category="2.B", tags=("weak",))
def q_sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample (10%) — reproducible within Spark (fixed
    seed per split) but engine-specific RNG → weak check. The 100 TB use
    is cheap corpus statistics without a full scan of downstream ops."""
    e = load_table(spark, sf_dir, "events")
    return e.sample(fraction=0.1, seed=42).select(
        "event_id", "user_id", "event_type"
    )


_Q5_BODY = """
SELECT n.n_name,
       ROUND(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                      AS BIGINT)) / {hundred}, 2) AS revenue,
       COUNT(*) AS n_lines
FROM customer c, orders o, lineitem l, supplier s, nation n, region r
WHERE c.c_custkey = o.o_custkey
  AND l.l_orderkey = o.o_orderkey
  AND l.l_suppkey = s.s_suppkey
  AND c.c_nationkey = s.s_nationkey
  AND s.s_nationkey = n.n_nationkey
  AND n.n_regionkey = r.r_regionkey
  AND r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
"""


@query(
    "q_sql_tpch_q5",
    oracle=_Q5_BODY.format(hundred="100.0"),
    category="2.A",
)
def q_sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume) as SQL TEXT: a 6-way star join with
    the local-supplier correlation (c_nationkey = s_nationkey), region/date
    selection, and exact integer-cents revenue. Catalyst's join ordering +
    broadcast selection handle the dims; the same text (modulo the BIGINT/
    literal division type quirk) runs on both engines. The shape Q5 tests —
    dims broadcast, facts shuffle once on the orderkey chain — is exactly
    the 100 TB plan."""
    _register(
        spark, sf_dir,
        "customer", "orders", "lineitem", "supplier", "nation", "region",
    )
    return spark.sql(_Q5_BODY.format(hundred="CAST(100 AS DOUBLE)"))


# --- TPC-H Q10 / Q18 shapes (round 2) --------------------------------------

# Both run the SAME text on Spark and DuckDB except the BIGINT/literal
# division quirk (Spark types bigint/100.0 as DECIMAL; DuckDB as DOUBLE),
# parameterized exactly like _Q5_BODY via {hundred}.

_Q10_BODY = """
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                          AS BIGINT)) / {hundred}, 2) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c, orders o, lineitem l, nation n
    WHERE c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
      AND o.o_orderdate >= TIMESTAMP '1995-10-01'
      AND o.o_orderdate < TIMESTAMP '1996-01-01'
      AND l.l_returnflag = 'R'
      AND c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
"""


@query(
    "q_sql_tpch_q10",
    oracle=_Q10_BODY.format(hundred="100.0"),
    category="2.A",
)
def q_sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting) as SQL TEXT: fact-fact join
    orders x lineitem on orderkey with a quarter date cut and returnflag
    filter, customer + nation dims broadcast, exact integer-cents revenue,
    engine-stable top-20 (revenue desc, custkey tiebreak). The 100 TB
    plan: both date + returnflag predicates push to the parquet scans,
    the only wide exchange is the orderkey join."""
    _register(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(_Q10_BODY.format(hundred="CAST(100 AS DOUBLE)"))


_Q18_BODY = """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer c, orders o, lineitem l
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 180
    )
      AND c.c_custkey = o.o_custkey
      AND o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
"""


@query(
    "q_sql_tpch_q18",
    oracle=_Q18_BODY.format(),
    category="2.A",
)
def q_sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer) as SQL TEXT: IN-subquery over a
    grouped HAVING aggregate — Catalyst rewrites it to a left-semi join
    against the aggregated lineitem, which re-uses the same orderkey
    partitioning as the main join (one exchange family). l_quantity is
    integral-valued (domain 1-50) so BIGINT sums are exact on both
    engines; ordering ties broken by orderkey for a stable top-100."""
    _register(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q18_BODY)


_LATERAL_BODY = """
    SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
    FROM orders o,
    LATERAL (SELECT l_linenumber, l_extendedprice FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey
             ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) t
    WHERE o.o_orderkey < 1000
"""


@query(
    "q_join_lateral",
    oracle=_LATERAL_BODY,
    category="2.C",
)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY ... LIMIT (top-2
    lineitems per order) — the modern SQL form of top-k-per-group.
    Catalyst decorrelates the lateral into a join + windowed group limit
    rather than re-executing the subquery per outer row; the fully
    deterministic ORDER BY (price DESC, linenumber) makes the cut
    engine-stable. Same text runs on both engines."""
    _register(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_LATERAL_BODY)


_Q14_BODY = """
    SELECT ROUND(
             {hundred} * SUM(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(round(l.l_extendedprice
                                              * (1 - l.l_discount) * 100)
                                        AS BIGINT)
                              ELSE 0 END)
             / SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                        AS BIGINT)),
             4) AS promo_revenue_pct
    FROM lineitem l, part p
    WHERE l.l_partkey = p.p_partkey
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-02-01'
"""


@query(
    "q_sql_tpch_q14",
    oracle=_Q14_BODY.format(hundred="100.0"),
    category="2.A",
)
def q_sql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): promo share of one month's revenue.
    Both the conditional and total revenue sums are exact integer
    hundredths-of-cents, so the single percentage division is one IEEE op
    on identical integers — no float-sum drift despite the CASE. The
    month predicate pushes to the lineitem scan; part joins on partkey
    (broadcast at these SFs, shuffle-hash at 100 TB)."""
    _register(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q14_BODY.format(hundred="CAST(100 AS DOUBLE)"))


_Q19_BODY = """
    SELECT COUNT(*) AS n_lines,
           SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) / {hundred} AS revenue
    FROM lineitem l, part p
    WHERE l.l_partkey = p.p_partkey
      AND (
            (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
             AND l.l_quantity >= 1 AND l.l_quantity <= 20)
         OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
             AND l.l_quantity >= 10 AND l.l_quantity <= 35)
         OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
             AND l.l_quantity >= 20 AND l.l_quantity <= 50)
      )
"""


@query(
    "q_sql_tpch_q19",
    oracle=_Q19_BODY.format(hundred="100.0"),
    category="2.A",
)
def q_sql_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunction of conjunctive
    brand/size/quantity baskets — adapted to this corpus's part columns):
    the OR-of-ANDs predicate is the classic pushdown/join-predicate
    splitting test — Catalyst must keep the join on partkey an equi hash
    join and evaluate the disjunction as a post-join filter (or push the
    per-side conjuncts down), never degrade to a nested loop. Revenue in
    exact integer cents; one scalar output row."""
    _register(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q19_BODY.format(hundred="CAST(100 AS DOUBLE)"))


_Q12_BODY = """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o, lineitem l
    WHERE o.o_orderkey = l.l_orderkey
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
"""


@query(
    "q_sql_tpch_q12",
    oracle=_Q12_BODY,
    category="2.A",
)
def q_sql_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority split — adapted: returnflag
    stands in for the absent l_shipmode): fact-fact orderkey join with a
    year cut and two conditional counts. Integer counts → exact; the
    year predicate pushes to the lineitem scan so the join input is
    pre-filtered — the Q12 plan property that matters at 100 TB."""
    _register(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q12_BODY)


_Q4_BODY = """
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
"""


@query(
    "q_sql_tpch_q4",
    oracle=_Q4_BODY,
    category="2.A",
)
def q_sql_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking — adapted: "some line
    shipped after the order date" stands in for the absent
    commitdate<receiptdate lateness test): correlated EXISTS over the
    fact table. Catalyst rewrites to a LEFT SEMI hash join on orderkey
    with the quarter cut pushed to the orders scan — the semi join
    dedups lineitem matches on the build side, so multi-line orders
    count once. Integer counts -> exact."""
    _register(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q4_BODY)


_Q6_BODY = """
    SELECT SUM(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT))
           / {hundred} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@query(
    "q_sql_tpch_q6",
    oracle=_Q6_BODY.format(hundred="100.0"),
    category="2.A",
)
def q_sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-aggregate,
    no join — the canonical predicate-pushdown + whole-stage-codegen
    benchmark. All three range predicates push to the parquet scan
    (shipdate min/max prunes row groups at 100 TB); revenue is summed in
    exact integer hundredths-of-cents so the single scalar matches the
    oracle bit-for-bit. The BETWEEN on the double discount column
    compares identical parquet doubles to identical literals in both
    engines -> no boundary drift."""
    _register(spark, sf_dir, "lineitem")
    return spark.sql(_Q6_BODY.format(hundred="CAST(100 AS DOUBLE)"))


_Q13_BODY = """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@query(
    "q_sql_tpch_q13",
    oracle=_Q13_BODY,
    category="2.A",
)
def q_sql_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution — comment filter
    dropped with the absent o_comment column): LEFT OUTER join so
    zero-order customers survive into the c_count=0 bucket, then a
    second aggregation over the counts. COUNT(o.o_orderkey) counts
    non-null matches only — the outer-join-then-count-child-column
    semantics that naive COUNT(*) gets wrong. Both aggs are hash aggs
    with map-side partials; the first shuffles on custkey (same key as
    the join -> single exchange), the second on the tiny count domain."""
    _register(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q13_BODY)


_Q17_BODY = """
    SELECT SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
           / {seven} AS avg_yearly
    FROM lineitem l, part p
    WHERE p.p_partkey = l.l_partkey
      AND p.p_brand = 'Brand#2'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
"""


@query(
    "q_sql_tpch_q17",
    oracle=_Q17_BODY.format(seven="700.0"),
    category="2.A",
)
def q_sql_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): correlated scalar AVG
    subquery per partkey. Catalyst decorrelates into a per-partkey
    aggregate joined back on partkey — one extra hash agg + equi join,
    not per-row re-execution. Exactness: l_quantity values are integral
    doubles, so each partkey's SUM is exact and AVG is a single IEEE
    division on identical operands in both engines; the 0.2* threshold
    is one more deterministic float op. Revenue in exact integer cents;
    single scalar out."""
    _register(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17_BODY.format(seven="CAST(700 AS DOUBLE)"))


_Q21_BODY = """
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s, lineitem l1, orders o
    WHERE s.s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL '60' DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate
                                            + INTERVAL '60' DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
"""


@query(
    "q_sql_tpch_q21",
    oracle=_Q21_BODY,
    category="2.A",
)
def q_sql_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting — adapted:
    "shipped >60 days after the order date" stands in for the absent
    receiptdate>commitdate lateness test): the hardest decorrelation in
    the TPC-H suite — EXISTS (another supplier touched the order) AND
    NOT EXISTS (any OTHER supplier was also late), the latter correlated
    to BOTH l1 (orderkey, suppkey<>) and o (the lateness cutoff).
    Catalyst plans semi + anti hash joins on orderkey with the non-equi
    conjuncts as join residuals — no nested-loop fallback. Ties in
    numwait are broken by s_name for a stable LIMIT."""
    _register(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(_Q21_BODY)


_Q22_BODY = """
    SELECT CAST(c.c_nationkey % 5 AS INTEGER) AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           SUM(CAST(round(c.c_acctbal * 100) AS BIGINT))
           / {hundred} AS totacctbal
    FROM customer c
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) >
          (SELECT SUM(CAST(round(c2.c_acctbal * 100) AS BIGINT))
                  / CAST(COUNT(*) AS DOUBLE)
           FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY CAST(c.c_nationkey % 5 AS INTEGER)
    ORDER BY cntrycode
"""


@query(
    "q_sql_tpch_q22",
    oracle=_Q22_BODY.format(hundred="100.0"),
    category="2.A",
)
def q_sql_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-sales-opportunity — adapted: nationkey%5
    stands in for the absent phone-prefix country code, and "no orders
    since 1999" for "never ordered" — every customer in this corpus has
    at least one order, so the spec's unrestricted NOT EXISTS would be
    vacuously empty): uncorrelated scalar AVG threshold + NOT EXISTS
    anti join against recent orders. The
    threshold compares exact integer cents against a single deterministic
    division (exact BIGINT sum / count), so the above-average cut cannot
    drift between engines; the anti join is a broadcast/shuffled hash
    anti on custkey. Balance totals in exact integer cents."""
    _register(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q22_BODY.format(hundred="CAST(100 AS DOUBLE)"))
