"""Spark-4 "programmable SQL" surface (SURVEY.md §2.A): session
variables, EXECUTE IMMEDIATE, SQL-defined scalar/table functions, the
IDENTIFIER() clause, and procedural SQL scripting (BEGIN…END).

These are the session-scripting features an analyst-facing engine needs
so that parameterized report logic lives in SQL itself instead of a
Python templating layer: a variable is set once and referenced by many
statements, EXECUTE IMMEDIATE runs text assembled at run time with safe
parameter binding (USING) and safe identifier binding (IDENTIFIER()),
and CREATE FUNCTION … RETURN makes reusable business logic a catalog
object rather than a copy-pasted expression.

Correctness story: every rung's oracle is plain ANSI SQL with the
variables / function bodies / script result INLINED — so the match pins
that the indirection layer (variable resolution, parameter binding,
UDF inlining, script control flow) is semantically transparent: the
programmable spelling computes exactly what the static spelling does.

Scale story: all of these resolve at ANALYSIS time — variables fold to
literals, SQL UDFs inline into the plan (they are not black-box UDFs:
Catalyst sees through them, so predicate pushdown and codegen are
unaffected), IDENTIFIER() resolves before optimization, and a script
drives ordinary one-statement plans. The physical plans below are the
same scans/aggregations the static queries produce — zero per-row
overhead at 100 TB.

All session-level objects (variables, temp functions) use
OR REPLACE + rung-unique names: queries must be re-runnable in one
long-lived session (bench/driver sweeps) without state collisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table


@query(
    "q_sql_session_variables",
    oracle="""
    WITH params AS (
        SELECT CAST(round(AVG(o_totalprice) * 100) AS BIGINT) / 100.0
                   AS price_floor
        FROM orders
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM orders o, params p
    WHERE o.o_totalprice > p.price_floor
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    category="2.A",
)
def q_sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (Spark 4 `DECLARE VARIABLE` / `SET VAR`):
    a data-driven parameter — the corpus-wide mean order price, rounded
    to cents so both engines agree exactly — is computed ONCE into a
    session variable by `SET VAR … = (scalar subquery)`, then referenced
    by the report query. The oracle inlines the same parameter through a
    CTE, pinning that variable resolution is semantically a literal
    splice. Variables fold at analysis time, so the plan is an ordinary
    filtered aggregate — the `o_totalprice > var` predicate reaches the
    parquet scan as a pushed filter exactly as a literal would; the
    programmable layer costs nothing at scale. DECLARE OR REPLACE keeps
    the rung idempotent in a long-lived session."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("sv_orders")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE sv_price_floor DOUBLE DEFAULT 0.0"
    )
    spark.sql(
        """
        SET VAR sv_price_floor =
            (SELECT CAST(round(AVG(o_totalprice) * 100) AS BIGINT) / 100.0
             FROM sv_orders)
        """
    )
    return spark.sql(
        """
        SELECT o.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS cents
        FROM sv_orders o
        WHERE o.o_totalprice > sv_price_floor
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
        """
    )


@query(
    "q_sql_execute_immediate",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_quantity > 25.0
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    category="2.A",
)
def q_sql_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`EXECUTE IMMEDIATE … USING` + the `IDENTIFIER()` clause — dynamic
    SQL with SAFE binding on both axes: values bind through `?`
    placeholders (never string-spliced, so no quoting/injection
    hazards), and the table name binds through IDENTIFIER(?), the
    analyzer-checked identifier constructor. This is the catalog-driven
    report pattern: one query template, table and thresholds chosen at
    run time. The oracle is the fully static spelling — the match pins
    that parameter binding is a pure literal substitution. Both
    bindings resolve at analysis time, so the executed plan is the
    ordinary pushed-filter scan + hash aggregate; dynamic SQL adds zero
    run-time cost at 100 TB."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "ei_lineitem"
    )
    template = """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        FROM IDENTIFIER(?)
        WHERE l_shipdate >= ? AND l_quantity > ?
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """
    spark.sql(
        "DECLARE OR REPLACE VARIABLE ei_template STRING DEFAULT ''"
    )
    spark.sql("SET VAR ei_template = ?", args=[template])
    return spark.sql(
        """
        EXECUTE IMMEDIATE ei_template
            USING 'ei_lineitem', TIMESTAMP '1995-01-01', 25.0D
        """
    )


@query(
    "q_sql_function_library",
    oracle="""
    WITH buckets AS (
        SELECT o_orderkey, o_totalprice,
               CASE WHEN o_totalprice < 50000  THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'mid'
                    ELSE 'large' END AS bucket
        FROM orders
        WHERE o_orderstatus = 'O'
    ),
    tiers AS (SELECT UNNEST(['small', 'mid', 'large']) AS tier)
    SELECT t.tier,
           CAST(COUNT(b.o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(round(b.o_totalprice * 100) AS BIGINT)),
                         0) AS BIGINT) AS cents
    FROM tiers t LEFT JOIN buckets b ON b.bucket = t.tier
    GROUP BY t.tier
    ORDER BY t.tier
    """,
    category="2.A",
)
def q_sql_function_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined functions as catalog objects (Spark 4
    `CREATE FUNCTION … RETURN`): a SCALAR function encapsulating the
    price-tier business rule, and a TABLE function enumerating the tier
    dimension — joined so every tier appears even when empty (the
    classic report-against-dimension shape). The oracle inlines both
    bodies (CASE expression + UNNEST literal table). Unlike Python
    UDFs, SQL UDFs are transparent to Catalyst: the scalar body inlines
    into the projection (whole-stage codegen keeps running, pushdown
    unaffected) and the table function becomes a local relation — this
    is the function-library mechanism that scales, because it adds
    catalog-level reuse without adding a serialization boundary."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("fl_orders")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION fl_price_tier(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p < 50000  THEN 'small'
                    WHEN p < 150000 THEN 'mid'
                    ELSE 'large' END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION fl_tiers()
        RETURNS TABLE(tier STRING)
        RETURN SELECT explode(array('small', 'mid', 'large'))
        """
    )
    return spark.sql(
        """
        SELECT t.tier,
               CAST(COUNT(b.o_orderkey) AS BIGINT) AS n_orders,
               CAST(COALESCE(SUM(CAST(round(b.o_totalprice * 100)
                                      AS BIGINT)), 0) AS BIGINT) AS cents
        FROM fl_tiers() t
        LEFT JOIN (
            SELECT o_orderkey, o_totalprice,
                   fl_price_tier(o_totalprice) AS bucket
            FROM fl_orders
            WHERE o_orderstatus = 'O'
        ) b ON b.bucket = t.tier
        GROUP BY t.tier
        ORDER BY t.tier
        """
    )


@query(
    "q_sql_scripting",
    oracle="""
    SELECT CAST(round(sqrt(SUM(CAST(round(value * 100) AS BIGINT)
                               / 100.0)) * 1000) AS BIGINT) / 1000.0
               AS sqrt_revenue,
           CAST(20 AS INT) AS n_iters
    FROM events
    WHERE event_type = 'purchase'
    """,
    category="2.A",
)
def q_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procedural SQL scripting (Spark 4 `BEGIN … END` with DECLARE /
    WHILE / SET): a Newton–Raphson loop computing sqrt(total purchase
    revenue) entirely in SQL control flow — 20 iterations from a
    positive seed, quadratically convergent, so the scripted fixed
    point equals the closed-form sqrt to far beyond the 1e-3 rounding
    the rung compares at. The oracle is the closed form. The point
    being pinned: the script's statements each compile to ordinary
    single-statement plans (the aggregate over events runs ONCE, into
    a local variable; the loop iterates over scalars only — no per-
    iteration scan), i.e. scripting is a driver-side control layer
    over the same distributed plans, exactly how an iterative
    computation should be staged at 100 TB: heavy scan once, cheap
    scalar recursion on the result."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("sc_events")
    return spark.sql(
        """
        BEGIN
            DECLARE revenue DOUBLE DEFAULT 0.0;
            DECLARE x DOUBLE DEFAULT 1.0;
            DECLARE i INT DEFAULT 0;
            SET revenue =
                (SELECT SUM(CAST(round(value * 100) AS BIGINT) / 100.0)
                 FROM sc_events WHERE event_type = 'purchase');
            WHILE i < 20 DO
                SET x = 0.5 * (x + revenue / x);
                SET i = i + 1;
            END WHILE;
            -- divide by a DOUBLE literal: bigint / decimal-literal
            -- yields DECIMAL in Spark, which type-mismatches the oracle
            SELECT CAST(round(x * 1000) AS BIGINT) / 1000.0D
                       AS sqrt_revenue,
                   i AS n_iters;
        END
        """
    )


@query(
    "q_sql_unpivot_syntax",
    oracle="""
    WITH wide AS (
        SELECT user_id % 10 AS cohort,
               CAST(SUM(CASE WHEN event_type = 'click'
                        THEN CAST(round(value * 100) AS BIGINT) END)
                    AS BIGINT) AS click,
               CAST(SUM(CASE WHEN event_type = 'view'
                        THEN CAST(round(value * 100) AS BIGINT) END)
                    AS BIGINT) AS view,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100) AS BIGINT) END)
                    AS BIGINT) AS purchase
        FROM events
        GROUP BY 1
    )
    SELECT cohort, etype, cents
    FROM wide UNPIVOT (cents FOR etype IN (click, view, purchase))
    ORDER BY cohort, etype
    """,
    category="2.A",
)
def q_sql_unpivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard `UNPIVOT (value FOR name IN (…))` as IDENTICAL query
    text on both engines — the text-form twin of the DataFrame melt
    (q_unpivot) and the inverse of q_sql_pivot_syntax: a conditional-agg
    wide table melts back to long, and running the same characters
    through both parsers pins the standard's semantics (NULL cells are
    DROPPED by default — the wide table's missing cohort×type cells
    must not resurface as rows). Catalyst lowers UNPIVOT to an Expand
    node (one input row → 3 output rows, no shuffle, no generator UDF);
    at 100 TB melt cost is pure row amplification on the map side,
    which is why the wide aggregate runs FIRST here — melt the
    170-row report, never the 10⁹-row fact."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "up_events"
    )
    return spark.sql(
        """
        WITH wide AS (
            SELECT user_id % 10 AS cohort,
                   CAST(SUM(CASE WHEN event_type = 'click'
                            THEN CAST(round(value * 100) AS BIGINT) END)
                        AS BIGINT) AS click,
                   CAST(SUM(CASE WHEN event_type = 'view'
                            THEN CAST(round(value * 100) AS BIGINT) END)
                        AS BIGINT) AS view,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(round(value * 100) AS BIGINT) END)
                        AS BIGINT) AS purchase
            FROM up_events
            GROUP BY user_id % 10
        )
        SELECT cohort, etype, cents
        FROM wide UNPIVOT (cents FOR etype IN (click, view, purchase))
        ORDER BY cohort, etype
        """
    )


@query(
    "q_sql_hint_repartition",
    oracle="""
    SELECT user_id,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
    WHERE event_type = 'purchase'
    """,
    category="2.A",
)
def q_sql_hint_repartition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioning hints in SQL text — /*+ REPARTITION(8, user_id) */
    and /*+ COALESCE(2) */, the layout-control surface next to the
    join-strategy hints (q_sql_join_hints) and the DISTRIBUTE BY
    clause: REPARTITION inserts an explicit hash exchange on the named
    key at the named width (the writer-prep / pre-bucketing spelling),
    COALESCE then narrows to 2 output partitions WITHOUT a second
    shuffle (a Coalesce node, map-side merge — the small-files fix).
    Hints steer ONLY layout, so the oracle is the bare filtered
    projection with the hint comments invisible to DuckDB, and the
    multiset compare pins content-neutrality while the plan gate
    (tests/test_plans.py) pins both operators at their exact widths
    and their order (coalesce ABOVE the exchange — reversed, the
    shuffle would re-fan-out and the hint pair would be useless). At
    100 TB this pair is the standard 'shuffle to layout, merge to
    file-count' writer recipe."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "rh_events"
    )
    return spark.sql(
        """
        SELECT /*+ COALESCE(2) */ user_id, cents
        FROM (
            SELECT /*+ REPARTITION(8, user_id) */
                   user_id,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM rh_events
            WHERE event_type = 'purchase'
        )
        """
    )


@query(
    "q_sql_order_by_all",
    oracle="""
    SELECT event_type,
           user_id % 7 AS cohort,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    WHERE value > 50.0
    GROUP BY ALL
    ORDER BY ALL
    """,
    category="2.A",
)
def q_sql_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ALL — the modern-SQL shorthand (DuckDB-originated,
    adopted by Spark 4) that sorts by every select-list column left to
    right, closing the GROUP BY ALL / ORDER BY ALL pair the repo's
    q_sql_group_by_all opened: a grouped report becomes fully
    deterministic without naming a single column twice. Semantics
    pinned by the oracle running the LITERAL same shorthand in DuckDB
    (both engines must expand ALL to the same ordered column list —
    the rung certifies cross-engine agreement on the expansion rule
    itself, left-to-right over the select list, not just on the
    rows). Resolution happens at ANALYSIS time: the physical plan is
    an ordinary agg + global sort, identical to the spelled-out
    query, so the shorthand costs nothing at 100 TB — and because ALL
    tracks the select list, a report that gains a column stays
    total-ordered with no edit to the ORDER BY clause (the common
    drift bug in hand-maintained report SQL)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "oba_events"
    )
    return spark.sql(
        """
        SELECT event_type,
               user_id % 7 AS cohort,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM oba_events
        WHERE value > 50.0
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "q_sql_listagg",
    oracle="""
    SELECT r.r_name,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           string_agg(DISTINCT substr(n.n_name, 1, 1), ''
                      ORDER BY substr(n.n_name, 1, 1)) AS initials
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    category="2.A",
)
def q_sql_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE LISTAGG (Spark 4) — the ISO/ANSI ordered string
    concatenation aggregate, in both its WITHIN GROUP form and the
    DISTINCT form (initial letters per region): q_agg_string_agg
    spells the same semantics through concat_ws(sorted collect_list)
    because pre-4.0 Spark had no builtin; this rung certifies the
    builtin against DuckDB's string_agg(... ORDER BY ...) spelling —
    two DIFFERENT surface syntaxes for the same standard aggregate,
    value-identical including the order guarantee and DISTINCT-
    before-ordering semantics. The builtin matters at scale: it
    evaluates as a sort-based aggregate inside the JVM (no array
    materialization per group in the plan the collect_list form
    builds), and the ORDER BY is per-group, never global. Group
    cardinality discipline still applies — LISTAGG output is O(group
    members); use it on bounded dims (here: 25 nations over 5
    regions), never on fact-scale groups."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "la_nation"
    )
    load_table(spark, sf_dir, "region").createOrReplaceTempView(
        "la_region"
    )
    return spark.sql(
        """
        SELECT r.r_name,
               CAST(COUNT(*) AS BIGINT) AS n_nations,
               listagg(n.n_name, ',')
                   WITHIN GROUP (ORDER BY n.n_name) AS nations,
               listagg(DISTINCT substr(n.n_name, 1, 1), '')
                   WITHIN GROUP (ORDER BY substr(n.n_name, 1, 1))
                   AS initials
        FROM la_nation n JOIN la_region r
          ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        ORDER BY r.r_name
        """
    )


_TRANSPOSE_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "q_transpose",
    oracle="""
    WITH a AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS sum_cents,
             CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS max_cents
      FROM events GROUP BY event_type
    )
    SELECT 'n_events' AS key,
           MAX(CASE WHEN event_type = 'click' THEN n_events END) AS click,
           MAX(CASE WHEN event_type = 'error' THEN n_events END) AS error,
           MAX(CASE WHEN event_type = 'purchase' THEN n_events END)
               AS purchase,
           MAX(CASE WHEN event_type = 'signup' THEN n_events END) AS signup,
           MAX(CASE WHEN event_type = 'view' THEN n_events END) AS view
    FROM a
    UNION ALL
    SELECT 'sum_cents',
           MAX(CASE WHEN event_type = 'click' THEN sum_cents END),
           MAX(CASE WHEN event_type = 'error' THEN sum_cents END),
           MAX(CASE WHEN event_type = 'purchase' THEN sum_cents END),
           MAX(CASE WHEN event_type = 'signup' THEN sum_cents END),
           MAX(CASE WHEN event_type = 'view' THEN sum_cents END)
    FROM a
    UNION ALL
    SELECT 'max_cents',
           MAX(CASE WHEN event_type = 'click' THEN max_cents END),
           MAX(CASE WHEN event_type = 'error' THEN max_cents END),
           MAX(CASE WHEN event_type = 'purchase' THEN max_cents END),
           MAX(CASE WHEN event_type = 'signup' THEN max_cents END),
           MAX(CASE WHEN event_type = 'view' THEN max_cents END)
    FROM a
    """,
    category="2.D",
)
def q_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame.transpose (Spark 4.0) — the matrix flip of a bounded
    metrics report: per-event-type (n, sum, max) becomes one column
    per event type and one row per METRIC, the orientation a
    scorecard/dashboard wants. The r8 probe pinned the semantics: the
    FIRST column is the index whose VALUES become output column names,
    every remaining column becomes a row keyed by its original name in
    a `key` column, and the transposed values must share a least
    common type (all BIGINT here — mixed types would widen to string
    and break value equality). The oracle is the spelled-out
    conditional-aggregation pivot + per-metric UNION ALL over the
    same five types, so both the column-naming rule and the row set
    are certified, not just the cell values. Scale: transpose is a
    DRIVER-side reshape of an already-aggregated BOUNDED frame (5
    types x 3 metrics) — the distributed work is the upstream
    map-side agg; never call it on an unaggregated fact table (the
    column count would be the row count)."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    agg = (
        e.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(cents).cast("long").alias("sum_cents"),
            F.max(cents).cast("long").alias("max_cents"),
        )
    )
    return agg.transpose()
