"""Aggregation operators (SURVEY.md §2.D).

The reference architecture's only aggregates are hand-rolled per-record
counters flushed to DynamoDB (reconstructed Lambda+Kinesis semantics —
/root/reference/README.md:3-4 names the architecture; the snapshot ships no
code). Here every aggregate is a Catalyst hash-aggregate: partial (map-side)
combine then final merge after a shuffle on the grouping key — the shape that
scales linearly to 100 TB. Float sums use exact order-independent
accumulation for oracle bit-parity — fixed-point int64 (isum) on the hot
lineitem-scale paths, wide decimal (dsum) elsewhere (see parity.py for the
tradeoff and overflow bounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.parity import (
    DEC,
    davg,
    dsum,
    iavg,
    isum,
    sql_davg,
    sql_dsum,
    sql_iavg,
    sql_isum,
)
from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table


@query(
    "q_agg_global",
    oracle="""
    SELECT COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(l_extendedprice) AS avg_price,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship
    FROM lineitem
    """,
    category="2.D",
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global count/sum/avg/min/max — the canonical Lambda 'DynamoDB counter'
    expressed as a single partial+final hash aggregate (no grouping shuffle;
    one-row reduce)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("cnt"),
        dsum("l_quantity", "sum_qty"),
        davg("l_extendedprice", "avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@query(
    "q_agg_groupby",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {sql_isum("l_quantity", "sum_qty")},
           {sql_isum("l_extendedprice", "sum_base_price")},
           {sql_isum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {sql_isum(
               "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
               "sum_charge",
           )},
           {sql_iavg("l_quantity", "avg_qty")},
           {sql_iavg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    category="2.D",
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H Q1 shape): hash aggregate over a low-cardinality key.

    Scale path: partial aggregation collapses 100 TB of lineitem to ~6 rows
    per map task before the shuffle — the exchange carries kilobytes. The
    per-row products stay as IEEE doubles (bit-identical on any engine); the
    commutative sums are exact fixed-point int64 (isum — 4× faster than the
    decimal path and still order-independent; see parity.py for the
    overflow bound and when to fall back to dsum).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        isum("l_quantity", "sum_qty"),
        isum("l_extendedprice", "sum_base_price"),
        isum(disc_price, "sum_disc_price"),
        isum(charge, "sum_charge"),
        iavg("l_quantity", "avg_qty"),
        iavg("l_discount", "avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "q_agg_count_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS uniq_cust,
           COUNT(*) AS cnt
    FROM orders
    GROUP BY o_orderpriority
    """,
    category="2.D",
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT): Catalyst expands to a two-stage aggregate
    (distinct on (key, custkey) then count) — no driver-side set."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("uniq_cust"),
        F.count("*").alias("cnt"),
    )


@query(
    "q_agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS uniq_parts,
           COUNT(DISTINCT l_suppkey) AS uniq_supps,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="2.D",
)
def q_agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two DISTINCT aggregates in one query → Catalyst `Expand` rewrite
    (one pass over the data, grouping-id-tagged rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("uniq_parts"),
        F.countDistinct("l_suppkey").alias("uniq_supps"),
        F.count("*").alias("cnt"),
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS std_qty,
           ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_discount), 4) AS covar_qty_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="2.D",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates. These use each engine's native accumulation
    (order-dependent at ~1e-12 relative error), so outputs are rounded to 4
    decimals on both sides — the one place SURVEY §2 convention 3 applies."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 4).alias("covar_qty_disc"),
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_spend,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    """,
    category="2.D",
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter; Catalyst keeps it after the final
    aggregate (cannot push through), exactly like the SQL form."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(dsum("o_totalprice", "total_spend"), F.count("*").alias("n_orders"))
        .where(F.col("n_orders") >= 3)
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT n_name,
           c_mktsegment,
           GROUPING(n_name) AS g_nation,
           GROUPING(c_mktsegment) AS g_segment,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
    category="2.D",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (nation → segment → grand total) with GROUPING()
    markers; Catalyst implements via Expand (row replicated per grouping
    set, partial-agg'd before shuffle — 100 TB safe)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return joined.rollup("n_name", "c_mktsegment").agg(
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.grouping("c_mktsegment").cast("int").alias("g_segment"),
        F.count("*").alias("cnt"),
        dsum("c_acctbal", "sum_bal"),
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(round(l_quantity * 1000000) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    category="2.D",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count("*").alias("cnt"),
        isum("l_quantity", "sum_qty"),
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    category="2.D",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same Expand-based plan)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               COUNT(*) AS cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q_agg_percentile",
    oracle="""
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90,
           ROUND(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    GROUP BY event_type
    """,
    category="2.D",
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (stream-latency-style reporting).

    Scale path: exact percentile materializes per-group value lists; at
    100 TB swap to `approx_percentile` (KLL/GK sketch, mergeable, bounded
    memory) — declared separately as weak since sketches can't hash-match.
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY event_type) AS types_joined,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
    category="2.D",
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation → canonical string (SURVEY §2 convention 4:
    arrays are compared as sorted joined strings)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_list("event_type")), ",").alias(
            "types_joined"
        ),
        F.count("*").alias("n_events"),
    )


@query(
    "q_agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS est_within_6pct,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="2.D",
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate count-distinct — the 100 TB path for distinct
    counting (mergeable sketch, O(1) memory per group) — certified
    against the exact count inside the query (r8 verdict item 3: the
    q_scale_hll_partitioned pattern). HLL++ register updates are max()
    operations, so for fixed data and rsd the estimate is deterministic
    regardless of partitioning; at rsd=0.02 the standard error is 2%,
    so the 6% (3σ) gate is a real certification the driver can hash,
    not a tautology. The raw estimate stays out of the hashed columns
    because its exact value is engine-specific; its ERROR BOUND is not.
    Unlike the GK rank brackets this is a STATISTICAL bound, not a
    structural guarantee — the fixture margin is measured and wide
    (max relative error 0.50% / 0.95% / 1.03% at sf0.001/0.01/0.1,
    r9 probe — 5.8× inside the gate; same discipline as
    q_scale_hll_partitioned's 3% gate at ~1.6% standard error)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count("*").alias("cnt"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            / F.col("exact_parts")
            < 0.06
        ).alias("est_within_6pct"),
        "cnt",
    )


@query(
    "q_agg_min_max_by",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, value, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id DESC) AS rn_max,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value ASC, event_id ASC) AS rn_min
      FROM events
    )
    SELECT a.user_id, a.event_type AS top_event, b.event_type AS bottom_event
    FROM (SELECT user_id, event_type FROM ranked WHERE rn_max = 1) a
    JOIN (SELECT user_id, event_type FROM ranked WHERE rn_min = 1) b
      USING (user_id)
    """,
    category="2.D",
)
def q_agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin per group via max_by/min_by over a (value, event_id)
    struct — the struct tiebreak makes ties deterministic (doubles can
    collide). Single hash-agg, no window shuffle."""
    e = load_table(spark, sf_dir, "events")
    ordkey = F.struct(F.col("value"), F.col("event_id"))
    return e.groupBy("user_id").agg(
        F.max_by("event_type", ordkey).alias("top_event"),
        F.min_by("event_type", ordkey).alias("bottom_event"),
    )


@query(
    "q_agg_approx_percentile",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
    FROM events
    GROUP BY event_type
    """,
    category="2.D",
)
def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via the KLL/GK-style sketch
    (approx_percentile) — the 100 TB path for latency-percentile
    reporting where exact percentile's full sort per group is off the
    table — certified against exact RANK truth inside the query (r8
    verdict item 3). The GK sketch guarantees a returned element whose
    rank is within ε·N of the target regardless of merge order, so the
    per-quantile booleans (rank of the estimate within ±1% of the
    target quantile, plus a 1/N discreteness slack) are deterministic
    TRUE for any legal execution — hashable truth about an
    engine-specific estimate. Rank check uses count(<est) / count(<=est)
    bracketing so duplicate values can't fake a failure. One extra
    broadcast join of group-sized estimates back to events: scale-safe."""
    e = load_table(spark, sf_dir, "events")
    pcts = F.percentile_approx("value", [0.5, 0.9, 0.99], 10000)
    est = e.groupBy("event_type").agg(
        pcts.alias("ps"), F.count("*").alias("cnt")
    )
    j = e.join(F.broadcast(est), "event_type")
    checks = []
    for i, q in enumerate((0.5, 0.9, 0.99)):
        p = F.element_at(F.col("ps"), i + 1)
        n_lt = F.sum((F.col("value") < p).cast("long"))
        n_le = F.sum((F.col("value") <= p).cast("long"))
        n = F.first("cnt")
        slack = F.lit(0.01) + 1.0 / n
        checks.append(
            (
                (n_lt / n <= F.lit(q) + slack)
                & (n_le / n >= F.lit(q) - slack)
            ).alias(f"p{int(q * 100)}_ok")
        )
    return j.groupBy("event_type").agg(
        F.first("cnt").alias("cnt"), *checks
    )


@query(
    "q_agg_freq_items",
    oracle="""
    SELECT event_type,
           user_id % 10 AS cohort,
           COUNT(*) AS cnt
    FROM events
    GROUP BY event_type, user_id % 10
    HAVING COUNT(*) > (SELECT COUNT(*) FROM events) / 100
    """,
    category="2.D",
)
def q_agg_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: counts for keys above a support threshold — the
    count-min/space-saving shape. Implemented exactly (count + filter, two
    map-side-combining aggs) so it carries an exact oracle (promoted from
    weak in round 2 — the count+threshold cut is deterministic). At 100 TB
    the same query runs unchanged; the sketch variant only matters when
    the key cardinality itself is RAM-breaking."""
    e = load_table(spark, sf_dir, "events")
    n = e.agg(F.count("*").alias("n"))
    return (
        e.groupBy("event_type", (F.col("user_id") % 10).alias("cohort"))
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(n))
        .where(F.col("cnt") > F.col("n") / 100)
        .drop("n")
    )


@query(
    "q_agg_conditional",
    oracle="""
    SELECT event_type,
           CAST(count_if(value > 100) AS BIGINT) AS n_big,
           bool_and(value > 0) AS all_positive,
           bool_or(value > 300) AS any_huge,
           CAST(SUM(DISTINCT user_id % 10) AS BIGINT) AS sum_distinct_cohorts
    FROM events GROUP BY event_type
    """,
    category="2.D",
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / boolean aggregate family: count_if, bool_and, bool_or,
    sum(DISTINCT) — all distributive or distinct-expandable, so the shuffle
    carries one partial row per (partition, group)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count_if(F.col("value") > 100).alias("n_big"),
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") > 300).alias("any_huge"),
        F.sum_distinct(F.col("user_id") % 10).alias("sum_distinct_cohorts"),
    )


@query(
    "q_ts_rollup_multires",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           CAST(GROUPING(date_trunc('day', ts)) AS INTEGER) AS g_day,
           CAST(GROUPING(date_trunc('hour', ts)) AS INTEGER) AS g_hour,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    GROUP BY GROUPING SETS (
      (date_trunc('day', ts), date_trunc('hour', ts)),
      (date_trunc('day', ts)),
      ()
    )
    """,
    category="2.D",
)
def q_ts_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time-series rollup (the continuous-aggregate /
    hypertable shape): hourly, daily and grand totals in ONE pass via
    grouping sets — the engine computes the finest level and rolls up,
    instead of three scans. GROUPING() flags disambiguate levels. At
    100 TB this materializes to a date-partitioned summary table the
    dashboards hit instead of the raw stream."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "events_rollup_v"
    )
    return spark.sql(
        """
        SELECT date_trunc('day', ts) AS day,
               date_trunc('hour', ts) AS hour,
               CAST(GROUPING(date_trunc('day', ts)) AS INT) AS g_day,
               CAST(GROUPING(date_trunc('hour', ts)) AS INT) AS g_hour,
               COUNT(*) AS n,
               SUM(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events_rollup_v
        GROUP BY GROUPING SETS (
          (date_trunc('day', ts), date_trunc('hour', ts)),
          (date_trunc('day', ts)),
          ()
        )
        """
    )


@query(
    "q_agg_mode",
    oracle="""
    WITH counted AS (
      SELECT user_id, event_type, COUNT(*) AS cnt,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events
      GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS mode_event, cnt AS mode_count
    FROM counted WHERE rn = 1
    """,
    category="2.D",
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent event_type per user): built as
    count + per-group argmax with an explicit lexicographic tie-break —
    NOT F.mode(), whose tie behavior is unspecified and engine-divergent.
    Two hash aggregates + a WindowGroupLimit (only rank-1 rows survive the
    exchange); at 100 TB both aggregations partial-combine map-side so the
    shuffle carries one row per (user, type)."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    counted = e.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("cnt"), F.asc("event_type")
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event"),
            F.col("cnt").alias("mode_count"),
        )
    )


@query(
    "q_agg_histogram",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 25.0) AS BIGINT) AS bucket,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS bucket_value
    FROM events
    GROUP BY 1, 2
    """,
    category="2.D",
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (25-unit buckets) per event type — the
    dashboard distribution primitive, as one hash aggregate on a computed
    key (floor division is identical integer math on both engines; bucket
    totals use exact integer cents). At 100 TB this partial-aggregates
    map-side to (types × buckets) rows per task regardless of input size."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        "event_type",
        F.floor(F.col("value") / 25.0).cast("long").alias("bucket"),
    ).agg(
        F.count("*").alias("cnt"),
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / F.lit(100.0)
        ).alias("bucket_value"),
    )


@query(
    "q_agg_percentile_array",
    oracle="""
    SELECT event_type,
           array_to_string(
             list_transform(quantile_cont(value, [0.25, 0.5, 0.75, 0.95]),
                            q -> CAST(ROUND(q, 4) AS VARCHAR)),
             ',') AS quartiles
    FROM events
    GROUP BY event_type
    """,
    category="2.D",
)
def q_agg_percentile_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-quantile in ONE pass: percentile over a literal array sorts
    each group's values once and interpolates all cut points from it —
    4 quantiles for the cost of one (vs 4 separate sorted-agg passes).
    Array results are serialized to a comma-joined string per SURVEY §2
    convention 4 (array hash representations differ between engines)."""
    e = load_table(spark, sf_dir, "events")
    qs = F.percentile(
        "value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95))
    )
    return e.groupBy("event_type").agg(
        F.array_join(
            F.transform(qs, lambda q: F.round(q, 4).cast("string")), ","
        ).alias("quartiles")
    )


@query(
    "q_agg_incremental_merge",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    category="2.D",
)
def q_agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance by partial-aggregate merge: the
    'materialized' pre-1999 aggregate and the 'arriving delta' (1999+)
    aggregate are computed separately, then MERGED by summing partials —
    count and integer-cents sum are commutative monoids, so
    merge(agg(A), agg(B)) == agg(A ∪ B) exactly, which is what the
    full-recompute oracle certifies. This is the foreachBatch-upsert /
    streaming-partial-agg contract (`q_stream_upsert_foreachbatch`,
    `q_stream_running_state`) stated as a batch algebra law.

    Scale shape: the delta agg touches only delta partitions (orderdate
    pruning pushes to the scan); the merge re-agg runs over 2x|groups|
    rows, not data. At 100 TB this is the difference between re-reading
    the lake and reading yesterday's summary plus today's partition."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    cut = F.lit("1999-01-01").cast("timestamp")

    def part(df):
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_orders"),
            F.sum(cents).alias("total_cents"),
        )

    base = part(o.where(F.col("o_orderdate") < cut))
    delta = part(o.where(F.col("o_orderdate") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("total_cents").alias("total_cents"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS wt
      FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)
    ),
    c AS (
      SELECT l_returnflag, qty, wt,
             CAST(SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY qty)
                  AS BIGINT) AS cumw,
             CAST(SUM(wt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS totw
      FROM w
    )
    SELECT l_returnflag, CAST(MIN(qty) AS BIGINT) AS weighted_median_qty
    FROM c WHERE 2 * cumw >= totw
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    category="2.D",
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-weighted median quantity per returnflag: the smallest
    quantity whose cumulative revenue weight reaches half the total —
    the 'what quantity does half the money sit below' statistic that an
    unweighted median misstates. Pre-aggregating to the (flag, qty)
    domain FIRST bounds the windowed rows by the quantity domain (50
    values), not the fact table — the running sum then costs nothing at
    any scale. All weights are exact integer cents; the crossing test
    2*cumw >= totw stays in integers (no /2, no float)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("qty")
    ).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "wt"
        )
    )
    win_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("qty")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    win_tot = Window.partitionBy("l_returnflag")
    c = w.select(
        "l_returnflag",
        "qty",
        F.sum("wt").over(win_cum).alias("cumw"),
        F.sum("wt").over(win_tot).alias("totw"),
    )
    return (
        c.where(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("l_returnflag")
        .agg(F.min("qty").alias("weighted_median_qty"))
        .orderBy("l_returnflag")
    )


@query(
    "q_agg_bitmap_distinct",
    oracle="""
    WITH words AS (
      SELECT event_type,
             user_id // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INTEGER))
               AS bits
      FROM events
      GROUP BY event_type, user_id // 32
    )
    SELECT event_type,
           CAST(SUM(bit_count(bits)) AS BIGINT) AS n_users_bitmap
    FROM words
    GROUP BY event_type
    ORDER BY event_type
    """,
    category="2.D",
)
def q_agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user count per event_type via BITMAP aggregation
    (the roaring/groupBitmap pattern): pack user ids into 32-bit words
    (word = id//32, bit = id%32 — 32 not 64: DuckDB range-checks signed
    shifts, so bit 63 would overflow its BIGINT), OR the words per group,
    popcount-sum. Equivalent to COUNT(DISTINCT) but the shuffled state is
    |id-domain|/32
    words per group instead of one row per distinct id — the bitmap is
    the mergeable summary, which is why OLAP engines ship it as a
    first-class agg. Pure integer ops; exact on both engines.

    Scale note: for sparse 64-bit id spaces the word layer keys the
    bitmap (that IS roaring's chunking); the dense-word math here is the
    in-chunk representation."""
    e = load_table(spark, sf_dir, "events")
    words = e.groupBy(
        "event_type", F.expr("user_id div 32").alias("word")
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT),"
            " CAST(user_id % 32 AS INT)))"
        ).alias("bits")
    )
    return (
        words.groupBy("event_type")
        .agg(F.sum(F.bit_count("bits")).alias("n_users_bitmap"))
        .orderBy("event_type")
    )


@query(
    "q_agg_string_agg",
    oracle="""
    SELECT c_mktsegment,
           string_agg(DISTINCT c_nationkey::VARCHAR, ','
                      ORDER BY c_nationkey::VARCHAR) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    category="2.D",
)
def q_agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / string_agg — the SQL-standard ordered string
    concatenation aggregate (report columns like 'nations present per
    segment'). Spark expresses it as concat_ws over a SORTED collected
    set, which is exactly string_agg(DISTINCT ... ORDER BY ...): the
    explicit array_sort makes the result order-deterministic under any
    partitioning (collect_set order is not). Output is scalar strings —
    canonicalizer-safe per §2 convention 4. Note the sort is LEXICAL on
    the stringified key to keep one ordering rule on both engines."""
    c = load_table(spark, sf_dir, "customer")
    nations = F.array_join(
        F.array_sort(
            F.collect_set(F.col("c_nationkey").cast("string"))
        ),
        ",",
    )
    return (
        c.groupBy("c_mktsegment")
        .agg(
            nations.alias("nations"),
            F.count("*").alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_agg_topn_other",
    oracle="""
    WITH rev AS (
      SELECT user_id,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY user_id
    ),
    top5 AS (
      SELECT user_id FROM rev ORDER BY cents DESC, user_id LIMIT 5
    )
    SELECT CASE WHEN r.user_id IN (SELECT user_id FROM top5)
                THEN CAST(r.user_id AS VARCHAR) ELSE 'OTHER' END
             AS bucket,
           CAST(SUM(r.cents) AS BIGINT) AS cents,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM rev r
    GROUP BY 1
    ORDER BY cents DESC, bucket
    """,
    category="2.D",
)
def q_agg_topn_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N-plus-OTHER — the reporting rollup every dashboard draws
    (five named leaders, the long tail folded into one bar): leaders
    come from a TakeOrdered top-5 (per-partition heads merged on the
    driver, never a global sort), broadcast back as the bucket
    predicate, then one re-aggregation. Deterministic leaders via the
    (cents desc, user_id) total order; exact int64 throughout. At
    100 TB this is two map-side-combining aggs + one 5-row broadcast —
    the tail never moves."""
    e = load_table(spark, sf_dir, "events")
    rev = e.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    top5 = (
        rev.orderBy(F.desc("cents"), "user_id")
        .limit(5)
        .select(F.col("user_id").alias("tu"))
    )
    return (
        rev.join(F.broadcast(top5), rev.user_id == F.col("tu"), "left")
        .select(
            F.when(
                F.col("tu").isNotNull(), F.col("user_id").cast("string")
            )
            .otherwise(F.lit("OTHER"))
            .alias("bucket"),
            "cents",
        )
        .groupBy("bucket")
        .agg(
            F.sum("cents").alias("cents"),
            F.count("*").alias("n_users"),
        )
        .orderBy(F.desc("cents"), "bucket")
    )


@query(
    "q_agg_bool",
    oracle="""
    SELECT event_type,
           bool_and(value > 0) AS all_positive,
           bool_or(value > 400) AS any_large,
           bool_and(props IS NOT NULL) AS props_complete,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    category="2.D",
)
def q_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (bool_and / bool_or — SQL's EVERY and ANY):
    the data-quality assertion shape ("does EVERY row of this type
    satisfy the invariant? does ANY row breach the bound?") that
    otherwise gets written as count-vs-count comparisons. Boolean
    and/or are commutative and short-circuitable, so the partial
    aggregation is a 1-bit state per group per map task — the cheapest
    possible exchange. Exact by construction (no floats cross the
    wire)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") > 400).alias("any_large"),
        F.bool_and(F.col("props").isNotNull()).alias("props_complete"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_percentile_disc",
    oracle="""
    SELECT event_type,
           quantile_disc(value, 0.5) AS p50_disc,
           quantile_disc(value, 0.9) AS p90_disc,
           quantile_disc(value, 0.99) AS p99_disc
    FROM events GROUP BY event_type
    """,
    category="2.D",
)
def q_agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles — the SLA-reporting semantics (percentile_disc
    / quantile_disc: the smallest ACTUAL observation at-or-above the
    rank, never an interpolated value that no request experienced;
    q_agg_percentile is the interpolated twin). Implemented as an exact
    positional pick: sort each group's values, take element
    ceil(p·n) — both engines define quantile_disc by that rank, so the
    returned doubles are bit-identical corpus values with ZERO
    arithmetic performed on them. Scale caveat as the interpolated
    twin: exact per-group value lists; at 100 TB swap to
    approx_percentile (declared weak separately)."""
    e = load_table(spark, sf_dir, "events")
    vals = e.groupBy("event_type").agg(
        F.sort_array(F.collect_list("value")).alias("vs"),
        F.count("value").alias("n"),
    )
    def disc(p: float, alias: str):
        idx = F.ceil(F.lit(p) * F.col("n")).cast("int")
        return F.element_at("vs", idx).alias(alias)
    return vals.select(
        "event_type",
        disc(0.5, "p50_disc"),
        disc(0.9, "p90_disc"),
        disc(0.99, "p99_disc"),
    )


@query(
    "q_agg_grouping_id",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(2 * GROUPING(o_orderpriority)
                + GROUPING(o_orderstatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    category="2.D",
)
def q_agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() flags over a CUBE — the disambiguation companion to
    q_agg_cube: a NULL grouping key in a cube row is ambiguous (real
    NULL data vs subtotal placeholder) until GROUPING() marks which
    columns were rolled away. The combined id is computed explicitly as
    2*g(prio)+g(status) on BOTH engines rather than via the engines'
    native grouping_id()/GROUPING(a,b) encodings — the bit order of the
    packed form is engine-defined, the explicit arithmetic is not.
    Plans as the ordinary Expand + two-phase hash agg; the flags ride
    the Expand output for free (no extra pass)."""
    o = load_table(spark, sf_dir, "orders")
    gp = F.grouping("o_orderpriority").cast("bigint")
    gs = F.grouping("o_orderstatus").cast("bigint")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            gp.alias("g_prio"),
            gs.alias("g_status"),
            (gp * 2 + gs).alias("gid"),
            F.count("*").alias("n"),
        )
        .orderBy(
            "gid",
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
        .select(
            "o_orderpriority", "o_orderstatus",
            "g_prio", "g_status", "gid", "n",
        )
    )


@query(
    "q_agg_kendall_tau",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        FROM events
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.event_type,
               CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS nc,
               CAST(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS nd,
               CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2,
               CAST(COUNT(*) AS BIGINT) AS n0
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
        GROUP BY a.event_type
    )
    SELECT event_type, nc, nd,
           CASE WHEN (nc - nd) >= 0
                THEN floor((nc - nd)
                           / sqrt(CAST(n0 - n1 AS DOUBLE) * (n0 - n2))
                           * 1000000.0 + 0.5) / 1000000.0
                ELSE -floor(-(nc - nd)
                            / sqrt(CAST(n0 - n1 AS DOUBLE) * (n0 - n2))
                            * 1000000.0 + 0.5) / 1000000.0
           END AS tau_b
    FROM pairs
    ORDER BY event_type
    """,
    category="2.D",
)
def q_agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b — the third member of the correlation family
    (Pearson q_agg_corr_exact, Spearman q_agg_spearman): rank
    correlation between daily event volume and daily revenue, per
    event type, with the tie correction (tau-b = (nc−nd)/
    √((n0−n1)(n0−n2)), n1/n2 = x-tied/y-tied pair counts — pairs tied
    in both count in both, per the standard definition). Both series
    are exact integers (counts, cents), so concordance is pure integer
    sign algebra; the single sqrt+division runs over identical
    operands on both engines, floor-rounded half-up at 6dp with a
    negative mirror (tau is signed). Implementation is the O(n²)
    pair self-join — correct HERE because the series is bounded (≤31
    points per group, ≤465 pairs); the docstring contract is that at
    unbounded n the merge-sort inversion-count formulation replaces
    the pair join (same answer, n·log n), exactly like the Spearman
    rung's window path. Scale: the daily pre-aggregation is the only
    pass over raw events; the pair join runs on 155 rows."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count("*").cast("bigint").alias("x"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint").alias("y"),
    )
    a, b = daily.alias("a"), daily.alias("b")
    prod = (F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0))
            .cast("bigint").alias("nc"),
            F.sum(F.when(prod < 0, 1).otherwise(0))
            .cast("bigint").alias("nd"),
            F.sum(F.when(F.col("a.x") == F.col("b.x"), 1).otherwise(0))
            .cast("bigint").alias("n1"),
            F.sum(F.when(F.col("a.y") == F.col("b.y"), 1).otherwise(0))
            .cast("bigint").alias("n2"),
            F.count("*").cast("bigint").alias("n0"),
        )
    )
    tau = (F.col("nc") - F.col("nd")) / F.sqrt(
        (F.col("n0") - F.col("n1")).cast("double")
        * (F.col("n0") - F.col("n2"))
    )
    return pairs.select(
        "event_type", "nc", "nd",
        F.when(
            (F.col("nc") - F.col("nd")) >= 0,
            F.floor(tau * 1000000.0 + F.lit(0.5)) / 1000000.0,
        ).otherwise(
            -F.floor(-tau * 1000000.0 + F.lit(0.5)) / 1000000.0
        ).alias("tau_b"),
    ).orderBy("event_type")
