"""Date/time function family (SURVEY.md §2.H: q_date_*, q_ts_convert).

Event-time bucketing is the heart of stream analytics; everything here is
UTC-pinned (session timezone) so Spark and DuckDB agree. Parity traps:
  - dayofweek: Spark 1=Sunday, DuckDB 0=Sunday → oracle adds +1;
  - Spark extract functions return INT, DuckDB date_part returns BIGINT →
    oracle casts;
  - months_between has Oracle-heritage 31-day semantics → oracle replicates
    the formula (midnight-only dates keep it simple);
  - DuckDB to_timestamp() returns TIMESTAMPTZ (session-tz-dependent) →
    oracle uses make_timestamp(µs) which is naive on both engines;
  - DATE-typed outputs are cast to midnight TIMESTAMP (Spark DateType
    surfaces as python dates in pandas, DuckDB DATE as datetime64 —
    timestamps are dtype-identical on both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table


@query(
    "q_date_extract",
    oracle="""
    SELECT event_id,
           date_part('year', ts)::INT AS y,
           date_part('month', ts)::INT AS mo,
           date_part('day', ts)::INT AS d,
           date_part('hour', ts)::INT AS h,
           date_part('minute', ts)::INT AS mi,
           date_part('quarter', ts)::INT AS q,
           (dayofweek(ts) + 1)::INT AS dow,
           date_part('doy', ts)::INT AS doy,
           weekofyear(ts)::INT AS wk
    FROM events
    """,
    category="2.H",
)
def q_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar field extraction (year..minute, quarter, dayofweek with the
    +1 Sunday-origin shift, ISO week on both engines)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.quarter("ts").alias("q"),
        F.dayofweek("ts").alias("dow"),
        F.dayofyear("ts").alias("doy"),
        F.weekofyear("ts").alias("wk"),
    )


@query(
    "q_date_trunc",
    oracle="""
    SELECT event_id,
           date_trunc('day', ts) AS t_day,
           date_trunc('hour', ts) AS t_hour,
           date_trunc('week', ts) AS t_week,
           date_trunc('month', ts) AS t_month
    FROM events
    """,
    category="2.H",
)
def q_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc at day/hour/week/month grains — the tumbling-window
    precursor (week = ISO Monday start on both engines)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_trunc("day", "ts").alias("t_day"),
        F.date_trunc("hour", "ts").alias("t_hour"),
        F.date_trunc("week", "ts").alias("t_week"),
        F.date_trunc("month", "ts").alias("t_month"),
    )


@query(
    "q_date_arith",
    oracle="""
    SELECT o_orderkey,
           (o_orderdate::DATE + 5)::TIMESTAMP AS plus5,
           date_diff('day', DATE '1995-01-01', o_orderdate::DATE)::INT AS days_since,
           (o_orderdate::DATE + INTERVAL 2 MONTH)::DATE::TIMESTAMP AS plus2mo,
           last_day(o_orderdate::DATE)::TIMESTAMP AS month_end,
           ROUND(
             (date_part('year', o_orderdate) - 1995) * 12
             + (date_part('month', o_orderdate) - 1)
             + CASE WHEN date_part('day', o_orderdate) = 1 THEN 0
                    ELSE (date_part('day', o_orderdate) - 1) / 31.0 END,
             4) AS months_since
    FROM orders
    """,
    category="2.H",
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_add / datediff / add_months / last_day / months_between.
    The oracle replicates months_between's 31-day-fraction formula exactly
    (orderdates are midnight-only, so no time-part term)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_add("o_orderdate", 5).cast("timestamp").alias("plus5"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
        F.add_months("o_orderdate", 2).cast("timestamp").alias("plus2mo"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.round(
            F.months_between(
                "o_orderdate", F.lit("1995-01-01 00:00:00").cast("timestamp")
            ),
            4,
        ).alias("months_since"),
    )


@query(
    "q_ts_convert",
    oracle="""
    SELECT event_id,
           ts::DATE::TIMESTAMP AS d,
           (epoch_us(ts) // 1000000) AS secs,
           (epoch_us(ts) // 1000) AS millis,
           strftime(make_timestamp((epoch_us(ts) // 1000000) * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS rendered
    FROM events
    """,
    category="2.H",
)
def q_ts_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_date / unix epoch (s, ms — exact integer floor on both engines) /
    from_unixtime round-trip rendered as a naive UTC string."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.to_date("ts").cast("timestamp").alias("d"),
        F.unix_timestamp("ts").alias("secs"),
        F.unix_millis("ts").alias("millis"),
        F.from_unixtime(F.unix_timestamp("ts")).alias("rendered"),
    )


@query(
    "q_date_business_days",
    oracle="""
    WITH d AS (
      SELECT l_orderkey, l_linenumber,
             date_diff('day', DATE '1990-01-01', CAST(o.o_orderdate AS DATE))
               AS a,
             date_diff('day', DATE '1990-01-01', CAST(l.l_shipdate AS DATE))
               AS b
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_linenumber = 1
    )
    SELECT l_orderkey,
           CAST(b - a AS BIGINT) AS calendar_days,
           CAST((5 * (b // 7) + LEAST(b % 7, 5))
                - (5 * (a // 7) + LEAST(a % 7, 5)) AS BIGINT)
             AS business_days
    FROM d ORDER BY l_orderkey
    """,
    category="2.H",
)
def q_date_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day arithmetic — weekdays between order and first-line
    ship date, in CLOSED FORM: with x = days since a Monday origin
    (1990-01-01, before the whole date domain), W(x) = 5*(x div 7) + least(x mod 7, 5) counts the
    weekdays before x, so busdays(a,b) = W(b) - W(a) — O(1) integer
    math per row. The naive form (explode a per-row date `sequence` and
    filter weekends) multiplies the fact table by the interval length —
    a 30x row explosion this formula avoids entirely. Both dates are
    non-negative offsets from the origin, so div/mod agree across
    engines (no negative-modulo hazard)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    d = (
        li.where(F.col("l_linenumber") == 1)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1990-01-01").cast("date")
            ).alias("a"),
            F.datediff(
                F.to_date("l_shipdate"), F.lit("1990-01-01").cast("date")
            ).alias("b"),
        )
    )
    w = lambda c: 5 * F.expr(f"{c} div 7") + F.least(
        F.expr(f"{c} % 7"), F.lit(5)
    )
    return d.select(
        "l_orderkey",
        (F.col("b") - F.col("a")).cast("long").alias("calendar_days"),
        (w("b") - w("a")).cast("long").alias("business_days"),
    ).orderBy("l_orderkey")
