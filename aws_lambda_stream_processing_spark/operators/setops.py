"""Set operations (SURVEY.md §2.G) — multi-source stream merges relationally.

Spark semantics used (matching ANSI/DuckDB):
  UNION ALL     → unionByName          (bag)
  UNION         → union + distinct     (set)
  INTERSECT     → intersect            (set)
  EXCEPT        → subtract             (set)
  INTERSECT ALL → intersectAll         (bag)
  EXCEPT ALL    → exceptAll            (bag)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table


def _slice(spark: SparkSession, sf_dir: str, etype: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.where(F.col("event_type") == etype).select("user_id", "event_type")


@query(
    "q_set_union_all",
    oracle="""
    SELECT event_id, event_type FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, event_type FROM events WHERE event_type = 'view'
    """,
    category="2.G",
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — zero-shuffle concatenation of sources (how multi-shard /
    multi-topic streams merge)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select("event_id", "event_type")
    views = e.where(F.col("event_type") == "view").select("event_id", "event_type")
    return clicks.unionByName(views)


@query(
    "q_set_union",
    oracle="""
    SELECT user_id, event_type FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id, event_type FROM events WHERE event_type = 'purchase'
    """,
    category="2.G",
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (dedup): union + hash-distinct."""
    a = _slice(spark, sf_dir, "click")
    b = _slice(spark, sf_dir, "purchase")
    return a.unionByName(b).distinct()


@query(
    "q_set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    category="2.G",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set) — planner lowers to a left-semi join over distincts."""
    e = load_table(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "purchase").select("user_id")
    b = e.where(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@query(
    "q_set_except",
    oracle="""
    SELECT user_id, event_type FROM events WHERE value > 100
    EXCEPT
    SELECT user_id, event_type FROM events WHERE event_type = 'error'
    """,
    category="2.G",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set) — lowers to left-anti join over distincts."""
    e = load_table(spark, sf_dir, "events")
    a = e.where(F.col("value") > 100).select("user_id", "event_type")
    b = e.where(F.col("event_type") == "error").select("user_id", "event_type")
    return a.subtract(b)


@query(
    "q_set_intersect_all",
    oracle="""
    SELECT user_id, event_type FROM events WHERE value > 50
    INTERSECT ALL
    SELECT user_id, event_type FROM events WHERE value < 150
    """,
    category="2.G",
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag, multiplicity = min of the two sides)."""
    e = load_table(spark, sf_dir, "events")
    a = e.where(F.col("value") > 50).select("user_id", "event_type")
    b = e.where(F.col("value") < 150).select("user_id", "event_type")
    return a.intersectAll(b)


@query(
    "q_set_except_all",
    oracle="""
    SELECT user_id, event_type FROM events WHERE value > 50
    EXCEPT ALL
    SELECT user_id, event_type FROM events WHERE event_type IN ('error', 'signup')
    """,
    category="2.G",
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag, multiplicity subtraction)."""
    e = load_table(spark, sf_dir, "events")
    a = e.where(F.col("value") > 50).select("user_id", "event_type")
    b = e.where(F.col("event_type").isin("error", "signup")).select(
        "user_id", "event_type"
    )
    return a.exceptAll(b)


@query(
    "q_set_union_by_name",
    oracle="""
    WITH merged AS (
      SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS cents,
             NULL AS event_type
      FROM events WHERE event_type = 'click'
      UNION ALL BY NAME
      SELECT event_id, event_type, user_id,
             CAST(NULL AS BIGINT) AS cents
      FROM events WHERE event_type = 'error'
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(cents) AS BIGINT) AS n_with_cents,
           CAST(COUNT(event_type) AS BIGINT) AS n_with_type,
           CAST(SUM(COALESCE(cents, 0)) AS BIGINT) AS cents,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM merged
    """,
    category="2.G",
)
def q_set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligning bag union — `unionByName(allowMissingColumns)`,
    the multi-source merge where shards disagree on column ORDER and
    PRESENCE (the schema-drift reality of long-lived event streams:
    old shards lack new columns). Columns align by NAME, not position
    — a positional UNION here would silently pair user_id with
    event_type — and each side's missing columns fill with NULL.
    DuckDB's `UNION ALL BY NAME` is the same operator, so the oracle
    is structural. Null-count aggregates pin the fill semantics.
    Scale: zero-shuffle concatenation plus one hash agg, same budget
    as q_set_union_all."""
    e = load_table(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    b = e.where(F.col("event_type") == "error").select(
        "event_id", "event_type", "user_id"
    )
    merged = a.unionByName(b, allowMissingColumns=True)
    return merged.agg(
        F.count("*").alias("n"),
        F.count("cents").alias("n_with_cents"),
        F.count("event_type").alias("n_with_type"),
        F.sum(F.coalesce("cents", F.lit(0))).alias("cents"),
        F.countDistinct("user_id").alias("n_users"),
    )
