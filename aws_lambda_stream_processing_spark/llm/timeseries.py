"""Time-series similarity (SURVEY.md §2.J q_ts_zscore_similarity, grounded
in the EDBT'19 distributed-in-memory time-series-similarity line of work —
PAPERS.md).

Shape: per-entity series → z-normalize (window mean/std over the entity
partition) → align by per-entity sequence index → pairwise L2 distance on
the aligned prefix. At 100 TB the all-pairs step is the bottleneck; the
scale path is the same one similarity search uses (llm/similarity.py):
bucket entities by a cheap sketch (e.g. PAA/SAX prefix) and run this exact
kernel within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table


@query(
    "q_ts_zscore_similarity",
    oracle="""
    WITH z AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS idx,
             (value - AVG(value) OVER (PARTITION BY user_id))
               / stddev_samp(value) OVER (PARTITION BY user_id) AS z
      FROM events
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           COUNT(*) AS n_aligned,
           ROUND(SQRT(SUM((a.z - b.z) * (a.z - b.z)) / COUNT(*)), 4)
             AS zdist
    FROM z a JOIN z b ON a.idx = b.idx AND a.user_id < b.user_id
    GROUP BY 1, 2
    """,
    category="2.J",
)
def q_ts_zscore_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise user similarity over z-normalized event-value series:
    normalize within each user (window mean/stddev), align series by
    sequence index, RMS distance over the common prefix. 15 users → 105
    pairs; the join key (idx) distributes the alignment so no single
    partition holds more than one index slice."""
    e = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id")
    wo = wu.orderBy("ts", "event_id")
    z = e.select(
        "user_id",
        F.row_number().over(wo).alias("idx"),
        (
            (F.col("value") - F.avg("value").over(wu))
            / F.stddev_samp("value").over(wu)
        ).alias("z"),
    )
    a = z.select(
        F.col("user_id").alias("user_a"), "idx", F.col("z").alias("za")
    )
    b = z.select(
        F.col("user_id").alias("user_b"), "idx", F.col("z").alias("zb")
    )
    return (
        a.join(b, ["idx"])
        .where(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(
            F.count("*").alias("n_aligned"),
            F.round(
                F.sqrt(
                    F.sum(
                        (F.col("za") - F.col("zb"))
                        * (F.col("za") - F.col("zb"))
                    )
                    / F.count("*")
                ),
                4,
            ).alias("zdist"),
        )
    )
