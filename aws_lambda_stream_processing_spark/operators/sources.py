"""Sources & sinks (SURVEY.md §2.A).

The reference's source is a Kinesis shard of base64 JSON records consumed by
a Lambda event-source mapping; its sinks are DynamoDB/S3 (reconstructed —
/root/reference/README.md:3-4 names the architecture). The Spark-first
equivalents: columnar parquet scans with pushdown for at-rest data, JSON
payload parsing via from_json for the record envelope, parquet writes for
sinks, and Structured Streaming file replay for the shard itself.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.streaming.replay import (
    events_stream,
    run_foreach_batch,
    run_to_memory,
)
from aws_lambda_stream_processing_spark.tables import load_table


@query(
    "q_scan_parquet",
    oracle="SELECT * FROM lineitem",
    category="2.A",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full vectorized parquet scan, all columns. At 100 TB this is a
    many-split columnar read; `maxPartitionBytes` sizes the splits."""
    return load_table(spark, sf_dir, "lineitem")


@query(
    "q_scan_pruned",
    oracle="""
    SELECT l_orderkey, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
    category="2.A",
)
def q_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column pruning + predicate pushdown: the scan reads 3 of 11 columns
    and skips row groups whose shipdate max < the cutoff (verified via
    .explain → ReadSchema/PushedFilters; see tests/test_plans.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_shipdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("l_orderkey", "l_quantity", "l_shipdate")


@query(
    "q_source_json_props",
    oracle="""
    SELECT event_id,
           json_extract(props, '$.k')::INT AS k
    FROM events
    """,
    category="2.A",
)
def q_source_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON payload parse — the Kinesis-record analogue
    (`events.props` is the record body). from_json is JVM-side, codegen'd;
    never a Python UDF."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id", F.from_json("props", "k INT").getField("k").alias("k")
    )


@query("q_sink_parquet", oracle=None, category="2.A", tags=("weak",))
def q_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink round-trip (the S3-landing pattern): write a projection,
    read it back, aggregate. Weak check (side-effecting). At scale the write
    is `partitionBy(date)` for pruning on downstream reads."""
    out = tempfile.mkdtemp(prefix="alsp_sink_") + "/out"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )
    li.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    result = back.agg(
        F.count("*").alias("cnt"),
        F.countDistinct("l_orderkey").alias("uniq_orders"),
    )
    rows = result.collect()
    shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


@query(
    "q_stream_source_replay",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
    category="2.A",
)
def q_stream_source_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events table through a real Structured Streaming source
    (availableNow trigger + checkpoint + memory sink) and return exactly the
    rows that flowed through — proving the stream path loses/duplicates
    nothing vs the batch oracle."""
    stream = events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    return run_to_memory(stream, output_mode="append")


@query("q_stream_sink_foreachbatch", oracle=None, category="2.A", tags=("weak",))
def q_stream_sink_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lambda-handler equivalent: foreachBatch(fn) receives
    (batch_df, batch_id) — fn's body is where handler code lands. Here the
    handler writes each micro-batch to a parquet sink keyed by batch_id
    (idempotent re-runs overwrite the same path = exactly-once)."""
    sink_dir = tempfile.mkdtemp(prefix="alsp_fb_sink_")

    def handler(batch_df: DataFrame, batch_id: int) -> None:
        # overwrite keyed by batch_id → idempotent under at-least-once replay
        (
            batch_df.groupBy("event_type")
            .count()
            .write.mode("overwrite")
            .parquet(f"{sink_dir}/batch={batch_id}")
        )

    run_foreach_batch(events_stream(spark, sf_dir), handler)
    # partitioned-dataset read: `batch` becomes the partition column
    back = spark.read.parquet(sink_dir)
    result = back.groupBy("event_type").agg(F.sum("count").alias("cnt"))
    rows = result.collect()
    shutil.rmtree(sink_dir, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)
