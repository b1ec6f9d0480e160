"""JSON / map function families (SURVEY.md §2.H: q_map_funcs, q_json_funcs).

The Kinesis record body is JSON (`events.props`); this is the schema-on-read
surface the reference architecture lives on. All parsing is JVM-side
(from_json / get_json_object — codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS keys_joined,
           json_extract(props, '$.k')::INT AS k_val,
           len(json_keys(props))::INT AS n_keys
    FROM events
    """,
    category="2.H",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json → MapType, then map_keys / element_at / size — the dynamic-
    keys view of the JSON payload (vs the fixed-schema view in
    q_source_json_props)."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_joined"),
        F.element_at(m, "k").alias("k_val"),
        F.size(m).alias("n_keys"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           json_extract(props, '$.k')::INT AS k_int,
           json_extract_string(props, '$.missing') AS absent
    FROM events
    """,
    category="2.H",
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object (string out), typed extraction via from_json, and a
    missing-path probe (NULL on both engines)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k INT").getField("k").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("absent"),
    )
