"""PySpark-native analytics engine with the query/data-processing surface of
airpair/aws-lambda-stream-processing (a Lambda+Kinesis stream processor —
reference identity: /root/reference/README.md:3-4), rebuilt Spark-first.

The reference snapshot ships no implementation code (only the AirPair
contribution README), so the engine surface is defined by SURVEY.md §2:
a relational core (scan/filter/join/agg/window/setops), scalar function
families, a Structured-Streaming replacement for the Lambda handler path,
and LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) — every operator designed for 100 TB scale and
verified against a DuckDB oracle at small scale factors.
"""

from aws_lambda_stream_processing_spark.registry import REGISTRY, query
from aws_lambda_stream_processing_spark.session import get_spark
from aws_lambda_stream_processing_spark.tables import TABLES, load_table

__all__ = ["REGISTRY", "query", "get_spark", "TABLES", "load_table"]
