"""UDF / UDAF / UDTF extension surface (SURVEY.md §2.K)."""

from aws_lambda_stream_processing_spark.udf import surface  # noqa: F401
