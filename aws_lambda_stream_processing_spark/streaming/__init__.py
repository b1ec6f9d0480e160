"""Structured Streaming surface (SURVEY.md §2.I): replay harness + the
streaming operator queries."""

from aws_lambda_stream_processing_spark.streaming import (  # noqa: F401
    queries,
    replay,
)
