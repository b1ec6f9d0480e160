"""Scalar function families (SURVEY.md §2.H)."""

from aws_lambda_stream_processing_spark.functions import (  # noqa: F401
    arrays,
    dates,
    jsonf,
    maths,
    strings,
)
