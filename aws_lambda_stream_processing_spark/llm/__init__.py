"""LLM-data-pipeline operators (SURVEY.md §2.J): dedup, similarity search,
text analysis, multimodal columns, time-series similarity."""

from aws_lambda_stream_processing_spark.llm import (  # noqa: F401
    curation,
    dedup,
    multimodal,
    similarity,
    text,
    timeseries,
)
