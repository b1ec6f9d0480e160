"""Relational operator surface (SURVEY.md §2.A–2.G)."""

from aws_lambda_stream_processing_spark.operators import (  # noqa: F401
    aggregates,
    behavior,
    graphs,
    joins,
    profiling,
    relational,
    scale,
    setops,
    sketches,
    sorts,
    sources,
    sqlfront,
    windows,
)
