"""LLM-data-pipeline operators (SURVEY.md §2.J): dedup, similarity search,
text analysis, multimodal columns, time-series similarity."""

# Import order = registration order = driver certification order (see
# registry.load_all). Round-9 rotation: timeseries (41 rungs, none
# driver-certified through r8) and text (36, none certified) lead, so
# the driver's ~50-query sample prefix is all first-time IDs; the
# iterative/GEMM-heavy dedup and similarity ladders stay last.
from aws_lambda_stream_processing_spark.llm import (  # noqa: F401
    timeseries,
    text,
    curation,
    multimodal,
    similarity,
    dedup,
)
