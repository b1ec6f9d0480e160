"""LLM-data-pipeline operators (SURVEY.md §2.J): dedup, similarity search,
text analysis, multimodal columns, time-series similarity."""

# Import order = registration order = driver certification order: cheap
# text/curation families first, the iterative/GEMM-heavy dedup and
# similarity ladders last (see registry.load_all).
from aws_lambda_stream_processing_spark.llm import (  # noqa: F401
    text,
    curation,
    timeseries,
    multimodal,
    similarity,
    dedup,
)
