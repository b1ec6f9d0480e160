"""LLM-data-pipeline operators (SURVEY.md §2.J): dedup, similarity search,
text analysis, multimodal columns, time-series similarity."""

# Import order = registration order = driver certification order (see
# registry.load_all). Round-10 rotation: multimodal (7 rungs, none
# driver-certified through r9), dedup (21, none) and similarity (24,
# none) lead, so the driver's ~50-query sample prefix is all
# first-time IDs. curation (25 never) cannot lead: its module-level
# `from llm.text import SQL_QUALITY` (curation.py, decorator-time
# oracle interpolation) registers all 37 text rungs after curation's
# 15th, and text's head was already certified in r9. The fully
# certified timeseries family moves last.
from aws_lambda_stream_processing_spark.llm import (  # noqa: F401
    multimodal,
    dedup,
    similarity,
    curation,
    text,
    timeseries,
)
