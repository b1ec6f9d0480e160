"""Physical-plan inspection (SURVEY.md §4): assertable plan properties."""

from aws_lambda_stream_processing_spark.plans.actions import (  # noqa: F401
    jobs_run,
)
from aws_lambda_stream_processing_spark.plans.inspect import (  # noqa: F401
    global_windows,
    has_operator,
    operator_counts,
    plan_string,
    pushed_filters,
    read_schemas,
    scan_columns,
)
