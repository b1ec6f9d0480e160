"""The primary gate (SURVEY.md §5.1-5.2): every registered query at sf0.001
must match its DuckDB oracle under the same comparison the driver uses."""

from __future__ import annotations

import pytest

from aws_lambda_stream_processing_spark.registry import load_all

from tests.conftest import assert_parity

ALL = sorted(load_all())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, registry, name):
    assert_parity(spark, duck, registry[name])
