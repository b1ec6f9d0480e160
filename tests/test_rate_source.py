"""Gate for the unbounded-source demo (streaming/rate_demo.py): the events
envelope pipeline must run against a source that never ends, with the same
schema and transformation surface as the file-replay path."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.streaming.rate_demo import (
    EVENT_TYPES,
    drain_micro_batches,
    rate_events_stream,
)
from aws_lambda_stream_processing_spark.streaming.replay import EVENTS_DDL


def test_rate_source_envelope_schema_matches_file_replay(spark):
    stream = rate_events_stream(spark)
    # same column names as the file-replay envelope (ts differs: the rate
    # source emits a true TimestampType, files ship raw nanos pre-convert)
    expected = [f.split()[0] for f in EVENTS_DDL.split(", ")]
    assert [f.name for f in stream.schema.fields] == expected
    assert stream.isStreaming


def test_rate_source_drains_bounded_micro_batches(spark):
    stream = rate_events_stream(spark, rows_per_second=5000)
    agg = stream.groupBy("event_type").count()
    seen = drain_micro_batches(agg, n_batches=2, timeout_s=60.0)
    assert len(seen) >= 2, f"expected 2 non-empty micro-batches, got {seen}"
    # batch ids strictly increase (offset tracking works on the rate source)
    ids = [b for b, _ in seen]
    assert ids == sorted(ids)


def test_rate_source_rows_are_valid_envelope(spark):
    stream = rate_events_stream(spark, rows_per_second=5000)
    collected = []
    drain_micro_batches(
        stream,
        n_batches=1,
        timeout_s=60.0,
        on_batch=lambda df, _bid: collected.extend(df.collect()),
    )
    assert collected
    for row in collected[:100]:
        assert row.event_type in EVENT_TYPES
        assert 0.0 <= row.value < 400.0
        assert 0 <= row.user_id < 150
        assert row.props == '{"k": %d}' % (row.event_id % 100)
