"""Structured Streaming variants must agree with their batch twins."""

from __future__ import annotations

from sqawk_spark.streaming.windows import (
    events_tumbling_window,
    stream_tumbling_counts,
)


def test_stream_tumbling_equals_batch(spark, sf_dir):
    batch = {
        tuple(r) for r in events_tumbling_window(spark, sf_dir).collect()
    }
    streamed = {
        tuple(r)
        for r in stream_tumbling_counts(spark, sf_dir, "t_stream_tumbling").collect()
    }
    assert batch == streamed
    assert len(batch) > 0
