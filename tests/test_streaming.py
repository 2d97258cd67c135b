"""Structured Streaming variants must agree with their batch twins."""

from __future__ import annotations

from sqawk_spark.streaming.windows import (
    events_sessionize,
    events_tumbling_window,
    stream_sessionize_stateful,
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


def test_stateful_sessionize_equals_batch(spark, sf_dir):
    """applyInPandasWithState sessions (state carried across two
    micro-batches) must equal the built-in session_window batch result.
    total_value is compared with a 1-cent tolerance: the stream
    accumulates per-session in ts order, the batch sum in partition
    order, and float addition is not associative."""
    batch = {
        (r["user_id"], r["session_start"]): r
        for r in events_sessionize(spark, sf_dir).collect()
    }
    streamed = {
        (r["user_id"], r["session_start"]): r
        for r in stream_sessionize_stateful(
            spark, sf_dir, "t_stateful_sessions"
        ).collect()
    }
    assert set(batch) == set(streamed)
    assert len(batch) > 0
    for k, b in batch.items():
        s = streamed[k]
        assert s["session_last"] == b["session_last"], k
        assert s["n_events"] == b["n_events"], k
        assert abs(s["total_value"] - b["total_value"]) <= 0.01, k
