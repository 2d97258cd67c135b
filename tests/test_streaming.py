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


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode tumbling aggregation with a 1-hour watermark: an
    event arriving after the watermark has passed its window must NOT
    resurrect that window. This pins the state-bounding behavior
    SCALE.md relies on: state size is O(active windows), late
    stragglers are dropped, not buffered forever.

    Watermark mechanics (verified empirically): batch N's late filter
    uses the watermark committed after batch N-1 — one batch of lag —
    so the late row arrives in batch 3, after a buffer batch has
    activated the 10:55 watermark derived from batch 1's max (11:55).
    """
    import os
    import time

    import pandas as pd
    from pyspark.sql import functions as F

    base = "2024-01-01 "

    def mk(*ts):
        return pd.DataFrame(
            {"ts": pd.to_datetime([base + t for t in ts])}
        ).astype({"ts": "datetime64[us]"})

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # the file source orders batches by modification time — pin it
    mk("10:00:00", "10:05:00", "11:55:00").to_parquet(str(in_dir / "b1.parquet"))
    mk("11:56:00").to_parquet(str(in_dir / "b2.parquet"))
    # 09:00 is far beyond the active 10:55 watermark => dropped
    mk("09:00:00").to_parquet(str(in_dir / "b3.parquet"))
    now = time.time()
    for i, name in enumerate(("b1", "b2", "b3")):
        os.utime(str(in_dir / f"{name}.parquet"), (now - 300 + i * 60,) * 2)

    schema = "ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(in_dir))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("string").alias("ws"), "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_late_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {r["ws"]: r["n"] for r in spark.table("t_late_drop").collect()}
    # on-time windows finalized below the final watermark (10:55) emit;
    # the 09:00 late window must not appear
    assert rows.get("2024-01-01 10:00:00") == 2
    assert "2024-01-01 09:00:00" not in rows


def test_late_drop_batch_twin_equals_streaming(spark, sf_dir):
    """events_late_drop (the oracle-checked batch construction) must
    reproduce a REAL streaming run of the same arrival schedule:
    per-chunk micro-batches, 1-hour watermark, update-mode emission.
    This pins the whole claim — the batch twin IS what Structured
    Streaming computes, including the one-batch watermark lag."""
    from sqawk_spark.streaming.windows import (
        events_late_drop,
        stream_late_drop,
    )

    batch = {
        (r.window_start, r.n_events, r.total_value)
        for r in events_late_drop(spark, sf_dir).collect()
    }
    streamed = {
        (r.window_start, r.n_events, r.total_value)
        for r in stream_late_drop(spark, sf_dir).collect()
    }
    assert batch == streamed


def test_stream_dedup_equals_batch(spark, sf_dir):
    """Streaming exact dedup (complete-mode grouped agg) must produce
    the identical fingerprint → (canonical, copies) map as the batch
    dedup_exact query — min() canon is arrival-order-free."""
    import sqawk_spark.operators as operators
    from sqawk_spark.operators.registry import REGISTRY
    from sqawk_spark.streaming.windows import stream_dedup_exact

    operators.load_all()

    batch = {
        r["fingerprint"]: (r["canonical_doc_id"], r["n_copies"])
        for r in REGISTRY["dedup_exact"].builder(spark, sf_dir).collect()
    }
    streamed = {
        r["fingerprint"]: (r["canonical_doc_id"], r["n_copies"])
        for r in stream_dedup_exact(spark, sf_dir, "t_stream_dedup").collect()
    }
    assert batch == streamed


def test_stream_heavy_hitters_equals_batch(spark, sf_dir):
    """The two-stage continuous top-k (streaming windowed counts →
    batch rank over the compacted aggregate) must equal ranking the
    batch tumbling counts directly — deterministic because ties break
    by event_type."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    import sqawk_spark.operators as operators
    from sqawk_spark.operators.registry import REGISTRY
    from sqawk_spark.streaming.windows import stream_heavy_hitters

    operators.load_all()

    w = W.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), "event_type"
    )
    batch = {
        (r.window_start, r.event_type, r.n_events, r["rank"])
        for r in REGISTRY["events_tumbling_window"]
        .builder(spark, sf_dir)
        .select(
            "window_start", "event_type", "n_events",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 3)
        .collect()
    }
    streamed = {
        (r.window_start, r.event_type, r.n_events, r["rank"])
        for r in stream_heavy_hitters(spark, sf_dir, "t_stream_hh").collect()
    }
    assert batch == streamed


def test_stream_session_window_equals_batch(spark, sf_dir):
    """Watermarked streaming session_window (append mode, sessions
    merged across micro-batches and flushed by sentinel-advanced
    watermark) must equal the batch session_window result exactly —
    same aggregation operator, so even total_value matches bit-wise
    per session (both sum within one session's rows)."""
    from sqawk_spark.streaming.windows import (
        events_sessionize,
        stream_session_window,
    )

    batch = {
        (r["user_id"], r["session_start"]): r
        for r in events_sessionize(spark, sf_dir).collect()
    }
    streamed = {
        (r["user_id"], r["session_start"]): r
        for r in stream_session_window(
            spark, sf_dir, "t_stream_sesswin"
        ).collect()
    }
    assert set(batch) == set(streamed)
    assert len(batch) > 0
    for k, b in batch.items():
        s = streamed[k]
        assert s["session_last"] == b["session_last"], k
        assert s["n_events"] == b["n_events"], k
        assert abs(s["total_value"] - b["total_value"]) <= 0.01, k


def test_tws_sessionize_equals_batch(spark, sf_dir):
    """Spark 4 StatefulProcessor (transformWithStateInPandas) sessions
    must equal the batch session_window result — skipped where
    google.protobuf (its control-protocol dependency) is absent."""
    import pytest

    from sqawk_spark.streaming.windows import (
        _has_protobuf,
        stream_sessionize_tws,
    )

    if not _has_protobuf():
        pytest.skip("google.protobuf not available in this environment")
    batch = {
        (r["user_id"], r["session_start"]): r
        for r in events_sessionize(spark, sf_dir).collect()
    }
    streamed = {
        (r["user_id"], r["session_start"]): r
        for r in stream_sessionize_tws(spark, sf_dir, "t_tws").collect()
    }
    assert set(batch) == set(streamed)
    for k, b in batch.items():
        s = streamed[k]
        assert s["n_events"] == b["n_events"], k
        assert abs(s["total_value"] - b["total_value"]) <= 0.01, k
