"""Event-time windows: tumbling / sliding / session (+ watermarks).

The window expressions run identically in batch and streaming — the
oracle-checked registry entries execute them in batch over the
``events`` parquet; ``stream_tumbling_counts`` runs the same logic as
a real Structured Streaming job (file source → watermark → windowed
agg) and is asserted equal to the batch result in tests.

Window bounds are returned as epoch microseconds (exact integers) so
the DuckDB comparison never touches timestamp formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqawk_spark.operators.registry import query
from sqawk_spark.operators.tables import load_tables


@query(
    "events_tumbling_window",
    oracle="""
        SELECT epoch_us(time_bucket(INTERVAL '10 minutes', ts)) AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute windows per event type. In streaming this is
    the same expression after ``withWatermark`` (see
    stream_tumbling_counts); the shuffle key is (window, type)."""
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "events_sliding_window",
    oracle="""
        WITH expanded AS (
            SELECT time_bucket(INTERVAL '5 minutes', ts)
                       - (k * INTERVAL '5 minutes') AS ws,
                   value
            FROM events, UNNEST([0, 1]) AS u(k)
        )
        SELECT epoch_us(ws) AS window_start,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value
        FROM expanded
        GROUP BY 1
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 10-minute length, 5-minute hop — each event
    lands in exactly two windows (the oracle expands them explicitly;
    Spark's window() does the same expansion internally)."""
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "events_sessionize",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        numbered AS (
            SELECT *, sum(new_sess) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS sess_seq
            FROM flagged
        )
        SELECT user_id,
               epoch_us(min(ts)) AS session_start,
               epoch_us(max(ts)) AS session_last,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value
        FROM numbered
        GROUP BY user_id, sess_seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap, per user.

    Spark's session_window merges events whose windows overlap —
    a gap of exactly 30 minutes starts a NEW session (event windows
    are half-open [ts, ts+gap)), hence `>=` in the oracle's
    gaps-and-islands formulation. session_window.end is last_ts+gap,
    so session_last is recomputed as max(ts) to stay gap-free."""
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("first_ts")).alias("session_start"),
            F.unix_micros(F.col("last_ts")).alias("session_last"),
            "n_events",
            "total_value",
        )
    )


@query(
    "events_hourly_by_type",
    oracle="""
        SELECT epoch_us(date_trunc('hour', ts)) AS hour_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) / count(*) AS avg_value,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY 1, 2
    """,
)
def events_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup with per-window distinct users (the streaming
    pain point — exact distinct needs state; approx_count_distinct is
    the streaming-safe variant)."""
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_micros(F.col("h")).alias("hour_start"),
            "event_type",
            "n_events",
            "avg_value",
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# Structured Streaming variants (same logic, real stream execution)
# ---------------------------------------------------------------------------


def stream_tumbling_counts(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_tumbling"
) -> DataFrame:
    """Run the tumbling-window aggregation as a real Structured
    Streaming job: file source → withWatermark → windowed agg →
    memory sink, processing everything available then stopping.

    Late data beyond the 1-hour watermark would be dropped in
    continuous operation; with availableNow over static files nothing
    is late, so the result must equal the batch expression (asserted
    in tests/test_streaming.py).
    """
    import os
    import tempfile

    # same nanos→micros normalization as the batch loader
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.join(sf_dir, "events.parquet")
    batch = spark.read.parquet(src)
    # the streaming file source wants a directory; expose the single
    # parquet file through a symlink dir (testdata is read-only)
    stream_dir = tempfile.mkdtemp(prefix="sqawk_stream_")
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(stream_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def stream_sessionize_stateful(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_sessions"
) -> DataFrame:
    """Custom stateful sessionization with ``applyInPandasWithState``.

    The built-in ``session_window`` covers gap sessions (see
    events_sessionize); this is the escape hatch for session logic the
    built-in can't express (per-session running aggregates, custom
    close conditions). The events table is split into two time-ordered
    files and read with ``maxFilesPerTrigger=1``, so sessions spanning
    the split are carried across micro-batches in the GroupState —
    a real distributed state handoff, not a single-batch simulation.

    Emission is update-mode: each batch emits the latest version of
    every session it touched; the newest version per
    (user_id, session_start) — max n_events — is the final answer and
    must equal the batch events_sessionize result (asserted in
    tests/test_streaming.py).

    Timestamps stay epoch-micro longs end to end: the state schema and
    gap arithmetic are integer-exact, immune to timezone or nanos
    quirks.
    """
    import os
    import shutil
    import tempfile

    import pandas as pd  # noqa: F401 — executors need it for the UDF

    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = 30 * 60 * 1_000_000

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select(
            "user_id",
            F.expr("ts div 1000").cast("long").alias("ts_us"),
            "value",
        )
    )
    split_ts = events.selectExpr(
        "percentile_approx(ts_us, 0.5, 100) AS m"
    ).first()["m"]

    stream_dir = tempfile.mkdtemp(prefix="sqawk_stateful_")
    # two time-ordered chunks => the second micro-batch extends
    # sessions opened by the first
    events.filter(F.col("ts_us") <= split_ts).coalesce(1).write.parquet(
        os.path.join(stream_dir, "in"), mode="overwrite"
    )
    events.filter(F.col("ts_us") > split_ts).coalesce(1).write.parquet(
        os.path.join(stream_dir, "in"), mode="append"
    )
    in_dir = os.path.join(stream_dir, "in")
    for extra in os.listdir(in_dir):  # _SUCCESS etc. confuse the source
        if not extra.endswith(".parquet"):
            os.remove(os.path.join(in_dir, extra))

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("session_start", T.LongType()),
            T.StructField("session_last", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("session_start", T.LongType()),
            T.StructField("session_last", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )

    def sessionize(key, pdf_iter, state: GroupState):
        # closure (pickled by value) — executors don't import this repo
        rows = []
        for pdf in pdf_iter:
            rows.extend(
                zip(pdf["ts_us"].tolist(), pdf["value"].tolist())
            )
        rows.sort()
        if state.exists:
            start, last, n, tot = state.get
        else:
            start = last = None
            n, tot = 0, 0.0
        out = []
        for ts_us, value in rows:
            if start is not None and ts_us - last >= gap_us:
                out.append((key[0], start, last, n, tot))
                start = last = None
                n, tot = 0, 0.0
            if start is None:
                start = ts_us
            last = ts_us
            n += 1
            tot += value
        if start is not None:
            # update-mode emission of the still-open session; a later
            # batch may extend it, superseding this row
            out.append((key[0], start, last, n, tot))
            state.update((start, last, n, tot))
        import pandas as pd

        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "session_start",
                "session_last",
                "n_events",
                "total_value",
            ],
        )

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(stream_dir, ignore_errors=True)

    # newest version per session wins (n_events grows monotonically)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id", "session_start").orderBy(
        F.col("n_events").desc()
    )
    return (
        spark.table(query_name)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumn("total_value", F.round("total_value", 2))
    )
