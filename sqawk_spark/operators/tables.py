"""Test-table catalog: load the driver's parquet star schema.

Small dimensions (region, nation, supplier, part, customer at low SF)
stay broadcast-able; Catalyst's size estimation handles that via the
parquet footer statistics, so no manual hints are needed here — the
operator builders add ``F.broadcast`` only where a dimension is
guaranteed tiny at any scale factor (region/nation: fixed cardinality).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# --- r11: unsplittable-input spread (optimization guide §2.5) --------
#
# Parquet scans cannot parallelize below a row group, and the test
# tables are written as ONE row group per file — so the scan stage of
# every query, and all map work fused into it (tokenization, explode,
# hashing, decode), runs on a single core no matter how many the
# session has. The guide's sanctioned fix for unsplittable input is a
# repartition immediately after the read. It is gated so it only
# fires when BOTH hold:
#   * the file's natural split count (row groups) is below the
#     session's default parallelism — i.e. the scan is actually
#     starved, which on any real 100 TB layout (thousands of row
#     groups) is never true, making this a no-op at scale; and
#   * the table is small enough (SQAWK_SPARK_SPREAD_MAX_BYTES,
#     default 1 GiB) that the extra round-robin exchange is trivially
#     cheap relative to the serial map work it unlocks.
# Call sites opt in per table (`spread=` below) where the downstream
# map work is known to dominate; SQAWK_SPARK_SPREAD=off disables the
# whole mechanism.
_SPLITS_CACHE: dict[str, tuple[int, int]] = {}


def _natural_splits(path: str) -> tuple[int, int]:
    """(row_groups, total_bytes) for a parquet file or directory."""
    got = _SPLITS_CACHE.get(path)
    if got is not None:
        return got
    import glob as _glob

    files = (
        sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    groups = 0
    size = 0
    try:
        import pyarrow.parquet as pq

        for f in files:
            groups += pq.ParquetFile(f).metadata.num_row_groups
            size += os.path.getsize(f)
    except Exception:
        groups, size = 1 << 30, 1 << 60  # unknown: never spread
    _SPLITS_CACHE[path] = (groups, size)
    return groups, size


def table_rows(sf_dir: str, name: str) -> int | None:
    """Exact row count of a raw table from the parquet footer
    (driver-side metadata, re-read per call — identical to
    ``count()`` over the untransformed table but without launching a
    job). None when the metadata is unavailable; callers fall back to
    the aggregation."""
    import glob as _glob

    path = os.path.join(sf_dir, f"{name}.parquet")
    files = (
        sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    try:
        import pyarrow.parquet as pq

        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return None


def _maybe_spread(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    if os.environ.get("SQAWK_SPARK_SPREAD", "auto") == "off":
        return df
    target = spark.sparkContext.defaultParallelism
    max_bytes = int(
        os.environ.get("SQAWK_SPARK_SPREAD_MAX_BYTES", str(1 << 30))
    )
    groups, size = _natural_splits(path)
    if groups >= target or size > max_bytes:
        return df
    return df.repartition(target)


# r11: per-(session, sf_dir, table, spread) DataFrame handles. This
# caches CATALOG METADATA ONLY — the logical plan with its resolved
# schema and file listing. No rows are stored: every action over a
# cached handle re-plans and re-scans the parquet input exactly as a
# fresh read would. Rebuilding the handle per builder call cost
# ~100 ms of driver-side listing + footer reads PER TABLE PER QUERY
# (measured; a resident engine registers its catalog once, which is
# what this is).
# r12 (ADVICE r11 #3): the key carries the applicationId in addition
# to id(spark) — CPython can reuse an id after a stopped session is
# garbage-collected, which would hand back handles bound to a dead
# SparkContext.
_DF_CACHE: dict[tuple[int, str, str, str, bool], DataFrame] = {}


def _session_key(spark: SparkSession) -> tuple[int, str]:
    try:
        app = spark.sparkContext.applicationId
    except Exception:  # stopped context — never match a cached entry
        app = "<stopped>"
    return (id(spark), app)


def load_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TABLES,
    spread: tuple[str, ...] = (),
) -> dict[str, DataFrame]:
    """Read parquet tables and register each as a temp view.

    Registering views makes the same catalog available to both the
    DataFrame builders and ``spark.sql`` queries (CTEs, subqueries).
    Tables named in ``spread`` get the unsplittable-input repartition
    (see `_maybe_spread` above) when the gate allows it.
    """
    out: dict[str, DataFrame] = {}
    sid, app = _session_key(spark)
    for name in names:
        do_spread = (
            name in spread
            or os.environ.get("SQAWK_SPARK_SPREAD") == "all"
        )
        key = (sid, app, sf_dir, name, do_spread)
        cached = _DF_CACHE.get(key)
        if cached is not None:
            cached.createOrReplaceTempView(name)
            out[name] = cached
            continue
        path = os.path.join(sf_dir, f"{name}.parquet")
        if name == "events":
            # Normalize events.ts to TIMESTAMP (LTZ; session tz is
            # pinned to UTC) regardless of how the data generation
            # wrote it. TIMESTAMP(NANOS) parquet, which Spark refuses
            # by default, is read as raw nanos and truncated to micros
            # — exactly what DuckDB's reader does; TIMESTAMP(MICROS)
            # arrives as TIMESTAMP_NTZ and is reinterpreted in UTC.
            # Either way both engines see identical timestamps.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            if isinstance(df.schema["ts"].dataType, T.LongType):
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        else:
            df = spark.read.parquet(path)
        if do_spread:
            # "all" is a measurement override (A/B the gate globally);
            # production call sites opt in per table instead.
            df = _maybe_spread(spark, df, path)
        df.createOrReplaceTempView(name)
        _DF_CACHE[key] = df
        out[name] = df
    return out
