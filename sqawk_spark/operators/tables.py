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


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Read parquet tables and register each as a temp view.

    Registering views makes the same catalog available to both the
    DataFrame builders and ``spark.sql`` queries (CTEs, subqueries).
    """
    out: dict[str, DataFrame] = {}
    for name in names:
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
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
