"""-dbfile: durable tables (reference README.md:146-150).

The reference opens an on-disk SQLite database instead of :memory:,
which makes loaded tables persist across runs and lets them exceed
RAM. The Spark analog is a directory of parquet tables — the same two
properties (durability, larger-than-memory) via the storage layer
Spark already scales on. `CREATE TABLE IF NOT EXISTS` append
semantics carry over: loading into an existing table appends with
record numbers continuing after the current maximum
(lib/classes/table.tcl:69, tests.tcl:1398-1458).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nr_column(df: DataFrame) -> str:
    """The record-number column is the first one, `<prefix>nr`."""
    return df.columns[0]


def persist_and_register(
    spark: SparkSession, dbdir: str, loaded: dict[str, DataFrame]
) -> None:
    os.makedirs(dbdir, exist_ok=True)

    for name, df in loaded.items():
        path = os.path.join(dbdir, name)
        nr = _nr_column(df)
        if os.path.isdir(path):
            existing = spark.read.parquet(path)
            offset = existing.agg(
                F.max(F.col(_nr_column(existing))).alias("m")
            ).first()["m"] or 0
            shifted = df.withColumn(nr, F.col(nr) + F.lit(offset))
            shifted.write.mode("append").parquet(path)
        else:
            df.write.mode("overwrite").parquet(path)
        # re-read so queries in this run see the durable table
        spark.read.parquet(path).createOrReplaceTempView(name)

    # tables from previous runs become queryable too
    for entry in os.listdir(dbdir):
        path = os.path.join(dbdir, entry)
        if entry not in loaded and os.path.isdir(path):
            spark.read.parquet(path).createOrReplaceTempView(entry)
