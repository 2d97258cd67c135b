"""Shared Spark-vs-DuckDB comparison used by the parity tests.

Mirrors what the driver's correctness gate does: run the Spark builder
and the DuckDB oracle over the same parquet tables, then compare row
count, schema (column names), and an order-insensitive multiset of
row values (columns sorted by name).
"""

from __future__ import annotations

import math
import os
from collections import Counter

import duckdb

from sqawk_spark.operators.tables import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm(v):
    """Normalize a cell for hashing: floats to a fixed repr, rest as-is."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 12 significant digits: enough to catch real bugs, immune to
        # sub-ulp accumulation noise that rounding already removed.
        return f"{v:.12g}"
    return v


def row_multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def assert_atomic_schema(sdf) -> None:
    """Driver canonicalizer contract: every output column must be an
    atomic type. The driver pandas-sorts cell values before hashing and
    crashes on list/dict cells (``TypeError: unhashable type: 'list'``,
    CORRECTNESS_r06 ``embedding_pca_project``) — Array/Map/Struct
    columns are banned from every registered query's output."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"non-atomic output columns (driver cannot hash): {bad}"


def compare(spark, sf_dir: str, builder, oracle: str) -> None:
    sdf = builder(spark, sf_dir)
    assert_atomic_schema(sdf)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_conn(sf_dir)
    res = con.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    sm, dm = row_multiset(spark_cols, spark_rows), row_multiset(duck_cols, duck_rows)
    if sm != dm:
        only_spark = list((sm - dm).items())[:5]
        only_duck = list((dm - sm).items())[:5]
        raise AssertionError(
            f"value mismatch\n only in spark: {only_spark}\n only in duck: {only_duck}"
        )
