"""Columnar input — parquet and ORC (engine-native extension
beyond the reference).

The reference's parsers all start from text; a Spark engine should
also query columnar files directly. ``format=parquet`` /
``format=orc`` load the file with its REAL column names and types — no stringify/affinity round
trip — and synthesizes the sqawk table conventions on top:

- ``<p>nr``  — 1-based record number (insertion order);
- ``<p>nf``  — field count (constant: the column count);
- ``<p>0``   — NULL (there is no raw-text form of a columnar row);
- ``<p>1..<p>N`` — positional aliases of the real columns, so sqawk
  idioms (``select a1, a2 from a``) keep working alongside
  ``select l_orderkey from a``. A positional alias is skipped if a
  real column already claims that name.

``columns=`` renames positionally like any other format. NF/MNF don't
apply (the schema is fixed by the file) and are ignored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse(spark: SparkSession, spec, path: str) -> DataFrame:
    # shaping happens in shape_typed_table (sources/base.py finalize):
    # the typed frame must survive as-is, not flatten to text fields
    return spark.read.parquet(path)


def parse_orc(spark: SparkSession, spec, path: str) -> DataFrame:
    return spark.read.orc(path)


def shape_typed_table(df: DataFrame, spec, table: str) -> DataFrame:
    from sqawk_spark.sources.base import with_record_numbers

    prefix = spec.prefix or table
    real = list(df.columns)
    if spec.columns:
        renames = dict(zip(real, spec.columns))
        df = df.select(
            *[
                F.col(c).alias(renames.get(c) or c)
                for c in real
            ]
        )
        real = list(df.columns)

    numbered = with_record_numbers(df)
    numbered = numbered.withColumnRenamed("anr", f"{prefix}nr")
    taken = set(real) | {f"{prefix}nr"}
    cols = [
        F.col(f"{prefix}nr"),
        F.lit(len(real)).alias(f"{prefix}nf"),
        F.lit(None).cast("string").alias(f"{prefix}0"),
    ]
    for i, c in enumerate(real, start=1):
        alias = f"{prefix}{i}"
        if alias not in taken:
            cols.append(F.col(c).alias(alias))
    cols.extend(F.col(c) for c in real)
    return numbered.select(*cols)
