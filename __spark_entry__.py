"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are backed by the operator registry in
:mod:`sqawk_spark.operators` — every operator class from SURVEY.md §2
registers a named (DataFrame builder, DuckDB oracle SQL) pair there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import sqawk_spark.operators as operators
from sqawk_spark.operators import registry

operators.load_all()  # populate the registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sqawk_spark.operators.relational import flagship_pricing_summary

    return flagship_pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return registry.oracle_sql()
