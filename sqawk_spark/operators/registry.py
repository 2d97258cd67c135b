"""Query registry: named (Spark builder, DuckDB oracle) pairs.

Every operator the engine claims to support registers here; the driver
harness (``__spark_entry__.py``) exposes the registry via ``queries()``
and ``oracle_sql()``. Builders take ``(spark, sf_dir)`` and return a
DataFrame; oracles are ANSI SQL strings DuckDB runs over the same
parquet tables. Column names are aliased identically on both sides —
the driver sorts columns by name before hashing values.

Oracle-parity rules used throughout (to keep value hashes stable):

- double aggregates are ``round(..., 2)`` on BOTH sides (partial
  aggregation order differs between engines; raw per-row arithmetic is
  IEEE-deterministic and needs no rounding);
- DuckDB integer ``sum`` returns HUGEINT → oracle casts to BIGINT to
  match Spark's LongType;
- DuckDB ``year()`` et al. return BIGINT → cast to INTEGER to match
  Spark;
- timestamps are rendered to strings with matching format patterns;
- every LIMIT / row_number is backed by a total order with a unique
  tie-break so results are deterministic in both engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # None → driver records weaker rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Register a named query with its DuckDB oracle SQL."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
