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

import glob
import json
import os
import re
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

# The driver's CORRECTNESS snapshot holds only the FIRST 50 entries of
# ``queries()`` in iteration order. Rounds 3-5 curated that window by
# hand and the backlog of never-driver-checked entries regrew every
# round (VERDICT r05 "What's missing" #1) — a hand list doesn't scale
# with a 150-entry registry. The window is now SELF-CURATING: ordering
# is computed from the committed CORRECTNESS_r*.json history — entries
# that have never had a green driver row go first (registration order
# among themselves), then everything else oldest-round-first — so every
# entry is guaranteed a driver row at least once per ceil(N/50) rounds
# with zero maintenance (pinned by tests/test_registry_order.py's
# rotation simulation).
DRIVER_WINDOW = 50


def _repo_root() -> str:
    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def coverage_history(root: str | None = None) -> dict[str, int]:
    """name → latest round with a green driver row.

    Green means rows+schema+hash all matched, or — for rows-only
    entries the driver can't oracle-check — the builder executed
    (``err == 'no_oracle'`` with a row count). A row with a real
    error does NOT count: the entry stays at never-checked priority
    until a green row lands.
    """
    hist: dict[str, int] = {}
    pattern = os.path.join(root or _repo_root(), "CORRECTNESS_r*.json")
    for path in sorted(glob.glob(pattern)):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ) or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if green and rnd > hist.get(name, -1):
                hist[name] = rnd
    return hist


def rotation_order(
    names: list[str], history: dict[str, int]
) -> list[str]:
    """Never-checked first, then oldest-round-first; registration
    order breaks ties (sorted() is stable)."""
    return sorted(names, key=lambda n: history.get(n, -1))


_HISTORY_CACHE: dict[str, int] | None = None


def _ordered_specs() -> list[QuerySpec]:
    global _HISTORY_CACHE
    if _HISTORY_CACHE is None:
        _HISTORY_CACHE = coverage_history()
    order = rotation_order(list(REGISTRY), _HISTORY_CACHE)
    return [REGISTRY[n] for n in order]


def query(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Register a named query with its DuckDB oracle SQL."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def queries() -> dict[str, Builder]:
    return {spec.name: spec.builder for spec in _ordered_specs()}


def oracle_sql() -> dict[str, str]:
    return {
        spec.name: spec.oracle
        for spec in _ordered_specs()
        if spec.oracle is not None
    }
