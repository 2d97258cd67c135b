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

# The driver's CORRECTNESS snapshot holds only the FIRST 50 entries of
# ``queries()`` in iteration order. Left to raw registration (module
# import) order, 37 of 91 registered queries never earned a driver row
# in rounds 1-2 (VERDICT.md r02 "What's wrong" #1). This curated list
# front-loads exactly one representative per previously-unchecked
# operator class — all 37 never-checked entries, the 4 entries only
# checked in round 1 (rotated out of round 2's window), and the 9
# headline queries — 50 names total, so the round-3 window covers every
# SURVEY §2.B class and extension family. Entries NOT listed here keep
# registration order after the curated block; rotate this list next
# round once the new rows are green.
COVERAGE_FIRST: tuple[str, ...] = (
    # -- SQLite-dialect scalar/expression families (never driver-checked)
    "case_cast",
    "glob_like",
    "string_funcs",
    "math_funcs",
    "date_funcs",
    "regex_funcs",
    "coalesce_nullif",
    # -- window classes (only window_first_last had a row)
    "window_rank",
    "window_running_agg",
    "window_lead_lag",
    "window_ntile",
    "window_range_frame",
    "window_groups_frame",
    # -- multi-dim aggregation
    "rollup_agg",
    "cube_agg",
    "pivot_agg",
    # -- subqueries / CTE (green in r01, rotated out of r02)
    "subquery_scalar",
    "subquery_in",
    "subquery_exists_correlated",
    "cte_top_suppliers",
    # -- temporal event operators
    "events_asof_join",
    "events_range_join",
    "events_multires_rollup",
    "events_rolling_stats",
    "events_funnel",
    # -- streaming-window batch twins
    "events_tumbling_window",
    "events_sliding_window",
    "events_sessionize",
    "events_hourly_by_type",
    "events_late_drop",
    # -- text analysis
    "text_token_count",
    "text_quality_score",
    "text_langid",
    "text_fingerprint",
    "text_tfidf_top_terms",
    "text_repetition_stats",
    # -- sampling
    "sample_split",
    "sample_stratified_balanced",
    # -- similarity search (lsh/ivf are rows-only by design)
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    # -- headliners (keep a hard row every round)
    "flagship_pricing_summary",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "dedup_clusters",
    "dedup_incremental",
    "pack_sequences",
    "contamination_check",
)


def _ordered_specs() -> list[QuerySpec]:
    """Registry specs with the curated coverage block first.

    Unknown names in ``COVERAGE_FIRST`` raise — a renamed or removed
    query must be removed from the curated list, not silently skipped
    (a silent skip would shift the driver's 50-row window).
    """
    missing = [n for n in COVERAGE_FIRST if n not in REGISTRY]
    if missing:
        raise KeyError(f"COVERAGE_FIRST names not in registry: {missing}")
    first = set(COVERAGE_FIRST)
    ordered = [REGISTRY[n] for n in COVERAGE_FIRST]
    ordered.extend(s for n, s in REGISTRY.items() if n not in first)
    return ordered


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
