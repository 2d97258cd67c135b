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
# ``queries()`` in iteration order. The round-3 curation cleared the
# original backlog (all 37 pre-round-3 never-checked entries went green
# in r04), but the 19 round-3/4 additions registered BEHIND the window
# (VERDICT.md r04 "What's missing" #1). Round-5 rotation: front-load
# those 19 (they have local-parity green but no driver row), then keep
# exactly one representative per SURVEY §2.B class and extension family
# in-window so the core never goes unwatched — 50 names total. Entries
# NOT listed here keep registration order after the curated block;
# rotate again next round once the new rows are green.
COVERAGE_FIRST: tuple[str, ...] = (
    # -- round-3/4 additions, never driver-checked (VERDICT r04 list)
    "pipeline_end_to_end",
    "tpch_q5_local_supplier_volume",
    "merge_upsert_orders",
    "window_cume_dist",
    "dedup_semantic_clusters",
    "text_pii_redact",
    "text_ngram_top",
    "quality_filter_chain",
    "sample_shuffle_deterministic",
    "contamination_decontaminate",
    "events_asof_tolerance",
    "events_anomaly_zscore",
    "events_retention",
    "events_user_features",
    "data_profile_orders",
    "ann_range_search",
    "multimodal_audio_features",
    "multimodal_image_stats",
    "text_bpe_learn",
    # -- one representative per §2.B class (all green in r01/r02/r04)
    "flagship_pricing_summary",  # B9 grouped agg headline
    "join_inner",  # B6
    "join_left_outer",  # B20
    "join_semi",  # B22
    "groupby_having",  # B10
    "orderby_multi",  # B12
    "limit_offset",  # B14
    "set_union",  # B15
    "subquery_exists_correlated",  # B16
    "cte_top_suppliers",  # B17
    "case_cast",  # B18
    "date_funcs",  # B24
    "regex_funcs",  # B8
    "window_rank",  # B19
    "window_groups_frame",  # B19 GROUPS emulation
    "cube_agg",  # B23
    "pivot_agg",  # B23
    "json_extract_props",  # B25
    "count_distinct",  # B26
    "udaf_geomean",  # B29
    # -- one representative per extension family
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_lsh",
    "dedup_clusters",
    "ann_cosine_topk",
    "text_token_count",
    "sample_split",
    "pack_sequences",
    "contamination_check",
    "events_asof_join",
    "events_sessionize",
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
