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
# ``queries()`` in iteration order. Round-5 curation: the 19 round-3/4
# additions that registered behind the window (VERDICT.md r04 "What's
# missing" #1) stay front-loaded for their first driver rows, the 7
# round-5 additions go in-window immediately (so no new backlog forms),
# and the remaining 24 slots keep one representative per SURVEY §2.B
# class / extension family — displaced representatives are exclusively
# entries that were green in r04's driver file AND whose class is still
# watched by an in-window round-5 entry (e.g. window_groups_exclude
# supersedes window_groups_frame as the B19-GROUPS sentinel). Entries
# NOT listed here keep registration order after the curated block.
# Entries added AFTER the window filled (dedup_exact_stream,
# embedding_centroid_by_label, tpch_q10/q12/q14/q19/q22) are the r06
# rotation front-runners — all judge-sweep green locally, none with a
# driver row yet.
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
    # -- round-5 additions (in-window from day one)
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q18_large_volume_customer",
    "embedding_quantize_int8",
    "doc_chunk_overlap",
    "window_groups_exclude",  # B19 GROUPS+EXCLUDE sentinel
    "events_sessionize_stateful",  # B28 custom stateful streaming
    "text_bpe_encode",  # BPE apply — same oracle chain as learn
    "zorder_layout_orders",  # data-skipping layout key
    "text_perplexity_score",  # unigram-LM quality signal
    "sample_importance_weighted",  # weighted corpus sampling
    "cdc_scd2_history",  # SCD2 validity intervals
    "events_gap_fill",  # time-series densification
    # -- one representative per §2.B class
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
    "date_funcs",  # B24
    "window_rank",  # B19
    "pivot_agg",  # B23
    "json_extract_props",  # B25
    "count_distinct",  # B26
    "udaf_geomean",  # B29
    # -- one representative per extension family
    "dedup_embedding_lsh",
    "dedup_clusters",
    # (displaced, all r04-green with their family still in-window:
    # sample_split → sample_shuffle_deterministic; pack_sequences /
    # contamination_check → doc_chunk_overlap, pipeline_end_to_end,
    # contamination_decontaminate; batch events_sessionize → its
    # gap-session oracle runs verbatim in events_sessionize_stateful)
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
