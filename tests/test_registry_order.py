"""Pin the curated coverage-first ordering of the query registry.

The driver's CORRECTNESS snapshot records only the first 50 entries of
``queries()`` in iteration order; these tests guarantee that window
contains exactly one representative per operator class that had never
been driver-checked through round 2 (VERDICT.md r02 finding #1), and
that the curated list stays in sync with the registry.
"""

from __future__ import annotations

import sqawk_spark.operators as operators
from sqawk_spark.operators import registry

operators.load_all()

DRIVER_WINDOW = 50


def test_coverage_first_is_exactly_the_driver_window() -> None:
    assert len(registry.COVERAGE_FIRST) == DRIVER_WINDOW
    assert len(set(registry.COVERAGE_FIRST)) == DRIVER_WINDOW


def test_coverage_first_names_all_registered() -> None:
    missing = [n for n in registry.COVERAGE_FIRST if n not in registry.REGISTRY]
    assert missing == []


def test_queries_iteration_leads_with_curated_block() -> None:
    names = list(registry.queries())
    assert tuple(names[:DRIVER_WINDOW]) == registry.COVERAGE_FIRST
    # the tail still contains every other registered query exactly once
    assert sorted(names) == sorted(registry.REGISTRY)


def test_oracle_sql_subset_and_order() -> None:
    oracles = registry.oracle_sql()
    names = list(registry.queries())
    assert set(oracles) <= set(names)
    # oracle iteration order is the same curated order, filtered
    assert list(oracles) == [n for n in names if n in oracles]


def test_window_covers_previously_unchecked_classes() -> None:
    """Round-5 rotation: every never-driver-checked round-3/4 entry
    (VERDICT.md r04 "What's missing" #1) gets a row, every round-5
    addition is in-window from day one (no new backlog), and one
    representative per §2.B class / extension family stays watched."""
    window = set(registry.COVERAGE_FIRST)
    never_checked = {
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
    }
    round5 = {
        "tpch_q3_shipping_priority",
        "tpch_q6_forecast_revenue",
        "tpch_q18_large_volume_customer",
        "embedding_quantize_int8",
        "doc_chunk_overlap",
        "window_groups_exclude",
        "events_sessionize_stateful",
        "text_bpe_encode",
        "zorder_layout_orders",
        "text_perplexity_score",
        "sample_importance_weighted",
        "cdc_scd2_history",
        "events_gap_fill",
    }
    representatives = {
        "flagship_pricing_summary",
        "join_inner",
        "window_rank",
        "window_groups_exclude",  # supersedes window_groups_frame (B19)
        "events_sessionize_stateful",  # carries the gap-session oracle
        "subquery_exists_correlated",
        "cte_top_suppliers",
        "pivot_agg",
        "date_funcs",
        "dedup_embedding_lsh",
        "contamination_decontaminate",
        "pipeline_end_to_end",
    }
    assert never_checked <= window
    assert round5 <= window
    assert representatives <= window
