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
    """Every operator family flagged by the r02 verdict gets a row."""
    window = set(registry.COVERAGE_FIRST)
    required = {
        "window_rank",
        "window_groups_frame",
        "events_asof_join",
        "events_late_drop",
        "text_token_count",
        "ann_cosine_topk",
        "sample_split",
        "subquery_exists_correlated",
        "cte_top_suppliers",
        "cube_agg",
        "pivot_agg",
        "date_funcs",
        "regex_funcs",
    }
    assert required <= window
