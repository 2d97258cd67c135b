"""Pin the SELF-CURATING rotation of the query registry.

The driver's CORRECTNESS snapshot records only the first 50 entries of
``queries()`` in iteration order. Rounds 3-5 curated that window by
hand and a backlog of never-driver-checked entries regrew every round
(VERDICT.md r05 "What's missing" #1); the order is now computed from
the committed CORRECTNESS_r*.json history — never-checked entries
first, then oldest-round-first. These tests pin that contract,
including a rotation simulation proving every entry reaches the window
within ceil(N/50) rounds from ANY starting history.
"""

from __future__ import annotations

import math

import sqawk_spark.operators as operators
from sqawk_spark.operators import registry

operators.load_all()

DRIVER_WINDOW = registry.DRIVER_WINDOW


def test_queries_contains_every_registered_entry_once() -> None:
    names = list(registry.queries())
    assert sorted(names) == sorted(registry.REGISTRY)


def test_never_checked_entries_lead_the_window() -> None:
    """Every entry without a green driver row in the committed history
    must precede every entry that has one (up to the window size, the
    guarantee that kills the backlog)."""
    hist = registry.coverage_history()
    names = list(registry.queries())
    never = [n for n in names if n not in hist]
    # all never-checked entries fit in the window → all must be there
    if len(never) <= DRIVER_WINDOW:
        assert set(never) <= set(names[:DRIVER_WINDOW])
    else:
        assert set(names[:DRIVER_WINDOW]) <= set(never)


def test_checked_entries_ordered_oldest_round_first() -> None:
    hist = registry.coverage_history()
    names = list(registry.queries())
    rounds = [hist.get(n, -1) for n in names]
    assert rounds == sorted(rounds)


def _history_as_of(max_round: int) -> dict[str, int]:
    """Committed coverage history restricted to rounds ≤ max_round —
    frozen, so assertions about a PAST round's window stay true no
    matter what CORRECTNESS_r*.json files the driver writes later.
    (The r06 version of the backlog pin recomputed the window from
    CURRENT history, so the driver marking the backlog green — the
    rotation working as designed — broke the test; VERDICT r06
    What's-wrong #2.)"""
    hist = registry.coverage_history()
    return {n: r for n, r in hist.items() if r <= max_round}


def test_r05_backlog_was_in_the_r06_window() -> None:
    """The 27 entries VERDICT r05 flagged as never-driver-checked must
    all sit in the window AS COMPUTED FROM r01-r05 HISTORY (they had no
    green row then; CORRECTNESS_r06 subsequently marked all 27 green,
    which must NOT break this pin)."""
    backlog = {
        "tpch_q2_min_cost_supplier",
        "tpch_q4_order_priority",
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_product_profit",
        "tpch_q11_important_stock",
        "tpch_q13_customer_distribution",
        "tpch_q15_top_supplier",
        "tpch_q16_supplier_part_count",
        "tpch_q17_small_quantity_revenue",
        "tpch_q20_potential_promotion",
        "tpch_q21_waiting_suppliers",
        "tpch_q10_returned_items",
        "tpch_q12_priority_shipping",
        "tpch_q14_promo_effect",
        "tpch_q19_disjunctive_revenue",
        "tpch_q22_global_sales_opportunity",
        "dedup_paragraph_chunks",
        "dedup_exact_stream",
        "embedding_centroid_by_label",
        "events_stream_stream_join",
        "events_stream_static_enrich",
        "multimodal_jpeg_decode",
        "sample_lang_temperature",
        "source_level_filter",
        "text_zipf_fit",
        "ann_pq_topk",
    }
    unknown = backlog - set(registry.REGISTRY)
    assert not unknown, sorted(unknown)
    hist5 = _history_as_of(5)
    # the registry AS OF r05: entries registered later (r06/r07
    # additions, never-checked under r01-r05 history) must not flood
    # the reconstruction — membership then = checked by r05 ∪ the
    # pinned backlog itself (VERDICT r05's census of never-checked)
    names_r05 = [
        n for n in registry.REGISTRY if n in hist5 or n in backlog
    ]
    order = registry.rotation_order(names_r05, hist5)
    window = set(order[:DRIVER_WINDOW])
    assert backlog <= window, sorted(backlog - window)


def test_r07_window_leads_with_pca_then_oldest_checked() -> None:
    """Frozen at r06 history: ``embedding_pca_project`` is the sole
    entry without a green row after r06 (its r06 row was RED — the
    array-column canonicalizer crash), so the r07 window must be PCA +
    the 49 oldest-checked entries (VERDICT r06 next-round #5)."""
    hist = _history_as_of(6)
    # registry AS OF r06: everything checked by r06 plus PCA (the one
    # entry that existed then without a green row — its r06 row was
    # red); round-7 additions are excluded from the reconstruction
    names = [
        n
        for n in registry.REGISTRY
        if n in hist or n == "embedding_pca_project"
    ]
    never = [n for n in names if n not in hist]
    assert never == ["embedding_pca_project"], never
    window = registry.rotation_order(names, hist)[:DRIVER_WINDOW]
    assert window[0] == "embedding_pca_project"
    # stable sort on registration order, same as rotation_order
    checked_sorted = sorted(
        (n for n in names if n in hist), key=lambda n: hist[n]
    )
    assert window[1:] == checked_sorted[: DRIVER_WINDOW - 1]


def test_rotation_covers_everything_within_ceil_n_over_50_rounds() -> None:
    """Simulate the driver loop: each round the first 50 entries get a
    green row; the order recomputes from the updated history. Every
    registry entry must be windowed within ceil(N/50) rounds — the
    self-curating property the hand-curated list never had."""
    names = list(registry.REGISTRY)
    hist = dict(registry.coverage_history())
    bound = math.ceil(len(names) / DRIVER_WINDOW)
    seen: set[str] = set()
    rnd = max(hist.values(), default=0)
    for _ in range(bound):
        rnd += 1
        window = registry.rotation_order(names, hist)[:DRIVER_WINDOW]
        seen.update(window)
        for n in window:
            hist[n] = rnd
    assert seen == set(names)


def test_oracle_sql_subset_and_order() -> None:
    oracles = registry.oracle_sql()
    names = list(registry.queries())
    assert set(oracles) <= set(names)
    # oracle iteration order is the same rotation order, filtered
    assert list(oracles) == [n for n in names if n in oracles]
