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

import functools
import glob
import json
import os
import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

# r12: session-scoped PREPARED-PLAN handles — the query-level analogue
# of tables.py's _DF_CACHE (r11, "what a resident engine's catalog
# does"). Building a DataFrame plan costs one py4j round-trip per
# DataFrame-API call; the heavy builders (inlined LSH sign matrices,
# unrolled PageRank rounds, 16-term interleaves) spend 0.1-1.5 s of
# pure driver time per call re-constructing a plan that is a constant
# per (session, sf_dir). The handle stores NO rows: every action over
# it re-runs full Catalyst analysis, optimization, physical planning,
# AQE and execution from the parquet inputs, exactly as a fresh build
# would — this is the prepared-statement model every resident SQL
# engine uses.
#
# Opt-in is explicit and audited: ONLY builders that are pure plan
# constructors may be listed in PREPARED_PLAN_QUERIES. A builder that
# runs driver-side work whose VALUES land in the plan per call —
# collect()/first()/count() scalars baked into literals, per-run
# localCheckpoint materialization, driver union-find — must stay
# unprepared, because reusing its handle would freeze per-run results
# (that would be result caching, which bench.py's contract forbids).
# tests/test_extensions.py pins that prepared builders return the
# same handle and that re-executing it recomputes from parquet.
PREPARED_PLAN_QUERIES = frozenset(
    {
        # relational / TPC-H: stateless plan constructors
        "flagship_pricing_summary",
        "join_multiway",
        "join_left_outer",
        "join_semi",
        "groupby_agg",
        "count_distinct",
        "distinct_pairs",
        "window_rank",
        "window_running_agg",
        "topk_limit",
        "cte_top_suppliers",
        "set_union",
        "window_groups_exclude",
        "tpch_q5_local_supplier_volume",
        "tpch_q3_shipping_priority",
        "tpch_q6_forecast_revenue",
        "tpch_q18_large_volume_customer",
        "tpch_q10_returned_items",
        "tpch_q14_promo_effect",
        "tpch_q19_disjunctive_revenue",
        "tpch_q22_global_sales_opportunity",
        "tpch_q21_waiting_suppliers",
        "tpch_q17_small_quantity_revenue",
        "tpch_q9_product_profit",
        "merge_upsert_orders",
        "grouping_sets_agg",
        "percentile_stats",
        "json_extract_props",
        "join_skew_salted",
        "zorder_layout_orders",
        # dedup family: lazy session-cache consumers, no driver values
        "dedup_paragraph_chunks",
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_containment",
        "dedup_embedding_lsh",
        # sampling (sample_shuffle_deterministic EXCLUDED: per-call
        # collect of bucket counts)
        "sample_stratified_balanced",
        "sample_importance_weighted",
        "sample_curriculum_buckets",
        "sample_weighted_reservoir",
        # text / embeddings (ann_cosine_topk EXCLUDED: collects query
        # vectors per call)
        "text_collapse_runs",
        "embedding_quantize_int8",
        "doc_chunk_overlap",
        "text_quality_score",
        "text_bm25_topk",
        "text_perplexity_score",
        "text_perplexity_bigram",
        "text_pii_redact",
        "quality_filter_chain",
        "text_quality_lr_score",
        "text_boilerplate_strip",
        "text_ccnet_ppl_buckets",
        "text_ngram_novelty",
        "docs_cross_source_overlap",
        "ann_lsh_recall",
        # events / packing / analytics / multimodal / graph
        "events_user_features",
        "events_tumbling_window",
        "events_sessionize",
        "events_late_drop",
        "events_markov_transitions",
        "events_rfm_scores",
        "pack_sequences",
        "contamination_check",
        "market_basket_pairs",
        "multimodal_audio_features",
        "graph_triangle_count",
        "graph_pagerank_dupgraph",
    }
)

_PREPARED: dict[tuple[int, str, str, str], DataFrame] = {}


def _session_key(spark: SparkSession) -> tuple[int, str]:
    """(id, applicationId): id() alone can be reused by a new session
    after GC (ADVICE r11 #3); the applicationId makes a stale hit
    impossible."""
    try:
        app = spark.sparkContext.applicationId
    except Exception:  # stopped context — never cache against it
        app = "<stopped>"
    return (id(spark), app)


def clear_prepared(spark: SparkSession | None = None) -> None:
    """Drop prepared-plan handles (all sessions, or one)."""
    for key in [
        k for k in _PREPARED if spark is None or k[0] == id(spark)
    ]:
        _PREPARED.pop(key, None)


def _prepare(name: str, fn: Builder) -> Builder:
    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf_dir: str, *args, **kwargs):
        if args or kwargs:
            # parameterized call (non-default threshold/limit): the
            # plan is no longer the per-(session, sf_dir) constant
            return fn(spark, sf_dir, *args, **kwargs)
        sid, app = _session_key(spark)
        key = (sid, app, sf_dir, name)
        df = _PREPARED.get(key)
        if df is None:
            df = fn(spark, sf_dir)
            _PREPARED[key] = df
        return df

    return wrapper


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
        builder = _prepare(name, fn) if name in PREPARED_PLAN_QUERIES else fn
        REGISTRY[name] = QuerySpec(
            name, builder, oracle, (fn.__doc__ or "").strip()
        )
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
