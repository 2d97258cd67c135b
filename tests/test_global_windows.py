"""Whitelist of UNPARTITIONED (global) window sites — VERDICT r06 #8.

A Window with no PARTITION BY executes in a single task ("No Partition
Defined for Window operation" in the Spark logs / BENCH tails). That is
a scale bug when the frame is corpus-sized and provably benign when the
frame is bounded by a constant or a value domain. This module makes the
distinction auditable:

1. an AST scan over every sqawk_spark source finds each
   ``W.orderBy(...)`` / ``Window.orderBy(...)`` call whose receiver is
   the Window CLASS (i.e. no ``partitionBy`` upstream) and asserts the
   set of enclosing functions equals the whitelist — a new global
   window anywhere in the package fails this test until it is either
   partitioned or whitelisted with a bound;
2. for each whitelisted site, a runtime check at the test SF proves the
   documented bound on the frame that actually enters the window.

The two dialect-parity entries (window_ntile / window_range_frame) are
whitelisted by CONTRACT, not size: SQLite's ``ntile(4) OVER (ORDER BY
...)`` over a table IS a global ordered window — partitioning would
change the result. Their inputs are dimension tables (customer / part);
a fact-table ntile would pre-bucket exactly like
sample_curriculum_buckets does.
"""

from __future__ import annotations

import ast
import glob
import os

import pytest
from pyspark.sql import functions as F

import sqawk_spark.operators as operators
from sqawk_spark.operators.tables import load_tables

operators.load_all()

PKG = os.path.join(os.path.dirname(os.path.dirname(__file__)), "sqawk_spark")

# function name -> why its global window cannot become a scale
# bottleneck (the runtime checks below prove the size claims)
WHITELIST = {
    # frame = one row per DISTINCT n_chars (value histogram), not the
    # corpus — bounded by the length domain, not the document count
    "sample_curriculum_buckets": "value histogram of n_chars",
    # frame = per-salt top-K candidates: <= _WOR_SALT_BUCKETS * _WOR_K
    # rows by construction (the salted first phase prunes)
    "sample_weighted_reservoir": "salted top-k candidates, <= 1600 rows",
    # frame = the vocabulary (distinct words), which plateaus far below
    # corpus size (Heaps' law); the corpus contributes only a
    # map-combinable word-count aggregate
    "text_zipf_fit": "vocabulary, not corpus",
    # frame = one row per hash bucket: <= _PACK_BUCKETS (32)
    "pack_sequences": "bucket bases, <= 32 rows",
    "pipeline_end_to_end": "bucket bases, <= 32 rows",
    # frame = one row per arrival micro-batch (~10, a test-harness
    # constant, never data-sized) — the batch twin
    # of the streaming watermark, documented in streaming/windows.py
    "events_late_drop": "per-batch maxima, one row per arrival batch",
    # dialect-parity entries: a global ordered window IS the SQLite
    # semantics being pinned; inputs are dimension tables
    "window_ntile": "B19 parity; dimension-table input (customer)",
    "window_range_frame": "B19 parity; dimension-table input (part)",
    # events_rfm_scores quantile helper: frame = one row per DISTINCT
    # quantized metric value (recency in whole days, whole-unit
    # monetary, integer frequency) — domain-sized histograms
    "below_table": "value histograms of quantized RFM metrics",
    # frame = one row per DAY (the time-domain histogram): cumulative
    # distinct users via prefix sum over first-seen counts
    "events_user_growth": "per-day histogram, time-domain-sized",
}


def _global_window_sites() -> dict[str, set[str]]:
    """function name -> files, for every Window-class .orderBy call."""
    sites: dict[str, set[str]] = {}
    for path in glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True):
        tree = ast.parse(open(path).read())
        # map every node to its enclosing function
        def walk_shallow(n):
            """Children of n, not descending into nested functions —
            each site attributes to its INNERMOST enclosing def."""
            for child in ast.iter_child_nodes(n):
                if isinstance(
                    child, (ast.FunctionDef, ast.AsyncFunctionDef)
                ):
                    continue
                yield child
                yield from walk_shallow(child)

        for fn in [
            n
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]:
            for node in walk_shallow(fn):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "orderBy"
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id in ("W", "Window")
                ):
                    sites.setdefault(fn.name, set()).add(
                        os.path.basename(path)
                    )
    return sites


def test_global_window_sites_are_whitelisted():
    sites = _global_window_sites()
    unexplained = set(sites) - set(WHITELIST)
    assert not unexplained, (
        f"unpartitioned window in {unexplained} "
        f"({ {k: sites[k] for k in unexplained} }): partition it or "
        "whitelist it here WITH a proven size bound"
    )
    stale = set(WHITELIST) - set(sites)
    assert not stale, f"whitelist entries without a site: {stale}"


def test_curriculum_histogram_is_value_bounded(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    n_docs = docs.count()
    n_hist = docs.select("n_chars").distinct().count()
    assert n_hist <= n_docs
    # the length domain, not the corpus: adding documents reuses values
    assert n_hist <= 20_000, "n_chars histogram should stay domain-sized"


def test_weighted_reservoir_candidates_bounded(spark, sf_dir):
    from sqawk_spark.operators.sampling import _WOR_K, _WOR_SALT_BUCKETS

    assert _WOR_SALT_BUCKETS * _WOR_K <= 1600


def test_zipf_vocab_smaller_than_token_stream(spark, sf_dir):
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("w")
    ).filter(F.length("w") > 0)
    n_tokens = toks.count()
    n_vocab = toks.distinct().count()
    assert n_vocab < n_tokens
    assert n_vocab <= 200_000


def test_pack_bucket_bases_bounded():
    from sqawk_spark.operators.packing import _PACK_BUCKETS

    assert _PACK_BUCKETS <= 64


def test_watermark_batches_bounded(spark, sf_dir):
    from sqawk_spark.streaming.windows import _arrival

    n = _arrival(spark, sf_dir).select("arrival").distinct().count()
    assert n <= 16


def test_parity_windows_read_dimension_tables():
    """window_ntile / window_range_frame scan customer / part — the
    TPC-H dimension side (SF-scaling but orders below lineitem); the
    docstrings own the single-partition caveat explicitly."""
    import inspect

    from sqawk_spark.operators import relational

    src_n = inspect.getsource(relational.window_ntile)
    src_r = inspect.getsource(relational.window_range_frame)
    assert '("customer",)' in src_n
    assert '("part",)' in src_r
    assert "single-partition" in src_n
    for doc in (
        relational.window_ntile.__doc__,
        relational.window_range_frame.__doc__,
    ):
        assert doc is not None


def test_rfm_histograms_are_domain_bounded(spark, sf_dir):
    """The three RFM quantile histograms must stay far below user
    cardinality — that's the whole point of quantizing the metrics
    before ranking."""
    from sqawk_spark.operators.temporal import events_rfm_scores

    df = events_rfm_scores(spark, sf_dir)
    rows = df.count()
    for col in ("recency_days", "frequency", "monetary_usd"):
        dom = df.select(col).distinct().count()
        assert dom <= max(64, rows // 2), (col, dom, rows)


def test_user_growth_window_is_day_domain_sized(spark, sf_dir):
    from sqawk_spark.operators.temporal import events_user_growth

    df = events_user_growth(spark, sf_dir)
    days = df.count()
    assert days <= 4000, "window frame must be days, not events"
