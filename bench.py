#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes end-to-end into the noop sink (all partitions
computed, nothing collected to the driver), which is how a cluster job
would consume them — collect() would bottleneck on the driver and
measure serialization, not the engine.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import sqawk_spark.operators as operators  # noqa: E402

operators.load_all()

from sqawk_spark.operators.registry import REGISTRY  # noqa: E402
from sqawk_spark.session import get_session  # noqa: E402

HEADLINE = [
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
    # extension operators (registered by the optional imports above)
    "grouping_sets_agg",
    "percentile_stats",
    "json_extract_props",
    "join_skew_salted",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "dedup_embedding_lsh",
    "sample_stratified_balanced",
    "ann_cosine_topk",
    "text_quality_score",
    "events_tumbling_window",
    "events_sessionize",
    "events_late_drop",
    "pack_sequences",
    "contamination_check",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_session(app_name="sqawk_spark_bench")

    # Warm the JVM/codegen path once so q1 isn't charged for startup.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    def run_once(spec) -> None:
        spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = REGISTRY.get(name)
        if spec is None:
            continue
        # steady-state timing: the first execution pays one-time costs
        # (codegen compilation, parquet footer reads, page-cache fill)
        # that a resident engine amortizes — warm once, then take the
        # best of two timed runs (the min rejects ambient-load spikes;
        # medians over more runs weren't worth the wall-clock).
        run_once(spec)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run_once(spec)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
